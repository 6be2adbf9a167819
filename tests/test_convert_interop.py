"""Converter interop with the reference's own converters:

* our ``jsonschema_to_sjot`` must understand the JSON Schema the reference
  SJOT2JS emits — verdicts preserved end to end;
* the reference JS2SJOT must understand the JSON Schema our
  ``sjot_to_jsonschema`` emits — verdicts preserved when validated by the
  reference engine.
"""

from __future__ import annotations

import copy
import json
import subprocess

import pytest

from sjot_ray.core import valid
from sjot_ray.core.convert import jsonschema_to_sjot, sjot_to_jsonschema

_REF_SJOT2JS = r"""
const fs = require("fs");
eval(fs.readFileSync("/root/reference/dev/sjot2js.js", "utf8")
     + ";globalThis.S2J = SJOT2JS;");
const cases = JSON.parse(fs.readFileSync(0, "utf8"));
process.stdout.write(JSON.stringify(
  cases.map(s => S2J.toJSONSchema(s, 4))));
"""

_REF_JS2SJOT_VALIDATE = r"""
const fs = require("fs");
const SJOT = require("/root/reference/index.js");
eval(fs.readFileSync("/root/reference/dev/js2sjot.js", "utf8")
     + ";globalThis.J2S = JS2SJOT;");
const cases = JSON.parse(fs.readFileSync(0, "utf8"));
const out = cases.map(c => {
  try {
    const sjot = J2S.toSJOT(c.jsonschema, 4);
    try { SJOT.validate(c.doc, null, sjot); return true; }
    catch (e) { return false; }
  } catch (e) { return "convert-error: " + e; }
});
process.stdout.write(JSON.stringify(out));
"""

SCHEMAS = [
    {"@root": {"a": "int", "b?": "string"}},
    {"@root": {"n": "1..10", "s": "(x+|y)"}},
    {"@root": {"v": "byte", "f": "number"}},
    {"@root": {"xs": "string[1,3]"}},
    {"@root": {"d": "hex", "u": "uuid"}},
]

DOCS = [
    ({"a": 1}, 0, True), ({"a": "s"}, 0, False),
    ({"n": 5, "s": "xx"}, 1, True), ({"n": 11, "s": "xx"}, 1, False),
    ({"n": 5, "s": "z"}, 1, False),
    ({"v": 12, "f": 1.5}, 2, True), ({"v": 1000, "f": 1.5}, 2, False),
    ({"xs": ["a"]}, 3, True), ({"xs": []}, 3, False), ({"xs": [1]}, 3, False),
    ({"d": "deadbeef", "u": "123e4567-e89b-12d3-a456-426655440000"}, 4, True),
    ({"d": "xyz", "u": "123e4567-e89b-12d3-a456-426655440000"}, 4, False),
]


@pytest.fixture(scope="module")
def reference_jsonschemas():
    out = subprocess.run(["node", "-e", _REF_SJOT2JS],
                         input=json.dumps(SCHEMAS), capture_output=True,
                         text=True, check=True).stdout
    return json.loads(out)


@pytest.mark.parametrize("doc,si,expected", DOCS)
def test_ours_reads_reference_jsonschema(doc, si, expected,
                                         reference_jsonschemas):
    """reference SJOT2JS output → our js2sjot → our validator."""
    back = jsonschema_to_sjot(copy.deepcopy(reference_jsonschemas[si]))
    assert valid(copy.deepcopy(doc), None, back) == expected, (
        doc, reference_jsonschemas[si], back)


def test_reference_reads_our_jsonschema():
    """our sjot_to_jsonschema output → reference JS2SJOT → reference
    validator; verdicts must match our native verdicts."""
    cases = []
    expected = []
    for doc, si, exp in DOCS:
        js = sjot_to_jsonschema(copy.deepcopy(SCHEMAS[si]))
        cases.append({"jsonschema": js, "doc": doc})
        expected.append(exp)
    out = subprocess.run(["node", "-e", _REF_JS2SJOT_VALIDATE],
                         input=json.dumps(cases), capture_output=True,
                         text=True, check=True).stdout
    results = json.loads(out)
    for (doc, si, exp), got in zip(DOCS, results):
        assert got == exp, (doc, SCHEMAS[si], got, exp)


_REF_JS2SJOT_VALIDATE_V = r"""
const fs = require("fs");
const SJOT = require("/root/reference/index.js");
eval(fs.readFileSync("/root/reference/dev/js2sjot.js", "utf8")
     + ";globalThis.J2S = JS2SJOT;");
const cases = JSON.parse(fs.readFileSync(0, "utf8"));
const out = cases.map(c => {
  try {
    const sjot = J2S.toSJOT(c.jsonschema, c.version);
    try { SJOT.validate(c.doc, null, sjot); return true; }
    catch (e) { return false; }
  } catch (e) { return "convert-error: " + e; }
});
process.stdout.write(JSON.stringify(out));
"""


@pytest.mark.parametrize("version", [1, 3])
def test_reference_reads_our_draft_1_and_3(version):
    """our sjot_to_jsonschema(version=1|3) → reference JS2SJOT at the same
    draft → reference validator; verdicts preserved (sjot2js.js:160-171
    version parameter parity)."""
    cases, exp_list = [], []
    for doc, si, exp in DOCS:
        js = sjot_to_jsonschema(copy.deepcopy(SCHEMAS[si]), version=version)
        cases.append({"jsonschema": js, "doc": doc, "version": version})
        exp_list.append(exp)
    out = subprocess.run(["node", "-e", _REF_JS2SJOT_VALIDATE_V],
                         input=json.dumps(cases), capture_output=True,
                         text=True, check=True).stdout
    for (doc, si, exp), got in zip(DOCS, json.loads(out)):
        assert got == exp, (version, doc, SCHEMAS[si], got, exp)


def test_draft_version_markers():
    s = {"@root": {"a": "int", "u?": [["string", "int"]]}}
    js1 = sjot_to_jsonschema(copy.deepcopy(s), version=1)
    js3 = sjot_to_jsonschema(copy.deepcopy(s), version=3)
    js4 = sjot_to_jsonschema(copy.deepcopy(s), version=4)
    assert js1["$schema"] == "http://json-schema.org/schema#"
    assert js3["$schema"] == "http://json-schema.org/draft-03/schema#"
    assert js4["$schema"] == "http://json-schema.org/draft-04/schema#"
    # draft-3: per-prop required + bare union arrays; draft-4: required
    # list + anyOf
    assert js3["properties"]["a"].get("required") is True
    assert isinstance(js3["properties"]["u"], list)
    assert js4["required"] == ["a"]
    assert "anyOf" in js4["properties"]["u"]


# -- third-party differential: the jsonschema package ------------------------

def _js_validator(schema):
    import copy

    import jsonschema

    from sjot_ray.core.convert import sjot_to_jsonschema

    return jsonschema.Draft4Validator(
        sjot_to_jsonschema(copy.deepcopy(schema)))


def test_jsonschema_pkg_differential_directed():
    """Converted schemas validated by the independent `jsonschema`
    package (Draft4) agree with OUR validator's verdicts on the
    structural surface (no format types — JSON Schema formats are
    non-asserting). This differential caught the char[n,m]
    array-vs-string conversion bug."""
    import copy

    cases = [
        ({"@root": {"a": "1..9", "b?": "(x|y)", "t?": ["string", "0..9"],
                    "s?": "int{1,3}", "n?": {"q": "0..5"}}},
         [{"a": 5}, {"a": 0}, {"a": 5, "b": "x"}, {"a": 5, "b": "z"},
          {"a": 5, "t": ["q", 3]}, {"a": 5, "t": ["q", 30]},
          {"a": 5, "s": [1, 2]}, {"a": 5, "s": [1, 1]}, {"a": 5, "s": []},
          {"a": 5, "n": {"q": 2}}, {"a": 5, "n": {"q": 9}}, {}]),
        ({"@root": {"v?": "char[2,4]"}},
         [{"v": "ab"}, {"v": "a"}, {"v": "abcde"}, {}]),
        ({"@root": {"v?": "char[2,4][]"}},
         [{"v": ["ab"]}, {"v": ["a"]}, {"v": []}, {}]),
        ({"@root": "#T", "T": {"@final": True, "k": "int"}},
         [{"k": 1}, {"k": 1, "zz": 2}, {}]),
        ({"@root": {"v?": "-2..2[1,2]"}},
         [{"v": [0]}, {"v": [5]}, {"v": []}, {"v": [0, 1, 2]}]),
    ]
    for schema, docs in cases:
        validator = _js_validator(schema)
        for d in docs:
            ours = valid(copy.deepcopy(d), None, copy.deepcopy(schema))
            theirs = validator.is_valid(copy.deepcopy(d))
            assert ours == theirs, (schema, d, ours, theirs)


@pytest.mark.parametrize("seed", range(40))
def test_jsonschema_pkg_differential_fuzz(seed):
    """Randomized structural schemas (ranges, enums, char-lengths,
    containers, sets, tuples, nested objects, @final) × random docs:
    our verdict == the jsonschema package's on the converted schema."""
    import copy

    import numpy as np

    rng = np.random.default_rng(47000 + seed)

    def prop(r):
        k = r.choice(["range", "enum", "charlen", "cont", "set",
                      "tuple", "nested"])
        if k == "range":
            lo = int(r.integers(-5, 3)); hi = lo + int(r.integers(1, 9))
            dotted = r.random() < 0.4
            t = f"{lo}.0..{hi}.0" if dotted else f"{lo}..{hi}"
            sam = lambda rr: (float(rr.uniform(lo - 2, hi + 2))
                              if rr.random() < 0.5
                              else int(rr.integers(lo - 3, hi + 4)))
        elif k == "enum":
            t = "(aa|bb)"
            sam = lambda rr: str(rr.choice(["aa", "bb", "zz"]))
        elif k == "charlen":
            t = "char[2,4]"
            sam = lambda rr: "x" * int(rr.integers(0, 6))
        elif k == "cont":
            t = "0..9[1,2]"
            sam = lambda rr: [int(rr.integers(-2, 12))
                              for _ in range(int(rr.integers(0, 4)))]
        elif k == "set":
            t = "0..9{1,3}"
            sam = lambda rr: [int(x) for x in rr.integers(
                0, 12, size=int(rr.integers(0, 4)))]
        elif k == "tuple":
            t = ["0..9", "(aa|bb)"]
            sam = lambda rr: ([int(rr.integers(0, 12)),
                               str(rr.choice(["aa", "zz"]))]
                              [:int(rr.integers(1, 3))])
        else:
            t = {"q": "0..5"}
            sam = lambda rr: {"q": int(rr.integers(-2, 8))} \
                if rr.random() < 0.8 else {}
        return t, sam

    props, samplers = {}, {}
    for i in range(int(rng.integers(1, 4))):
        t, sam = prop(rng)
        key = f"p{i}" + ("?" if rng.random() < 0.5 else "")
        props[key] = t
        samplers[f"p{i}"] = sam
    if rng.random() < 0.3:
        props["@final"] = True
    schema = {"@root": props}
    validator = _js_validator(schema)

    for _ in range(40):
        doc = {}
        for name, sam in samplers.items():
            if rng.random() < 0.75:
                doc[name] = sam(rng)
        if rng.random() < 0.15:
            doc["extra"] = 1
        ours = valid(copy.deepcopy(doc), None, copy.deepcopy(schema))
        theirs = validator.is_valid(copy.deepcopy(doc))
        assert ours == theirs, (schema, doc, ours, theirs)


def test_jsonschema_pkg_reverse_differential():
    """E2 direction: a Draft4 schema validated by the jsonschema
    package must agree with OUR validator on the jsonschema_to_sjot
    conversion (structural surface)."""
    import copy

    import jsonschema

    from sjot_ray.core.convert import jsonschema_to_sjot

    cases = [
        ({"type": "object",
          "properties": {"a": {"type": "integer", "minimum": 1,
                               "maximum": 9}},
          "required": ["a"]},
         [{"a": 5}, {"a": 0}, {}]),
        ({"type": "object",
          "properties": {"v": {"type": "string", "minLength": 2,
                               "maxLength": 4}}},
         [{"v": "ab"}, {"v": "a"}, {}]),
        ({"type": "object",
          "properties": {"v": {"type": "array",
                               "items": {"type": "integer",
                                         "minimum": 0, "maximum": 9},
                               "minItems": 1, "uniqueItems": True}}},
         [{"v": [1, 2]}, {"v": [1, 1]}, {"v": []}, {"v": [50]}]),
        ({"type": "object", "properties": {"v": {"enum": ["x", "y"]}}},
         [{"v": "x"}, {"v": "z"}]),
        ({"type": "object",
          "properties": {"n": {"type": "object",
                               "properties": {"q": {"type": "number",
                                                    "minimum": 0,
                                                    "maximum": 5}},
                               "required": ["q"]}}},
         [{"n": {"q": 1}}, {"n": {"q": 9}}, {"n": {}}, {}]),
        ({"type": "object", "properties": {"a": {"type": "integer"}},
          "additionalProperties": False},
         [{"a": 1}, {"a": 1, "b": 2}]),
    ]
    for js, docs in cases:
        s = jsonschema_to_sjot(copy.deepcopy(js))
        v = jsonschema.Draft4Validator(js)
        for d in docs:
            theirs = v.is_valid(copy.deepcopy(d))
            ours = valid(copy.deepcopy(d), None, copy.deepcopy(s))
            assert ours == theirs, (js, d, s, ours, theirs)


@pytest.mark.parametrize("seed", range(30))
def test_jsonschema_pkg_roundtrip_fuzz(seed):
    """SJOT → JSON Schema → SJOT round trip preserves verdicts on the
    randomized structural space (the converters are inverse up to
    verdict equivalence)."""
    import copy

    import numpy as np

    from sjot_ray.core.convert import (jsonschema_to_sjot,
                                       sjot_to_jsonschema)

    rng = np.random.default_rng(53000 + seed)

    def prop(r):
        k = r.choice(["range", "enum", "charlen", "cont", "nested"])
        if k == "range":
            lo = int(r.integers(-5, 3)); hi = lo + int(r.integers(1, 9))
            return f"{lo}..{hi}", \
                lambda rr: int(rr.integers(lo - 3, hi + 4))
        if k == "enum":
            return "(aa|bb)", \
                lambda rr: str(rr.choice(["aa", "bb", "zz"]))
        if k == "charlen":
            return "char[2,4]", \
                lambda rr: "x" * int(rr.integers(0, 6))
        if k == "cont":
            return "0..9[1,2]", \
                lambda rr: [int(rr.integers(-2, 12))
                            for _ in range(int(rr.integers(0, 4)))]
        return {"q": "0..5"}, \
            lambda rr: {"q": int(rr.integers(-2, 8))} \
            if rr.random() < 0.8 else {}

    props, samplers = {}, {}
    for i in range(int(rng.integers(1, 4))):
        t, sam = prop(rng)
        key = f"p{i}" + ("?" if rng.random() < 0.5 else "")
        props[key] = t
        samplers[f"p{i}"] = sam
    schema = {"@root": props}
    back = jsonschema_to_sjot(sjot_to_jsonschema(copy.deepcopy(schema)))
    for _ in range(30):
        doc = {}
        for name, sam in samplers.items():
            if rng.random() < 0.75:
                doc[name] = sam(rng)
        v1 = valid(copy.deepcopy(doc), None, copy.deepcopy(schema))
        v2 = valid(copy.deepcopy(doc), None, copy.deepcopy(back))
        assert v1 == v2, (schema, back, doc, v1, v2)


def test_range_fractional_semantics_in_jsonschema():
    """Integral-only range alternatives convert with multipleOf: 1 —
    draft4 "integer" wrongly rejects integral floats (5.0), which SJOT
    accepts (JS has no int/float split); and a float-friendly
    alternative AFTER an integral one is unreachable for fractional
    data (the validator's break-scan), so it is integral-constrained
    too. Exhaustive verdict agreement with the jsonschema package."""
    import copy

    import jsonschema

    from sjot_ray.core.convert import sjot_to_jsonschema

    types = ["1..9", "1.0..9.0", "1..9.5", "1.5..9", "<1..9>", "1..",
             "..9", "1.0..", "5", "5.0", "1..2,5..6", "1,3,5",
             "1..2,5.0..6.0", "5,1.5..9.5", "1.5..9.5,20..30"]
    data = [5, 5.0, 5.5, 1, 1.5, 2.5, 0.5, 9, 9.5, 20, 25.5, -3, 3]
    for t in types:
        s = {"@root": {"v?": t}}
        v = jsonschema.Draft4Validator(
            sjot_to_jsonschema(copy.deepcopy(s)))
        for d in data:
            ours = valid({"v": d}, None, copy.deepcopy(s))
            theirs = v.is_valid({"v": d})
            assert ours == theirs, (t, d, ours, theirs)


@pytest.mark.parametrize("seed", range(30))
def test_jsonschema_pkg_reverse_fuzz(seed):
    """E2 randomized: random Draft4 schemas (nested objects/arrays,
    required mixes, uniqueItems, additionalProperties) × random docs —
    our validator on jsonschema_to_sjot output agrees with the
    jsonschema package on the original. NB the reference's OWN js2sjot
    diverges from JSON Schema semantics here (nested object props
    become required regardless of 'required'; uniqueItems is dropped
    for enum items) — we match the actual JSON Schema meaning, same
    policy as the tuple-length and regex-anchor choices in E1."""
    import copy
    import random

    import jsonschema

    from sjot_ray.core.convert import jsonschema_to_sjot

    rng = random.Random(590000 + seed)

    def prop_schema(r, depth=2):
        k = r.choice(["int", "num", "str", "strlen", "enum", "arr",
                      "obj", "bool"] if depth > 0 else
                     ["int", "num", "str", "strlen", "enum", "bool"])
        if k == "int":
            lo = r.randint(-5, 3); hi = lo + r.randint(1, 9)
            return ({"type": "integer", "minimum": lo, "maximum": hi},
                    lambda rr: rr.randint(lo - 2, hi + 2))
        if k == "num":
            return ({"type": "number", "minimum": 0, "maximum": 5},
                    lambda rr: round(rr.uniform(-1, 6), 2))
        if k == "str":
            return ({"type": "string"},
                    lambda rr: rr.choice(["", "a", "xyz"]))
        if k == "strlen":
            return ({"type": "string", "minLength": 2, "maxLength": 4},
                    lambda rr: "x" * rr.randint(0, 6))
        if k == "enum":
            return ({"enum": ["x", "y"]},
                    lambda rr: rr.choice(["x", "y", "z"]))
        if k == "bool":
            return ({"type": "boolean"}, lambda rr: rr.random() < 0.5)
        if k == "arr":
            inner, sam = prop_schema(r, 0)
            out = {"type": "array", "items": inner}
            if r.random() < 0.5:
                out["minItems"] = 1
            if r.random() < 0.3:
                out["uniqueItems"] = True
            return (out,
                    lambda rr: [sam(rr) for _ in range(rr.randint(0, 3))])
        inner, sam = prop_schema(r, 0)
        out = {"type": "object", "properties": {"q": inner}}
        if r.random() < 0.5:
            out["required"] = ["q"]
        return (out, lambda rr: {"q": sam(rr)}
                if rr.random() < 0.8 else {})

    props, samplers, required = {}, {}, []
    for i in range(rng.randint(1, 3)):
        psch, sam = prop_schema(rng)
        props[f"p{i}"] = psch
        samplers[f"p{i}"] = sam
        if rng.random() < 0.5:
            required.append(f"p{i}")
    js = {"type": "object", "properties": props}
    if required:
        js["required"] = required
    if rng.random() < 0.3:
        js["additionalProperties"] = False

    v = jsonschema.Draft4Validator(copy.deepcopy(js))
    s = jsonschema_to_sjot(copy.deepcopy(js))
    for _ in range(40):
        doc = {}
        for name, sam in samplers.items():
            if rng.random() < 0.75:
                doc[name] = sam(rng)
        if rng.random() < 0.2:
            doc["extra"] = 1
        theirs = v.is_valid(copy.deepcopy(doc))
        ours = valid(copy.deepcopy(doc), None, copy.deepcopy(s))
        assert ours == theirs, (js, doc, s, ours, theirs)
