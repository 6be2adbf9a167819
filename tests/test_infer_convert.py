"""Inference (snapSJOT analogue) differential-tested against the reference
dev/snapsjot.js via node, and converter round-trip checks."""

from __future__ import annotations

import json
import subprocess

import pytest

from sjot_ray.core import check, valid
from sjot_ray.core.convert import jsonschema_to_sjot, sjot_to_jsonschema
from sjot_ray.core.infer import convert as infer_convert
from sjot_ray.core.infer import infer_many

_SNAP_ORACLE = r"""
const fs = require("fs");
let src = fs.readFileSync("/root/reference/dev/snapsjot.js", "utf8");
eval(src + "\n;globalThis.__snap = snapSJOT;");
const cases = JSON.parse(fs.readFileSync(0, "utf8"));
const out = cases.map(c => __snap.convert(c));
process.stdout.write(JSON.stringify(out));
"""

SNAP_CASES = [
    1, 1.5, "s", True, None, [], [1, 2], [1, "a"], ["a", "b"],
    {"a": 1}, {"a": 1, "b": "x"},
    {"a": {"b": [1, 2]}, "c": [{"x": 1}, {"x": 2, "y": 3}]},
    [{"a": 1}, {"b": 2}], [{"a": 1}, {"a": 2, "b": 3}],
    [[1, 2], ["a"]], [[1], [2], []],
    {"weird?name": 1, "(par)": 2, "@note": "x"},
    [1, [2], [[3]]],
    {"list": [None, 1]},
]


@pytest.fixture(scope="module")
def reference_snaps():
    out = subprocess.run(["node", "-e", _SNAP_ORACLE],
                         input=json.dumps(SNAP_CASES), capture_output=True,
                         text=True, check=True).stdout
    return json.loads(out)


@pytest.mark.parametrize("idx", range(len(SNAP_CASES)))
def test_snap_matches_reference(idx, reference_snaps):
    ours = infer_convert(SNAP_CASES[idx])
    ours["@note"] = "SJOT schema created from JSON data by snapSJOT"
    assert json.loads(json.dumps(ours)) == reference_snaps[idx], (
        f"case {SNAP_CASES[idx]!r}:\n ours={ours}\n  ref={reference_snaps[idx]}")


def test_infer_many_validates_inputs():
    docs = [{"k": 5}, {"k": 9, "extra": "x"}, {"k": 1}]
    schema = infer_many([json.loads(json.dumps(d)) for d in docs])
    assert check(json.loads(json.dumps(schema)))
    for d in docs:
        assert valid(json.loads(json.dumps(d)), None,
                     json.loads(json.dumps(schema))), (d, schema)


def test_infer_merge_order_insensitive_for_flat_objects():
    a = [{"x": 1}, {"x": 2, "y": "s"}]
    b = [{"x": 3, "z": True}]
    s1 = infer_many(json.loads(json.dumps(a + b)))
    s2 = infer_many(json.loads(json.dumps(b + a)))
    for d in a + b:
        assert valid(json.loads(json.dumps(d)), None, json.loads(json.dumps(s1)))
        assert valid(json.loads(json.dumps(d)), None, json.loads(json.dumps(s2)))


# --- converters -------------------------------------------------------------

ROUNDTRIP_SCHEMAS = [
    {"@root": {"a": "int", "b?": "string", "c?3.5": "number"}},
    {"@root": {"@final": True, "id": "(x-[0-9]+)", "n": "1..10"}},
    {"@root": "#T", "T": {"v": "byte", "w": "ulong"}},
    {"@root": {"tags": "string[1,5]", "s": "int{}"}},
    {"@root": {"t": ["string", "number"]}},
    {"@root": {"u": [["string", "int"]]}},
    {"@root": {"d": "date", "dt": "datetime", "u": "uuid"}},
    {"@root": {"c": "char", "cc": "char[2,4]"}},
    {"@root": {"x": "<0..5>", "e": "-1,0,1"}},
]

ROUNDTRIP_DOCS = [
    ({"a": 1, "b": "x"}, 0), ({"a": "bad"}, 0),
    ({"id": "x-12", "n": 5}, 1), ({"id": "y", "n": 5}, 1),
    ({"v": 12, "w": 3}, 2), ({"v": 1000, "w": 3}, 2),
    ({"tags": ["a"], "s": [1, 2]}, 3), ({"tags": [], "s": [1]}, 3),
    ({"t": ["s", 1]}, 4), ({"t": [1, "s"]}, 4),
    ({"u": "s"}, 5), ({"u": 3}, 5), ({"u": True}, 5),
    ({"d": "2026-01-01", "dt": "2026-01-01T00:00:00", "u":
      "123e4567-e89b-12d3-a456-426655440000"}, 6),
    ({"d": "x", "dt": "2026-01-01T00:00:00",
      "u": "123e4567-e89b-12d3-a456-426655440000"}, 6),
    ({"c": "q", "cc": "abc"}, 7), ({"c": "qq", "cc": "abc"}, 7),
    ({"x": 3, "e": 0}, 8), ({"x": 0, "e": 0}, 8), ({"x": 3, "e": 5}, 8),
]


@pytest.mark.parametrize("doc,si", ROUNDTRIP_DOCS)
def test_roundtrip_preserves_verdicts(doc, si):
    """SJOT → JSON Schema → SJOT must accept/reject the same documents."""
    import copy

    schema = copy.deepcopy(ROUNDTRIP_SCHEMAS[si])
    v1 = valid(copy.deepcopy(doc), None, copy.deepcopy(schema))
    js = sjot_to_jsonschema(copy.deepcopy(schema))
    back = jsonschema_to_sjot(js)
    v2 = valid(copy.deepcopy(doc), None, back)
    assert v1 == v2, (doc, schema, js, back, v1, v2)


def test_jsonschema_structural_mappings():
    js = sjot_to_jsonschema({
        "@root": "#T",
        "T": {"@final": True, "a": "int", "b?": "string",
              "@dep": {"b": ["a"]}, "set": "int{1,3}",
              "tup": ["string", "int"]},
    })
    t = js  # root is the resolved ref? root "#T" → $ref
    assert t["$ref"] == "#/definitions/T"
    d = js["definitions"]["T"]
    assert d["additionalProperties"] is False
    assert d["required"] == ["a", "set", "tup"]
    assert d["dependencies"] == {"b": ["a"]}
    assert d["properties"]["set"]["uniqueItems"] is True
    assert d["properties"]["set"]["minItems"] == 1
    assert d["properties"]["tup"]["additionalItems"] is False
    assert d["properties"]["a"]["minimum"] == -2147483648


@pytest.mark.parametrize("chunk", range(4))
def test_snap_fuzz_vs_reference(chunk):
    """Randomized deep documents (nested lists/objects incl. empty
    arrays, special prop names, @sjot keys) vs dev/snapsjot.js — exact
    schema equality. This family caught four real divergences in r4:
    JS arrays enumerated as index-keyed objects in merge paths, the
    bare (non-rewrapped) array-unify return, in-pass union growth
    (JS re-evaluates union1.length), and the undefined-vs-null
    distinction ([0] of an empty array is a REAL branch that
    serializes to null)."""
    import random

    oracle = r"""
const fs = require("fs");
let src = fs.readFileSync("/root/reference/dev/snapsjot.js", "utf8");
eval(src + "\n;globalThis.__snap = snapSJOT;");
const cases = JSON.parse(fs.readFileSync(0, "utf8"));
process.stdout.write(JSON.stringify(cases.map(c => __snap.convert(c))));
"""

    def rand_value(rng, depth=4):
        kinds = ["int", "float", "str", "bool", "null"]
        if depth > 0:
            kinds += ["list", "obj", "list", "obj", "list"]
        k = rng.choice(kinds)
        if k == "int":
            return rng.randint(-100, 100)
        if k == "float":
            return round(rng.uniform(-5, 5), 3)
        if k == "str":
            return rng.choice(["", "a", "xyz", "2026-01-01"])
        if k == "bool":
            return rng.random() < 0.5
        if k == "null":
            return None
        if k == "list":
            return [rand_value(rng, depth - 1)
                    for _ in range(rng.randint(0, 5))]
        names = ["a", "b", "weird?n", "(p)", "@x", "c-d", "@sjot"]
        return {rng.choice(names) + str(i): rand_value(rng, depth - 1)
                for i in range(rng.randint(0, 4))}

    rng = random.Random(310000 + chunk)
    cases = [rand_value(rng) for _ in range(250)]
    out = subprocess.run(
        ["node", "-e", oracle], input=json.dumps(cases),
        capture_output=True, text=True, check=True).stdout
    refs = json.loads(out)
    for c, ref in zip(cases, refs):
        ours = infer_convert(json.loads(json.dumps(c)))
        ours["@note"] = "SJOT schema created from JSON data by snapSJOT"
        assert json.loads(json.dumps(ours)) == ref, (
            json.dumps(c)[:200], ours, ref)


@pytest.mark.parametrize("seed", range(60))
def test_infer_many_properties(seed):
    """infer_many's contract (OUR multi-doc extension): the inferred
    schema is check()-admissible, validates EVERY input document, and
    is independent of document order (fold = commutative/associative
    state merge, schema rendered once). An 8,000-seed sweep of this
    class ran clean in r4; the round-3 implementation failed 76/300."""
    import random

    from sjot_ray.core.infer import infer_many

    def rand_doc(rng, depth=3):
        if depth == 0 or rng.random() < 0.4:
            return rng.choice([1, "a", True, None, 2.5])
        if rng.random() < 0.5:
            return [rand_doc(rng, depth - 1)
                    for _ in range(rng.randint(0, 3))]
        return {f"k{i}": rand_doc(rng, depth - 1)
                for i in range(rng.randint(0, 3))}

    rng = random.Random(700000 + seed)
    docs = [rand_doc(rng) for _ in range(rng.randint(2, 6))]
    schema = infer_many(json.loads(json.dumps(docs)))
    check(json.loads(json.dumps(schema)))
    for d in docs:
        assert valid(json.loads(json.dumps(d)), None,
                     json.loads(json.dumps(schema))), (d, schema)
    s2 = infer_many(json.loads(json.dumps(docs[::-1])))
    assert json.dumps(schema, sort_keys=True) == \
        json.dumps(s2, sort_keys=True)
