"""Differential conformance: sjot_ray.core vs the reference validator.

Every case runs through BOTH engines; we assert identical verdicts,
identical normalized documents (mutation semantics), and identical
diagnostic strings. Corpus covers every operator row of SURVEY.md §2.2-2.4
plus the FIXTURES.md F2/F3 probes.
"""

from __future__ import annotations

import json

import pytest

from .conftest import js_value_eq, run_ours, run_reference

S = lambda **kw: kw  # noqa: E731 - terse schema literal helper


def v(data, type_=None, schema=None):
    return {"data": data, "type": type_, "schema": schema, "mode": "validate"}


def c(schema):
    return {"schema": schema, "mode": "check"}


OBJ = {"@root": "#T", "T": {"a": "int", "b?": "string", "c?3.5": "number"}}

SPAN_SCHEMA = {
    "@root": "#Doc",
    "Doc": {"@final": True,
            "doc_id": "(doc-[0-9a-f]{8})",
            "spans": [1, "#Span"]},
    "Span": {"@final": True,
             "kind": "(text|image|audio|video|table)",
             "text?": "string",
             "media_ref?": "((s3|lance)://[A-Za-z0-9/._-]+)",
             "offset": "0..",
             "@any": [["text", "media_ref"]]},
}


def span_doc(**over):
    doc = {"doc_id": "doc-00ab12ff",
           "spans": [{"kind": "text", "text": "hello", "offset": 0},
                     {"kind": "image", "media_ref": "s3://b/o1.bin",
                      "offset": 5}]}
    doc.update(over)
    return doc


CASES = [
    # --- primitives & sized ints (B12/B13, incl. long=±2^47 quirk) --------
    v(True, "boolean"), v(False, "boolean"), v(0, "boolean"), v(1, "boolean"),
    v(True, "true"), v(False, "true"), v(False, "false"), v(True, "false"),
    v(True, "atom"), v(1, "atom"), v("x", "atom"), v(None, "atom"),
    v([], "atom"), v({}, "atom"),
    *[v(n, t) for t in ("byte", "short", "int", "long", "ubyte", "ushort",
                        "uint", "ulong")
      for n in (-129, -128, -127, 0, 127, 128, 255, 256, -32769, -32768,
                32767, 32768, 65535, 65536, -2147483649, -2147483648,
                2147483647, 2147483648, 4294967295, 4294967296,
                -140737488355329, -140737488355328, 140737488355327,
                140737488355328, 18446744073709551615, 1.5, 2.0)],
    v(1.5, "integer"), v(2.0, "integer"), v(3, "integer"),
    v(1.5, "float"), v(1.5, "double"), v(1.5, "number"), v("1", "number"),
    v(None, "null"), v(0, "null"), v(None, "string"),
    # --- numeric ranges & enums (B14) -------------------------------------
    *[v(n, "1..10") for n in (0, 1, 5, 10, 11, 1.5, 5.0)],
    *[v(n, "1.0..10.0") for n in (0, 1, 5.5, 10.0, 10.5)],
    *[v(n, "<0..5>") for n in (0, 1, 4, 5, 0.5)],
    *[v(n, "<0.0..5.0>") for n in (0.0, 0.5, 4.999, 5.0)],
    *[v(n, "..5") for n in (-100, 5, 6, 4.5)],
    *[v(n, "..5.0") for n in (4.5, 5.0, 5.5)],
    *[v(n, "5..") for n in (4, 5, 6, 5.5)],
    *[v(n, "<5..") for n in (5, 6)],
    *[v(n, "..5>") for n in (4, 5)],
    *[v(n, "-999,-1,0,1,999") for n in (-999, -1, 0, 1, 999, 2, 0.0)],
    *[v(n, "1..10,20..30") for n in (5, 15, 25, 1.5, 25.5)],
    *[v(n, "1.0..2.0,3..4") for n in (1.5, 3.5, 3)],
    *[v(n, "1,2.0..3.0") for n in (1, 2.5)],  # int const then float range
    v(-10, "-10..10"), v(-11, "-10..10"), v(-10, "<-10..10>"), v(-9, "<-10..10>"),
    # --- string formats (B15, lexical-only quirks) ------------------------
    v("abc", "(abc)"), v("abd", "(abc)"), v("xabcx", "(abc)"),
    v("text", "(text|image)"), v("table", "(text|image)"),
    v("ABC+/=", "base64"), v("a", "base64"), v("a=b", "base64"), v("=", "base64"),
    v("deadBEEF09", "hex"), v("", "hex"), v("xyz", "hex"),
    v("123e4567-e89b-12d3-a456-426655440000", "uuid"),
    v("urn:uuid:123e4567-e89b-12d3-a456-426655440000", "uuid"),
    v("123e4567", "uuid"),
    v("2026-13-99", "date"), v("2026-01-31", "date"), v("26-01-31", "date"),
    v("23:59:59", "time"), v("23:59:59.123456+01:00", "time"), v("24:0:0", "time"),
    v("1929-12-31T23:59:59", "datetime"), v("1929-12-31 23:59:59", "datetime"),
    v("1929-12-31T23:59:59.1Z", "datetime"),
    v("PT0S", "duration"), v("-P1Y2M3DT4H5M6S", "duration"), v("XYZ", "duration"),
    v("c", "char"), v("", "char"), v("cc", "char"),
    v("abc", "char[1,10]"), v("", "char[1,10]"), v("abcdefghijk", "char[1,10]"),
    v("abc", "char[3]"), v("abcd", "char[3]"), v("anything", "char[]"),
    v("anything", "charlie"),  # unknown char-prefixed type quirk
    v("str", "string"), v(1, "string"), v("1..10", "1..10"),
    # --- arrays, all forms (B5) -------------------------------------------
    v(["a", "b"], "string[]"), v([], "string[]"), v([1], "string[]"),
    v(["a"], "string[1,2]"), v([], "string[1,2]"), v(["a", "b", "c"], "string[1,2]"),
    v(["a", "b"], "string[2]"), v(["a"], "string[2]"),
    v([["a"], []], "string[][]"), v([["a"], [1]], "string[][]"),
    v([1, 2], ["number"]), v([1, "a"], ["number"]),
    v([], [2]), v([1, 2], [2]), v([None, 2], ["number"]),
    v([1, 2], [1, 2]), v([1, 2, 3], [1, 2]), v([], [1, 2]),
    v([1], ["number", 2]), v([1, 2, 3], ["number", 2]),
    v([1, 2], [1, "number"]), v([], [1, "number"]),
    v([1, 2], [1, "number", 3]), v([1, 2, 3, 4], [1, "number", 3]),
    v([1, 2], "array"), v([1, 2], "any[]"), v({"a": 1}, "array"),
    v([1, 2], "object"), v([None], ["int"]), v([None], ["string"]),
    v([None, None], [2]),
    # --- tuples (B7) ------------------------------------------------------
    v(["s", 1], ["string", "number"]), v(["s"], ["string", "number"]),
    v([], ["string", "number"]), v(["s", 1, 2], ["string", "number"]),
    v([1, "s"], ["string", "number"]), v([None, 1], ["string", "number"]),
    # --- sets (B6: JS string-sort + strict-eq dedup + in-place mutation) --
    v([1, 2, 3], "int{}"), v([1, 2, 2], "int{}"), v([], "int{}"),
    v([10, 2, 1], "int{}"), v([1, 2], "int{1,}"), v([], "int{1,}"),
    v(["b", "a"], "string{}"), v(["a", "a"], "string{}"),
    v([1, 2, 3], "int{1,2}"), v([-1, 0, 2], "-10..10{}"),
    v([1.0, 1], "number{}"),  # strict-equal after sort → duplicate
    v([None, 1], "int{}"),
    v([True, False], "boolean{}"),
    # --- objects: required/optional/defaults/final (B8, B17) --------------
    v({"a": 1}, None, OBJ), v({"a": 1.5}, None, OBJ), v({}, None, OBJ),
    v({"a": 1, "b": "x"}, None, OBJ), v({"a": 1, "b": 7}, None, OBJ),
    v({"a": 1, "b": None}, None, OBJ),         # optional null → deleted
    v({"a": 1, "c": None}, None, OBJ),         # optional null + default → 3.5
    v({"a": 1, "zzz": 9}, None, OBJ),          # open object: extra ok
    v({"a": 1, "zzz": 9}, None,
      {"@root": "#T", "T": {"@final": True, "a": "int"}}),
    v({"a": 1}, None, {"@root": "#T", "T": {"@final": True, "a": "int"}}),
    v({"x": 5}, None, {"@root": {"(x|y)": "int"}}),
    v({"x": "s"}, None, {"@root": {"(x|y)": "int"}}),
    v({"z": "s"}, None, {"@root": {"(x|y)": "int"}}),
    v({"[a]": 0, "a": 1, "b": 2}, None,
      {"@root": {"optional?": "string", "[a]": "number", "(\\w+)": "number"}}),
    # defaults of every flavor (sjot_default)
    v({}, None, {"@root": {"n?42": "int", "s?hi": "string", "b?true": "boolean",
                           "r?5": "1..10", "z?null": "int", "t?null": "string"}}),
    v({}, None, {"@root": {"o?x": "object"}}),
    # --- propsets @one/@any/@all/@dep (B9/B10) ----------------------------
    *[v(d, None, {"@root": {"a?": "int", "b?": "int",
                            "@one": [["a", "b"]]}})
      for d in ({}, {"a": 1}, {"b": 1}, {"a": 1, "b": 1})],
    *[v(d, None, {"@root": {"a?": "int", "b?": "int",
                            "@any": [["a", "b"]]}})
      for d in ({}, {"a": 1}, {"a": 1, "b": 1})],
    *[v(d, None, {"@root": {"a?": "int", "b?": "int",
                            "@all": [["a", "b"]]}})
      for d in ({}, {"a": 1}, {"a": 1, "b": 1})],
    *[v(d, None, {"@root": {"a?": "int", "b?": "int",
                            "@dep": {"a": "b"}}})
      for d in ({}, {"a": 1}, {"a": 1, "b": 1}, {"b": 1})],
    *[v(d, None, {"@root": {"a?": "int", "b?": "int", "c?": "int",
                            "@dep": {"a": ["b", "c"]}}})
      for d in ({"a": 1, "b": 1}, {"a": 1, "b": 1, "c": 1})],
    # --- @extends (B18) ---------------------------------------------------
    v({"base": 1, "extra": "x"}, None,
      {"@root": "#D", "B": {"base": "int"},
       "D": {"@extends": "#B", "extra": "string"}}),
    v({"extra": "x"}, None,
      {"@root": "#D", "B": {"base": "int"},
       "D": {"@extends": "#B", "extra": "string"}}),
    # --- unions (C1-C3) ---------------------------------------------------
    *[v(d, [["string", "number"]]) for d in ("s", 1, True, None, [], {})],
    *[v(d, [["string", "null"]]) for d in ("s", None, 1)],
    *[v(d, [["int[]", "string[]"]])
      for d in ([1], ["a"], [], [1, "a"], "x", [[1]])],
    *[v(d, [["int", "string[]"]]) for d in (1, ["a"], [1])],
    # scalar try-each at depth 1: overlapping numeric branches allowed
    *[v(d, [["1..5", "10..20"]]) for d in (3, 15, 7)],
    # object-branch dispatch by first matching property
    *[v(d, [[{"cat": "string", "n?": "int"}, {"dog": "string"}]])
      for d in ({"cat": "x"}, {"dog": "x"}, {"n": 1, "cat": "x"},
                {"fish": "x"}, {"cat": 5})],
    # @if/@then discriminators
    *[v(d, [[{"@if": "kind", "@then": {"kind": "(a)", "x": "int"}},
             {"@if": "sort", "@then": {"sort": "(b)", "y": "int"}}]])
      for d in ({"kind": "a", "x": 1}, {"sort": "b", "y": 2},
                {"kind": "b", "x": 1}, {"z": 1})],
    v([], [["int[]", "string"]]), v([], [["int", "string"]]),
    v([[1], ["a"]], [["int[][]", "string[][]"]]),
    # --- refs (B3) --------------------------------------------------------
    v(True, "#ref", {"@root": "#ref", "ref": "boolean"}),
    v(True, "#", {"@root": "#T", "T": {"a?": "int"}, "ref": "boolean"}),
    v({"a": 1}, "#", {"@root": "#T", "T": {"a?": "int"}}),
    v(5, "mysch#I", [{"@id": "mysch", "I": "int"}]),
    v(5, "mysch#I", [{"@root": "#I", "I": "string"},
                     {"@id": "mysch", "I": "int"}]),
    v([True], "#ref[]", {"@root": "#ref", "ref": "boolean"}),
    v([True, True], "#ref{}", {"@root": "#ref", "ref": "boolean"}),
    # --- any + embedded @sjot (B2) ----------------------------------------
    v({"x": 1}, "any"), v(1, "any"), v(None, "any"), v([1, "a"], "any"),
    v({"@sjot": {"@root": {"x": "int", "@final": False}}, "x": 1}, "any"),
    v({"@sjot": {"@root": {"x": "string"}}, "x": 1}, "any"),
    v({"@sjot": "int", "x": 1}, "any"),
    v({"@sjot": [{"@root": {"x": "int"}}], "x": 1}, "any"),
    v({"@sjot": {"@root": {"x": "int"}}, "x": 1}, "object"),
    v({"@sjot": 5, "x": 1}, "any"),
    # --- the interleaved flagship fixture shape (F1) ----------------------
    v(span_doc(), None, SPAN_SCHEMA),
    v(span_doc(doc_id="bogus-1"), None, SPAN_SCHEMA),
    v(span_doc(spans=[]), None, SPAN_SCHEMA),
    v(span_doc(spans=[{"kind": "nope", "text": "x", "offset": 0}]),
      None, SPAN_SCHEMA),
    v(span_doc(spans=[{"kind": "text", "text": "x", "offset": -1}]),
      None, SPAN_SCHEMA),
    v(span_doc(spans=[{"kind": "text", "offset": 0}]), None, SPAN_SCHEMA),
    v(span_doc(spans=[{"text": "x", "offset": 0}]), None, SPAN_SCHEMA),
    v(span_doc(spans=[{"kind": "text", "text": "x", "offset": 0,
                       "extra": 1}]), None, SPAN_SCHEMA),
    v(span_doc(spans=[{"kind": "image", "media_ref": "ftp://x", "offset": 0}]),
      None, SPAN_SCHEMA),
    # --- schema admission (D1/D2, FIXTURES F3) ----------------------------
    c({"@root": {"a": "int"}}),
    c({"@root": [-1]}),
    c({"@root": ["int", -2]}),
    c({"@root": [3, "int", 2]}),
    c({"@root": {"a": "5..1"}}),
    c({"@root": {"a": "<3..3>"}}),
    c({"@root": {"a": "3..3"}}),
    c({"@root": {"a": "..x"}}),
    c({"@root": {"a?": "int", "b?": "int", "@one": [["a", "b"], ["a"]]}}),
    c({"@root": {"a": "int", "@one": [["a"], ["b"]]}}),
    c({"@root": {"a?1": "int", "@one": [["a"]]}}),
    c({"@root": {"a?": "int", "b?": "int", "@one": [["a"], ["b"]]}}),
    c({"@root": "#D", "B": {"@final": True, "x": "int"},
       "D": {"@extends": "#B", "y": "int"}}),
    c({"@root": "#D", "B": {"x": "int"},
       "D": {"@extends": "#B", "x": "string"}}),
    c({"@root": "#a", "a": "#b", "b": "int"}),
    c({"@root": [[[["int", "string"]], "boolean"]]}),
    c({"@root": [["int", "byte"]]}),
    c({"@root": [["int[]", "byte[]"]]}),
    c({"@root": [["int", "string", "boolean", "null", {"a": "int"}]]}),
    c({"@root": [[{"a": "int"}, {"a?": "int", "b": "int"}]]}),
    c({"@root": [[{"@if": "k", "@then": {"x": "int"}}, "string"]]}),
    c({"@root": [[{"@if": "k", "@then": "string"}, "int"]]}),
    c({"@root": {"a?": "int", "b?": "int",
                 "@one": [["a", "b"]], "@all": [["a", "b"]]}}),  # UNSAT? no: none+none...
    c({"@root": {"a?": "int", "b?": "int",
                 "@one": [["a", "b"]], "@dep": {"a": "b", "b": "a"}}}),
    c({"@root": {"a?": "int", "@note": "hi"}}),
    c({"@root": {"a?": "int", "@note": 5}}),
    c({"@root": {"a?": "int", "@final": "yes"}}),
    c({"x]": "int", "@root": "#x]"}),
    c([{"@id": "s1", "@root": {"a": "s2#T"}}, {"@id": "s2", "T": "int"}]),
    c({"@root": {"a": "(unclosed["}}),
    c(OBJ), c(SPAN_SCHEMA),
    # type given as JSON string schema
    v({"a": 1}, None, json.dumps(OBJ)),
]


@pytest.fixture(scope="module")
def reference_results():
    return run_reference(CASES)


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_differential(idx, reference_results):
    case = CASES[idx]
    ref = reference_results[idx]
    ours = run_ours(case)
    label = json.dumps(case)[:200]
    assert ours["valid"] == ref["valid"], (
        f"verdict mismatch on {label}: ours={ours}, ref={ref}")
    if case.get("mode") != "check" and ref["valid"]:
        assert js_value_eq(ours["data"], ref["data"]), (
            f"normalized-data mismatch on {label}:"
            f" ours={ours['data']!r} ref={ref['data']!r}")
    if not ref["valid"]:
        ref_err, our_err = ref["error"], ours["error"]
        if "Invalid regular expression" in ref_err:
            # engine-specific regex diagnostics (V8 vs Python re): require a
            # schema error at the same typepath, not identical prose
            assert our_err.startswith("SJOT schema error:")
            assert ref_err.split(" SyntaxError")[0].split("error: ")[1] in our_err
        elif ref_err.startswith("Invalid @sjot schema"):
            # the reference throws a bare string here (index.js:125); we
            # raise a typed schema error carrying the same text
            assert ref_err in our_err
        else:
            assert our_err == ref_err, (
                f"diagnostic mismatch on {label}:\n ours={our_err!r}\n"
                f"  ref={ref_err!r}")
