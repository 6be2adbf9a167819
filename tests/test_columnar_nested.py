"""Columnar coverage for tuple-typed list columns and nested struct
objects: differential against the row engine (itself reference-verified)
and the node reference oracle. Reference semantics:
/root/reference/index.js:240-254 (tuples), :407-460 (nested objects)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import TableValidator
from sjot_ray.core import SJOTValidationError, validate


def _is_map_cell(v) -> bool:
    """Arrow map cells as_py() to lists of 2-TUPLES — JSON arrays never
    contain tuples, so tuple-ness is a reliable marker. (An EMPTY map
    cell is indistinguishable from an empty list; suites that exercise
    maps keep their cells non-empty.)"""
    return isinstance(v, list) and bool(v) and isinstance(v[0], tuple) \
        and len(v[0]) == 2


def _doc_val(v):
    """One Arrow cell value → JSON value: dicts recurse with null
    fields ≡ absent, map cells become dicts (null VALUES kept —
    explicit null ≠ absent for map entries; the row engine's
    optional-null/required-null handling applies), lists recurse into
    their items (null items themselves stay — they're meaningful)."""
    if isinstance(v, dict):
        return _doc_of(v)
    if _is_map_cell(v):
        return {mk: _doc_val(mv) for mk, mv in v}
    if isinstance(v, list):
        return [x if x is None else _doc_val(x) for x in v]
    return v


def _doc_of(row: dict) -> dict:
    """Arrow row → JSON doc under the null ≡ absent convention."""
    return {k: _doc_val(v) for k, v in row.items() if v is not None}


def _row_results(tbl: pa.Table, schema):
    import copy

    verdicts, violations = [], {}
    for i, row in enumerate(tbl.to_pylist()):
        doc = _doc_of(row)
        try:
            validate(doc, None, copy.deepcopy(schema))
            verdicts.append(True)
        except SJOTValidationError as e:
            verdicts.append(False)
            violations[i] = e.violation_row()
    return verdicts, violations


def _assert_parity(tbl, schema, n_invalid_min=1):
    import copy

    tv = TableValidator(copy.deepcopy(schema))
    col_verdict, col_v, _ = tv.validate_batch(tbl)
    col_v = {v["row_idx"]: v for v in col_v}
    row_verdict, row_v = _row_results(tbl, schema)
    for i in range(tbl.num_rows):
        assert bool(col_verdict[i]) == row_verdict[i], (
            i, tbl.slice(i, 1).to_pylist(), col_v.get(i))
    assert sum(not v for v in row_verdict) >= n_invalid_min
    mismatches = []
    for i, rv in row_v.items():
        cv = col_v[i]
        for k in ("datapath", "typepath", "what", "value_repr"):
            if cv[k] != rv[k]:
                mismatches.append((i, k, cv[k], rv[k]))
    assert not mismatches, mismatches[:5]
    return tv


# -- tuples ------------------------------------------------------------------

TUPLE_SCHEMA = {"@root": "#T", "T": {"pair": ["string", "(a|b)", "1..5"]}}


def tuple_table():
    return pa.table({"pair": pa.array([
        ["x", "a", "3"],        # valid
        ["x", "c", "3"],        # slot 1 fails enum
        ["x", "a", "9"],        # slot 2 fails range
        ["x", "a"],             # too short
        ["x", "a", "3", "z"],   # too long
        None,                   # absent (required) → should be present
        ["x", None, "3"],       # null item → default fails (a|b)
    ], pa.list_(pa.string()))})


def test_tuple_column_parity():
    _assert_parity(tuple_table(), TUPLE_SCHEMA)


def test_tuple_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = tuple_table()
    tv = TableValidator(copy.deepcopy(TUPLE_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(TUPLE_SCHEMA), "mode": "validate"}
             for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref)
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


# -- nested structs ----------------------------------------------------------

NESTED_SCHEMA = {
    "@root": "#Doc",
    "Doc": {
        "id": "0..",
        "meta": {
            "@final": True,
            "lang": "(en|de)",
            "score?": "0.0..1.0",
            "inner?": {"flag": "boolean"},
        },
        "opt?": {"n?7": "1..9"},
    },
}


def nested_table():
    meta_t = pa.struct([("lang", pa.string()), ("score", pa.float64()),
                        ("inner", pa.struct([("flag", pa.bool_())])),
                        ("bogus", pa.string())])
    metas = [
        {"lang": "en", "score": 0.5, "inner": None, "bogus": None},
        {"lang": "xx", "score": 0.5, "inner": None, "bogus": None},  # enum
        {"lang": "en", "score": 1.5, "inner": None, "bogus": None},  # range
        {"lang": None, "score": None, "inner": None, "bogus": None},  # req
        None,                                             # meta absent (req)
        {"lang": "de", "score": None,
         "inner": {"flag": True}, "bogus": None},          # valid nested
        {"lang": "de", "score": None,
         "inner": {"flag": None}, "bogus": None},          # inner.flag req
        {"lang": "en", "score": None, "inner": None, "bogus": "X"},  # @final
    ]
    opts = [None, None, None, None, None,
            {"n": 3}, {"n": None}, {"n": 12}]
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6, 7, 8], pa.int64()),
        "meta": pa.array(metas, meta_t),
        "opt": pa.array(opts, pa.struct([("n", pa.int64())])),
    })


def test_nested_struct_parity():
    _assert_parity(nested_table(), NESTED_SCHEMA)


def test_nested_struct_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = nested_table()
    tv = TableValidator(copy.deepcopy(NESTED_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(NESTED_SCHEMA), "mode": "validate"}
             for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_nested_default_injection():
    import copy

    tbl = nested_table()
    tv = TableValidator(copy.deepcopy(NESTED_SCHEMA))
    out = tv.normalize_batch(tbl)
    opts = out["opt"].to_pylist()
    assert opts[6] == {"n": 7}      # null n → default 7
    assert opts[5] == {"n": 3}      # present value untouched
    assert opts[0] is None          # null struct stays null


def test_nested_propsets_and_dep():
    schema = {"@root": {"box": {
        "@one": [["a", "b"]],
        "@dep": {"c": ["d"]},
        "a?": "int", "b?": "int", "c?": "int", "d?": "int",
    }}}
    t = pa.struct([("a", pa.int64()), ("b", pa.int64()),
                   ("c", pa.int64()), ("d", pa.int64())])
    tbl = pa.table({"box": pa.array([
        {"a": 1, "b": None, "c": None, "d": None},   # ok (one of a,b)
        {"a": 1, "b": 2, "c": None, "d": None},      # both → @one fails
        {"a": None, "b": None, "c": None, "d": None},  # neither → fails
        {"a": 1, "b": None, "c": 5, "d": None},      # c without d → @dep
        {"a": 1, "b": None, "c": 5, "d": 6},         # ok
    ], t)})
    _assert_parity(tbl, schema, n_invalid_min=3)

# -- list fields inside item objects and nested structs ----------------------

LIST_IN_ITEM_SCHEMA = {
    "@root": "#Doc",
    "Doc": {
        "doc_id": "0..",
        "spans": [{"kind": "(a|b)", "tags?": "(t[0-9])[1,3]"}],
    },
}


def list_in_item_table():
    span_t = pa.struct([("kind", pa.string()),
                        ("tags", pa.list_(pa.string()))])
    rows = [
        [{"kind": "a", "tags": ["t1", "t2"]}],            # valid
        [{"kind": "a", "tags": ["t1", "XX"]}],            # bad item tag
        [{"kind": "a", "tags": []}],                      # too short
        [{"kind": "a", "tags": ["t1", "t2", "t3", "t4"]}],  # too long
        [{"kind": "a", "tags": None}],                    # absent optional
        [{"kind": "b", "tags": ["t1"]},
         {"kind": "a", "tags": ["t5", "ZZ"]}],            # 2nd span, 2nd tag
        [{"kind": "XX", "tags": ["BAD"]}],                # kind fails first
    ]
    return pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "spans": pa.array(rows, pa.list_(span_t)),
    })


def test_list_field_in_item_objects_parity():
    _assert_parity(list_in_item_table(), LIST_IN_ITEM_SCHEMA)


def test_list_field_in_item_objects_vs_oracle():
    import copy

    from .conftest import run_reference

    tbl = list_in_item_table()
    tv = TableValidator(copy.deepcopy(LIST_IN_ITEM_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    for d in docs:  # drop null tags (absent)
        for s in d.get("spans", []):
            if s.get("tags") is None:
                s.pop("tags", None)
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(LIST_IN_ITEM_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


STRUCT_LIST_SCHEMA = {
    "@root": {
        "meta": {"labels": "(l[0-9])+{2,3}", "ns?": "1..5[,2]"},
    },
}


def struct_list_table():
    meta_t = pa.struct([("labels", pa.list_(pa.string())),
                        ("ns", pa.list_(pa.int64()))])
    metas = [
        {"labels": ["l1", "l2"], "ns": [1, 2]},        # valid
        {"labels": ["l2", "l1", "l1"], "ns": None},    # dup set member
        {"labels": ["l1"], "ns": None},                # set too small
        {"labels": ["l1", "BAD"], "ns": None},         # bad set item
        {"labels": ["l1", "l2"], "ns": [1, 9]},        # ns item out of range
        {"labels": ["l1", "l2"], "ns": [1, 2, 3]},     # ns too long
        {"labels": None, "ns": None},                  # labels required
    ]
    return pa.table({"meta": pa.array(metas, meta_t)})


def test_list_field_in_struct_parity():
    _assert_parity(struct_list_table(), STRUCT_LIST_SCHEMA)


def test_struct_set_normalized_sorted():
    import copy

    tv = TableValidator(copy.deepcopy(STRUCT_LIST_SCHEMA))
    out = tv.normalize_batch(struct_list_table())
    m = out["meta"].to_pylist()
    assert m[0]["labels"] == sorted(m[0]["labels"])
    assert m[1]["labels"] == ["l1", "l1", "l2"]  # sorted, dups preserved


# -- regex property names over map columns -----------------------------------

MAP_SCHEMA = {
    "@root": {
        "attrs": {
            "@final": True,
            "id": "(d[0-9]+)",
            "note?": "string",
            "(x_[a-z]+)": "(on|off)",
        },
    },
}


def map_table():
    map_t = pa.map_(pa.string(), pa.string())
    rows = [
        [("id", "d1"), ("x_a", "on")],            # valid
        [("id", "d1"), ("x_a", "bad")],           # regex value fails
        [("x_a", "on")],                          # id should be present
        [("id", "d1"), ("zz", "on")],             # @final extra
        None,                                     # attrs required
        [("id", "nope"), ("x_b", "off")],         # id value fails
        [("id", "d2"), ("note", "hi"), ("x_a", "off")],  # valid
    ]
    return pa.table({"attrs": pa.array(rows, map_t)})


def _map_doc(row):
    if row["attrs"] is None:
        return {}
    return {"attrs": dict(row["attrs"])}


def test_map_regex_props_parity():
    import copy

    tbl = map_table()
    tv = TableValidator(copy.deepcopy(MAP_SCHEMA))
    col_verdict, col_v, _ = tv.validate_batch(tbl)
    col_v = {v["row_idx"]: v for v in col_v}
    for i, row in enumerate(tbl.to_pylist()):
        doc = _map_doc(row)
        try:
            validate(doc, None, copy.deepcopy(MAP_SCHEMA))
            ok = True
        except SJOTValidationError as e:
            ok = False
            rv = e.violation_row()
        assert bool(col_verdict[i]) == ok, (i, doc, col_v.get(i))
        if not ok:
            cv = col_v[i]
            for k in ("datapath", "typepath", "what", "value_repr"):
                assert cv[k] == rv[k], (i, k, cv[k], rv[k], doc)


def test_map_regex_props_vs_oracle():
    import copy

    from .conftest import run_reference

    tbl = map_table()
    tv = TableValidator(copy.deepcopy(MAP_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_map_doc(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(MAP_SCHEMA), "mode": "validate"}
             for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_invalid_default_on_absent_optional():
    """The reference injects an absent optional's default and validates
    it (index.js:429-433): a type-violating default fails every absent
    row — at top level, in nested structs, in item objects, and in map
    fixed props."""
    # nested struct site
    schema = {"@root": {"box": {"n?77": "0..9"}}}
    tbl = pa.table({"box": pa.array(
        [{"n": None}, {"n": 5}, None],
        pa.struct([("n", pa.int64())]))})
    _assert_parity(tbl, schema)

    # list-item object site
    schema2 = {"@root": {"spans": [{"k": "(a|b)", "m?42": "0..9"}]}}
    tbl2 = pa.table({"spans": pa.array(
        [[{"k": "a", "m": None}], [{"k": "a", "m": 3}]],
        pa.list_(pa.struct([("k", pa.string()), ("m", pa.int64())])))})
    _assert_parity(tbl2, schema2)

    # map fixed-prop site
    schema3 = {"@root": {"attrs": {"fixed?zz": "(a|b)",
                                   "(k[0-9])": "string"}}}
    tbl3 = pa.table({"attrs": pa.array(
        [[("k1", "x")], [("fixed", "a")]],
        pa.map_(pa.string(), pa.string()))})
    import copy

    tv = TableValidator(copy.deepcopy(schema3))
    verdict, viols, _ = tv.validate_batch(tbl3)
    assert list(verdict) == [False, True]
    assert viols[0]["value_repr"] == "zz"
    assert validate.__module__  # row-engine cross-check below
    from sjot_ray.core import valid as row_valid
    assert row_valid({"attrs": {"k1": "x"}}, None,
                     copy.deepcopy(schema3)) is False
    assert row_valid({"attrs": {"fixed": "a"}}, None,
                     copy.deepcopy(schema3)) is True


def test_char_rules_survive_type_mismatched_columns():
    """char[n,m] rules over non-string Arrow columns must mark rows
    invalid (schema-table mismatch), never crash the batch."""
    tv = TableValidator({"@root": {"tags": "char[2][]"}})
    v, viols, _ = tv.validate_batch(
        pa.table({"tags": pa.array([[1, 2], None], pa.list_(pa.int64()))}))
    assert list(v) == [False, False]  # row 1: required tags absent
    v0 = {x["row_idx"]: x for x in viols}[0]
    assert v0["what"] == "value"  # reference labels mismatches value
    assert v0["value_repr"] == "1"

    tv2 = TableValidator({"@root": {"meta": {"code": "char[2]"}}})
    v2, _, _ = tv2.validate_batch(pa.table(
        {"meta": pa.array([{"code": 7}],
                          pa.struct([("code", pa.int64())]))}))
    assert list(v2) == [False]

    tv3 = TableValidator({"@root": {"c": "char[2,4]"}})
    v3, _, _ = tv3.validate_batch(pa.table({"c": pa.array([5], pa.int64())}))
    assert list(v3) == [False]


def test_scalar_type_mismatch_matrix():
    """Every scalar SJOT type × every mismatched Arrow column type must
    produce the row engine's verdict (usually invalid), never a crash."""
    import copy

    cells = [(pa.int64(), 3), (pa.string(), "x"), (pa.bool_(), True),
             (pa.float64(), 1.5)]
    types = ["string", "(a|b)", "char[2,4]", "char", "0..5", "boolean",
             "int", "hex", "date", "true", "null", "atom", "number",
             "int[]", "string{1,}", "int[2]", ["string", "string"],
             {"(k[0-9])": "string"}]
    mism = []
    for st in types:
        for at, val in cells:
            schema = {"@root": {"v": st}}
            tbl = pa.table({"v": pa.array([val], at)})
            try:
                tv = TableValidator(copy.deepcopy(schema))
                verdict, _, _ = tv.validate_batch(tbl)
                col_ok = bool(verdict[0])
            except Exception as e:  # noqa: BLE001 - any crash is a bug
                mism.append((st, str(at), "CRASH", repr(e)[:60]))
                continue
            try:
                validate({"v": val}, None, copy.deepcopy(schema))
                row_ok = True
            except SJOTValidationError:
                row_ok = False
            if col_ok != row_ok:
                mism.append((st, str(at), col_ok, row_ok))
    assert not mism, mism


def test_final_in_item_objects():
    """@final inside list-item objects rejects extra physical struct
    fields (reference index.js:448-451), with the item-indexed datapath."""
    schema = {"@root": {"spans": [{"@final": True, "kind": "(a|b)"}]}}
    span_t = pa.struct([("kind", pa.string()), ("extra", pa.string())])
    tbl = pa.table({"spans": pa.array(
        [[{"kind": "a", "extra": None}],
         [{"kind": "a", "extra": "X"}],
         [{"kind": "b", "extra": None}, {"kind": "a", "extra": "Y"}]],
        pa.list_(span_t))})
    import copy

    tv = TableValidator(copy.deepcopy(schema))
    v, viols, _ = tv.validate_batch(tbl)
    assert list(v) == [True, False, False]
    viols = {x["row_idx"]: x for x in viols}
    assert viols[1]["datapath"] == "$.spans[0].extra"
    assert viols[2]["datapath"] == "$.spans[1].extra"
    # row-engine agreement
    assert validate({"spans": [{"kind": "a"}]}, None, copy.deepcopy(schema))
    with pytest.raises(SJOTValidationError):
        validate({"spans": [{"kind": "a", "extra": "X"}]}, None,
                 copy.deepcopy(schema))


def test_union_shape_and_container_branches():
    """Scalar-only unions over container columns fail rows (row-engine
    parity, no worker crash); unions carrying container branches fall
    back to the row engine at COMPILE time."""
    import copy

    from sjot_ray.columnar.table_validator import ColumnarCompileError

    schema = {"@root": {"v": [["string", "int"]]}}
    tv = TableValidator(copy.deepcopy(schema))
    v, _, _ = tv.validate_batch(
        pa.table({"v": pa.array([["a"]], pa.list_(pa.string()))}))
    assert list(v) == [False]
    with pytest.raises(SJOTValidationError):
        validate({"v": ["a"]}, None, copy.deepcopy(schema))

    # container branches now compile (r3) — parity-checked against the
    # row engine on a list column
    tbl = pa.table({"v": pa.array([[1], []], pa.list_(pa.int64()))})
    _assert_parity(tbl, {"@root": {"v": [["string", "int[]"]]}},
                   n_invalid_min=0)
    # NESTED union object branches degrade to a per-position row-engine
    # rule since r4 (the rest of the schema stays columnar) — parity
    schema_n = {"@root": {"box?": {"u": [["int", {"a": "0..9"}]]}}}
    bt = pa.struct([("u", pa.struct([("a", pa.int64())]))])
    _assert_parity(pa.table({"box": pa.array(
        [{"u": {"a": 5}}, {"u": {"a": 50}}, {"u": None}, None], bt)}),
        schema_n)


def test_struct_schema_over_map_column():
    """A top-level map column carries object data as entries: required
    presence, scalar values, and @final must validate against the
    entries (verdict parity with the row engine on dict data)."""
    import copy

    from sjot_ray.core import valid

    m = pa.map_(pa.string(), pa.string())
    schema = {"@root": {"v": {"a": "(x|y)", "b?": "string",
                              "@final": True}}}
    rows = [[("a", "x")], [("b", "z")], [("a", "BAD")],
            [("a", "y"), ("zz", "q")], []]
    tv = TableValidator(copy.deepcopy(schema))
    cv, _, _ = tv.validate_batch(pa.table({"v": pa.array(rows, m)}))
    for cell, got in zip(rows, cv):
        want = valid({"v": dict(cell)}, None, copy.deepcopy(schema))
        assert bool(got) == want, (cell, bool(got), want)


# -- regex property names inside nested structs (r2 VERDICT #5) --------------

REGEX_NESTED_SCHEMA = {
    "@root": "#Doc",
    "Doc": {
        "id": "0..",
        "attrs": {
            "@final": True,
            "name": "string",
            "(x_[a-z]+)": "0..100",
            "(tag_.*)": "(red|blue)",
        },
    },
}


def regex_nested_table():
    attrs_t = pa.struct([
        ("name", pa.string()), ("x_alpha", pa.int64()),
        ("x_beta", pa.int64()), ("tag_color", pa.string()),
        ("other", pa.string())])
    attrs = [
        {"name": "a", "x_alpha": 5, "x_beta": None, "tag_color": "red",
         "other": None},                                   # valid
        {"name": "a", "x_alpha": 500, "x_beta": None, "tag_color": None,
         "other": None},                                   # x_alpha range
        {"name": "a", "x_alpha": 5, "x_beta": -1, "tag_color": None,
         "other": None},                                   # x_beta range
        {"name": "a", "x_alpha": None, "x_beta": None,
         "tag_color": "green", "other": None},             # tag enum
        {"name": "a", "x_alpha": 101, "x_beta": -2, "tag_color": "green",
         "other": None},               # multiple fails → first in order
        {"name": "a", "x_alpha": None, "x_beta": None, "tag_color": None,
         "other": "X"},                # @final extra (regex fields exempt)
        {"name": None, "x_alpha": 7, "x_beta": None, "tag_color": None,
         "other": None},               # required literal prop missing
        None,                          # attrs absent (required)
    ]
    return pa.table({
        "id": pa.array(list(range(1, len(attrs) + 1)), pa.int64()),
        "attrs": pa.array(attrs, attrs_t),
    })


def test_regex_props_nested_struct_parity():
    _assert_parity(regex_nested_table(), REGEX_NESTED_SCHEMA)


def test_regex_props_nested_struct_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = regex_nested_table()
    tv = TableValidator(copy.deepcopy(REGEX_NESTED_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(REGEX_NESTED_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_regex_props_deeper_nesting_parity():
    """Pattern props two struct levels down."""
    schema = {"@root": "#D",
              "D": {"outer": {"inner?": {"(k[0-9])": "(on|off)"}}}}
    inner_t = pa.struct([("k1", pa.string()), ("k2", pa.string())])
    outer_t = pa.struct([("inner", inner_t)])
    rows = [
        {"inner": {"k1": "on", "k2": None}},
        {"inner": {"k1": "bad", "k2": "off"}},
        {"inner": {"k1": "on", "k2": "evil"}},
        {"inner": None},
        None,
    ]
    tbl = pa.table({"outer": pa.array(rows, outer_t)})
    _assert_parity(tbl, schema)


def test_regex_props_match_literal_prop_too():
    """The reference's regex pass re-validates data props already matched
    by literal props when the name also matches the pattern
    (core/validator.py kind-2 iterates ALL data keys)."""
    schema = {"@root": "#D",
              "D": {"box": {"kx?": "string", "(k.)": "(a|b)"}}}
    box_t = pa.struct([("kx", pa.string())])
    tbl = pa.table({"box": pa.array(
        [{"kx": "a"}, {"kx": "zzz"}], box_t)})
    _assert_parity(tbl, schema)


def test_regex_props_nonscalar_type_compiles_deep():
    """Regex props with object value types compile since round 4 (map +
    struct layouts, embedded subs); value OBJECTS with positions
    outside the vectorized surface now degrade those POSITIONS to
    row-engine value rules inside the embedded sub — parity."""
    import copy

    schema = {"@root": "#D",
              "D": {"box": {"(k.)": {"v": "int"}}}}
    TableValidator(copy.deepcopy(schema))  # compiles
    deep = {"@root": "#D",
            "D": {"box?": {"(k.)": {"v": [["string[]", {"a": "0..9"}]]}}}}
    bt = pa.struct([("ka", pa.struct([("v", pa.list_(pa.string()))]))])
    tbl = pa.table({"box": pa.array(
        [{"ka": {"v": ["x"]}}, {"ka": {"v": None}}, None], bt)})
    _assert_parity(tbl, deep, n_invalid_min=1)


# -- embedded @sjot under a top-level any column (r2 VERDICT #8) -------------

EMBED_SCHEMA = {
    "@root": "#Doc",
    "Doc": {"id": "0..", "payload?": "any"},
    "Inner": {"n": "1..9"},
}


def embed_table():
    payload_t = pa.struct([("@sjot", pa.string()), ("n", pa.int64()),
                           ("z", pa.string())])
    payloads = [
        None,                                       # absent optional
        {"@sjot": None, "n": 5, "z": "free"},       # no @sjot → any passes
        {"@sjot": "#Inner", "n": 5, "z": None},     # embedded ref, valid
        {"@sjot": "#Inner", "n": 50, "z": None},    # embedded ref, range
        {"@sjot": "#Inner", "n": None, "z": None},  # required n missing
        {"@sjot": "#Nope", "n": 1, "z": None},      # unknown type name
    ]
    return pa.table({
        "id": pa.array(list(range(1, len(payloads) + 1)), pa.int64()),
        "payload": pa.array(payloads, payload_t)})


def test_embedded_sjot_columnar_matches_row_engine():
    """Mixed corpus: @sjot carrier rows validate via the in-pass row
    engine; everything else stays columnar — verdict AND first-violation
    parity for the validation-error rows (the unknown-type-name schema
    error fails the row in the columnar op by the no-worker-raise
    contract, while the raw row engine raises SJOTSchemaError)."""
    import copy

    tbl = embed_table()
    tv = TableValidator(copy.deepcopy(EMBED_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    from sjot_ray.core import SJOTSchemaError

    for i, row in enumerate(tbl.to_pylist()):
        doc = _doc_of(row)
        try:
            validate(copy.deepcopy(doc), None, copy.deepcopy(EMBED_SCHEMA))
            ok, rv = True, None
        except SJOTValidationError as e:
            ok, rv = False, e.violation_row()
        except SJOTSchemaError:
            ok, rv = False, None  # schema error → row fails, no raise
        assert bool(verdict[i]) == ok, (i, doc, viols.get(i))
        if rv is not None:
            cv = viols[i]
            for k in ("datapath", "typepath", "what", "value_repr"):
                assert cv[k] == rv[k], (i, k, cv[k], rv[k])


def test_embedded_sjot_columnar_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = embed_table()
    tv = TableValidator(copy.deepcopy(EMBED_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(EMBED_SCHEMA), "mode": "validate"}
             for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))


def test_embedded_sjot_map_layout():
    """@sjot detection over a map<string,int> column (inline numeric
    payload)."""
    import copy

    schema = {"@root": "#D", "D": {"m?": "any"}, "T": {"a": "1..5"}}
    # map values are int64; @sjot key can't carry a type NAME in this
    # layout, so carriers with non-string @sjot values fail like the row
    # engine (Invalid @sjot schema)
    tbl = pa.table({"m": pa.array(
        [[("a", 3)], [("@sjot", 1), ("a", 3)], None],
        pa.map_(pa.string(), pa.int64()))})
    tv = TableValidator(copy.deepcopy(schema))
    verdict, viols, _ = tv.validate_batch(tbl)
    from sjot_ray.core import SJOTSchemaError

    for i, row in enumerate(tbl.to_pylist()):
        doc = _doc_of({"m": dict(row["m"])} if row["m"] is not None else {})
        try:
            validate(copy.deepcopy(doc), None, copy.deepcopy(schema))
            ok = True
        except (SJOTValidationError, SJOTSchemaError):
            ok = False
        assert bool(verdict[i]) == ok, (i, doc, viols)


# -- regex property names in item objects ------------------------------------

ITEM_REGEX_SCHEMA = {
    "@root": "#Doc",
    "Doc": {"items": [{
        "@final": True,
        "name": "string",
        "(m_[a-z]+)": "0..10",
    }]},
}


def item_regex_table():
    item_t = pa.struct([("name", pa.string()), ("m_a", pa.int64()),
                        ("m_b", pa.int64()), ("other", pa.string())])
    rows = [
        [{"name": "x", "m_a": 5, "m_b": None, "other": None}],   # valid
        [{"name": "x", "m_a": 50, "m_b": None, "other": None}],  # m_a range
        [{"name": "x", "m_a": 1, "m_b": -3, "other": None}],     # m_b range
        [{"name": "x", "m_a": 1, "m_b": None, "other": None},
         {"name": "y", "m_a": 99, "m_b": 99, "other": None}],    # item 1
        [{"name": "x", "m_a": None, "m_b": None, "other": "E"}],  # @final
        [{"name": None, "m_a": 2, "m_b": None, "other": None}],  # req name
        [],                                                      # fine
        None,                                                    # absent req
    ]
    return pa.table({"items": pa.array(rows, pa.list_(item_t))})


def test_regex_props_item_objects_parity():
    _assert_parity(item_regex_table(), ITEM_REGEX_SCHEMA)


def test_regex_props_item_objects_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = item_regex_table()
    tv = TableValidator(copy.deepcopy(ITEM_REGEX_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(ITEM_REGEX_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


# -- tuple fields inside nested structs --------------------------------------

NESTED_TUPLE_SCHEMA = {
    "@root": "#Doc",
    "Doc": {"meta": {"pair?": ["string", "(a|b)", "1..5"],
                     "tag?": "string"}},
}


def nested_tuple_table():
    meta_t = pa.struct([("pair", pa.list_(pa.string())),
                        ("tag", pa.string())])
    rows = [
        {"pair": ["x", "a", "3"], "tag": None},        # valid
        {"pair": ["x", "c", "3"], "tag": None},        # slot 1 enum
        {"pair": ["x", "a", "9"], "tag": None},        # slot 2 range
        {"pair": ["x", "a"], "tag": None},             # too short
        {"pair": ["x", "a", "3", "z"], "tag": None},   # too long
        {"pair": None, "tag": "t"},                    # absent optional
        {"pair": ["x", None, "3"], "tag": None},       # null item slot 1
        None,                                          # struct absent
    ]
    return pa.table({"meta": pa.array(rows, meta_t)})


def test_nested_tuple_parity():
    _assert_parity(nested_tuple_table(), NESTED_TUPLE_SCHEMA)


def test_nested_tuple_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = nested_tuple_table()
    tv = TableValidator(copy.deepcopy(NESTED_TUPLE_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(NESTED_TUPLE_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))


def test_propsets_see_injected_defaults():
    """The reference INJECTS valid optional defaults into the document,
    so a propset/@dep occurring later in schema order sees those props
    as present (index.js:429-433 then 412-424). Columnar parity across
    top-level struct, nested struct, and regex-prop (map-object-path)
    layouts."""
    import copy

    from .conftest import run_reference

    # @one[[p0,p1]]: p0?7 is ALWAYS present after injection → the doc
    # fails exactly when p1 is also present
    box_t = pa.struct([("p0", pa.int64()), ("p1", pa.int64())])
    rows = [
        {"p0": None, "p1": None},   # p0 injected → exactly one → valid
        {"p0": 3, "p1": None},      # valid
        {"p0": None, "p1": 4},      # p0 injected + p1 → two → invalid
        {"p0": 3, "p1": 4},         # invalid
    ]
    for schema in (
        {"@root": {"box": {"p0?7": "0..100", "p1?": "0..100",
                           "@one": [["p0", "p1"]]}}},
        # same shape but routed through the map-object path (regex prop)
        {"@root": {"box": {"p0?7": "0..100", "p1?": "0..100",
                           "(z.)?": "0..100", "@one": [["p0", "p1"]]}}},
        # nested one level deeper
        {"@root": {"outer": {"box": {"p0?7": "0..100", "p1?": "0..100",
                                     "@one": [["p0", "p1"]]}}}},
    ):
        nested = "outer" in schema["@root"]
        if nested:
            tbl = pa.table({"outer": pa.array(
                [{"box": r} for r in rows],
                pa.struct([("box", box_t)]))})
        else:
            tbl = pa.table({"box": pa.array(rows, box_t)})
        tv = _assert_parity(tbl, schema, n_invalid_min=2)
        docs = [_doc_of(r) for r in tbl.to_pylist()]
        verdict, _, _ = tv.validate_batch(tbl)
        cases = [{"data": d, "type": "@root",
                  "schema": copy.deepcopy(schema), "mode": "validate"}
                 for d in docs]
        for i, ref in enumerate(run_reference(cases)):
            assert bool(verdict[i]) == ref["valid"], (schema, i, ref)

    # @dep keyed on an injected prop: p0?7 present → requires p1
    schema = {"@root": {"box": {"p0?7": "0..100", "p1?": "0..100",
                                "@dep": {"p0": ["p1"]}}}}
    tbl = pa.table({"box": pa.array(rows, box_t)})
    _assert_parity(tbl, schema, n_invalid_min=1)


# -- object fields inside item objects ---------------------------------------

OBJ_IN_ITEM_SCHEMA = {
    "@root": "#Doc",
    "Doc": {"spans": [{
        "kind": "(a|b)",
        "meta?": {"@final": True, "lang": "(en|de)", "score?": "0.0..1.0"},
    }]},
}


def obj_in_item_table():
    meta_t = pa.struct([("lang", pa.string()), ("score", pa.float64()),
                        ("junk", pa.string())])
    item_t = pa.struct([("kind", pa.string()), ("meta", meta_t)])
    rows = [
        [{"kind": "a", "meta": {"lang": "en", "score": 0.5,
                                "junk": None}}],              # valid
        [{"kind": "a", "meta": {"lang": "xx", "score": 0.5,
                                "junk": None}}],              # enum fail
        [{"kind": "a", "meta": {"lang": "en", "score": 1.5,
                                "junk": None}}],              # range fail
        [{"kind": "a", "meta": {"lang": None, "score": None,
                                "junk": None}}],              # lang required
        [{"kind": "a", "meta": None}],                        # meta absent ok
        [{"kind": "c", "meta": {"lang": "xx", "score": None,
                                "junk": None}}],              # kind first
        [{"kind": "a", "meta": {"lang": "en", "score": None,
                                "junk": "Z"}}],               # @final junk
        [{"kind": "a", "meta": None},
         {"kind": "b", "meta": {"lang": "de", "score": 2.0,
                                "junk": None}}],              # item 1 range
        [],                                                   # fine
        None,                                                 # spans required
    ]
    return pa.table({"spans": pa.array(rows, pa.list_(item_t))})


def test_object_in_item_parity():
    _assert_parity(obj_in_item_table(), OBJ_IN_ITEM_SCHEMA)


def test_object_in_item_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = obj_in_item_table()
    tv = TableValidator(copy.deepcopy(OBJ_IN_ITEM_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(OBJ_IN_ITEM_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_object_in_item_two_levels():
    """Two struct levels inside the item object."""
    schema = {"@root": {"xs?": [{"a?": {"b?": {"c": "1..3"}}}]}}
    b_t = pa.struct([("c", pa.int64())])
    a_t = pa.struct([("b", b_t)])
    item_t = pa.struct([("a", a_t)])
    rows = [
        [{"a": {"b": {"c": 2}}}],
        [{"a": {"b": {"c": 9}}}],      # deep range fail
        [{"a": {"b": None}}],          # absent optional, fine
        [{"a": None}],
        [None],                        # null item → object required
    ]
    tbl = pa.table({"xs": pa.array(rows, pa.list_(item_t))})
    _assert_parity(tbl, schema, n_invalid_min=2)


# -- unions with container branches over list columns ------------------------

LIST_UNION_SCHEMA = {"@root": {"v?": [["int[1,3]", "string{2,4}",
                                       "boolean"]]}}


def test_union_container_branches_int_list():
    tbl = pa.table({"v": pa.array(
        [[1, 2], [1, 2, 3, 4], [], [1, None], [7], None],
        pa.list_(pa.int64()))})
    _assert_parity(tbl, LIST_UNION_SCHEMA)


def test_union_container_branches_string_set():
    tbl = pa.table({"v": pa.array(
        [["a", "b"], ["a", "a"], ["a"], ["b", "zz", "a"],
         ["ok", None, "x"], []],
        pa.list_(pa.string()))})
    _assert_parity(tbl, LIST_UNION_SCHEMA)


def test_union_container_branches_no_slot_kind():
    # boolean LIST: union has no depth-2 boolean slot → every valid fails
    tbl = pa.table({"v": pa.array(
        [[True, False], [], None], pa.list_(pa.bool_()))})
    _assert_parity(tbl, LIST_UNION_SCHEMA)


def test_union_scalar_column_unchanged():
    tbl = pa.table({"v": pa.array([True, False, None], pa.bool_())})
    _assert_parity(tbl, LIST_UNION_SCHEMA, n_invalid_min=0)


def test_union_any_cutoff_over_lists():
    schema = {"@root": {"v?": [["array", "int"]]}}
    tbl = pa.table({"v": pa.array(
        [[1, 2], [], [99]], pa.list_(pa.int64()))})
    _assert_parity(tbl, schema, n_invalid_min=0)


def test_union_nested_list_data():
    # list<list<int>> data at depth 3: only an any-cutoff admits it
    schema = {"@root": {"v?": [["int[]", "string"]]}}
    tbl = pa.table({"v": pa.array(
        [[[1]], [[]], []], pa.list_(pa.list_(pa.int64())))})
    _assert_parity(tbl, schema)


def test_union_container_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = pa.table({"v": pa.array(
        [[1, 2], [1, 2, 3, 4], [], [7], [1, None]],
        pa.list_(pa.int64()))})
    tv = TableValidator(copy.deepcopy(LIST_UNION_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(LIST_UNION_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))


def test_union_object_branch_dispatch():
    """Depth-1 OBJECT branches dispatch by property name (slots.p): a
    struct payload naming the branch validates fully against it; object
    data naming no branch fails at the union (r3)."""
    schema = {"@root": {"v?": [["int", {"a": "1..5", "b?": "string"}]]}}
    st = pa.struct([("a", pa.int64()), ("b", pa.string()),
                    ("z", pa.int64())])
    tbl = pa.table({"v": pa.array(
        [{"a": 2, "b": None, "z": None},
         {"a": 9, "b": None, "z": None},     # prop value fails
         {"a": None, "b": "x", "z": None},   # b names branch, a required
         {"a": None, "b": None, "z": 1},     # names no branch → union err
         {"a": None, "b": None, "z": None},  # empty object → union err
         None],
        st)})
    _assert_parity(tbl, schema)
    # scalar payload through the same union
    tbl2 = pa.table({"v": pa.array([3, None], pa.int64())})
    _assert_parity(tbl2, schema, n_invalid_min=0)


def test_union_object_branch_nested_payload_degrades():
    """Union object branches on NESTED payloads compile since r4: the
    position degrades to one row-engine value rule (the union dispatch
    machinery is top-level-only, but the row engine covers the full
    grammar). Parity over both layouts of the payload."""
    import copy

    schema = {"@root": {"box?": {"u": [["int", {"a": "0..9"}]]}}}
    TableValidator(copy.deepcopy(schema))
    bt = pa.struct([("u", pa.int64())])
    _assert_parity(pa.table({"box": pa.array(
        [{"u": 3}, {"u": None}, None], bt)}), schema, n_invalid_min=0)


def test_union_object_branch_nonscalar_prop_compiles():
    """Container props inside object branches compile since r4 (the
    _compile_sub relaxation) — parity over struct layouts."""
    schema = {"@root": {"v?": [["int", {"a": "0..9[1,2]"}]]}}
    v_t = pa.struct([("a", pa.list_(pa.int64()))])
    tbl = pa.table({"v": pa.array(
        [{"a": [1, 2]}, {"a": [1, 50]}, {"a": []}, {"a": None}, None],
        v_t)})
    _assert_parity(tbl, schema)


def test_union_container_branches_in_nested_struct():
    """Container-branch unions over LIST fields inside nested structs
    (the generalized union kernel resolves through the struct path)."""
    schema = {"@root": {"meta": {"u?": [["int[1,3]", "string{2,4}",
                                        "boolean"]]}}}
    meta_t = pa.struct([("u", pa.list_(pa.int64()))])
    tbl = pa.table({"meta": pa.array(
        [{"u": [1, 2]}, {"u": [1, 2, 3, 4]}, {"u": []}, {"u": [7]},
         {"u": None}, None],
        meta_t)})
    _assert_parity(tbl, schema)
    # scalar carrier through the same path
    meta_b = pa.struct([("u", pa.bool_())])
    tbl2 = pa.table({"meta": pa.array(
        [{"u": True}, {"u": None}, None], meta_b)})
    _assert_parity(tbl2, schema, n_invalid_min=0)


def test_union_field_inside_item_object():
    """Union-typed fields of list<struct> items run through the
    rebased union kernel (scalar and list carriers)."""
    schema = {"@root": {"spans?": [{
        "k?": "string", "u?": [["int[1,3]", "string{2,4}", "boolean"]]}]}}
    item_list = pa.struct([("k", pa.string()),
                           ("u", pa.list_(pa.int64()))])
    tbl = pa.table({"spans": pa.array(
        [[{"k": "a", "u": [1, 2]}],
         [{"k": "a", "u": [1, 2, 3, 4]}],
         [{"k": "a", "u": []}, {"k": "b", "u": [7]}],
         [{"k": "a", "u": None}],
         [None],
         None],
        pa.list_(item_list))})
    _assert_parity(tbl, schema)
    item_scalar = pa.struct([("k", pa.string()), ("u", pa.bool_())])
    tbl2 = pa.table({"spans": pa.array(
        [[{"k": "a", "u": True}], [{"k": "a", "u": None}]],
        pa.list_(item_scalar))})
    _assert_parity(tbl2, schema, n_invalid_min=0)


def test_tuple_field_inside_item_object():
    schema = {"@root": {"spans?": [{
        "k?": "string", "pair?": ["string", "(a|b)", "1..5"]}]}}
    item_t = pa.struct([("k", pa.string()),
                        ("pair", pa.list_(pa.string()))])
    tbl = pa.table({"spans": pa.array(
        [[{"k": "q", "pair": ["x", "a", "3"]}],
         [{"k": "q", "pair": ["x", "c", "3"]}],
         [{"k": "q", "pair": ["x", "a", "9"]}],
         [{"k": "q", "pair": ["x", "a"]}],
         [{"k": "q", "pair": None}],
         [{"k": "q", "pair": ["x", "a", "3"]},
          {"k": "r", "pair": ["x", "b", "0"]}],
         [None],
         None],
        pa.list_(item_t))})
    _assert_parity(tbl, schema)


# -- container-typed map values ----------------------------------------------

MAP_LIST_SCHEMA = {
    "@root": "#D",
    "D": {"props?": {"(k[0-9])": "(a|b)",
                     "tags?": "(t[0-9]){1,3}",
                     "need": "(t[0-9])[2]"}},
}


def map_list_table():
    mt = pa.map_(pa.string(), pa.list_(pa.string()))
    rows = [
        [("tags", ["t1", "t2"]), ("need", ["t1", "t2"])],   # valid
        [("tags", ["t1", "zz"]), ("need", ["t1", "t2"])],   # item fail
        [("tags", ["t1", "t1"]), ("need", ["t1", "t2"])],   # set dup
        [("tags", ["t1", "t2", "t3", "t4"]),
         ("need", ["t1", "t2"])],                           # set bounds
        [("need", ["t1"])],                                 # list length
        [("tags", ["t1"])],                                 # need missing
        [("need", None)],                                   # null required
        [("tags", None), ("need", ["t1", "t2"])],           # null optional ok
        [("k1", ["t1"]), ("need", ["t1", "t2"])],           # regex + list val
        None,
    ]
    return pa.table({"props": pa.array(rows, mt)})


def test_map_container_values_parity():
    _assert_parity(map_list_table(), MAP_LIST_SCHEMA)


def test_map_container_values_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    tbl = map_list_table()
    tv = TableValidator(copy.deepcopy(MAP_LIST_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = []
    for r in tbl.to_pylist():
        d = {}
        if r["props"] is not None:
            d["props"] = {k: v for k, v in r["props"]}
            # null≡absent for optional; keep nulls for required (the
            # row engine treats explicit null per index.js:425)
            d["props"] = {k: v for k, v in d["props"].items()
                          if v is not None or k == "need"}
        docs.append(d)
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(MAP_LIST_SCHEMA),
              "mode": "validate"} for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))


def test_struct_layout_container_props_under_map_schema():
    """The same schema (regex props ⇒ map-object path) over a STRUCT
    layout exercises the nested-list rule family."""
    st = pa.struct([("tags", pa.list_(pa.string())),
                    ("need", pa.list_(pa.string()))])
    rows = [
        {"tags": ["t1"], "need": ["t1", "t2"]},
        {"tags": ["zz"], "need": ["t1", "t2"]},    # item fail
        {"tags": None, "need": ["t1"]},            # length fail
        {"tags": None, "need": None},              # need required
        None,
    ]
    tbl = pa.table({"props": pa.array(rows, st)})
    _assert_parity(tbl, MAP_LIST_SCHEMA)


def test_regex_prop_container_values():
    """Container-typed regex props: map layout (explicit nulls validate
    like required — kind-2 semantics) and struct layout (null fields ≡
    absent), both parity-checked."""
    schema = {"@root": {"props?": {"(k[0-9])": "(t[0-9]){1,3}",
                                   "name?": "string"}}}
    mt = pa.map_(pa.string(), pa.list_(pa.string()))
    rows = [
        [("k1", ["t1", "t2"])],                 # valid
        [("k1", ["t1", "zz"])],                 # item fail
        [("k2", ["t1", "t1"])],                 # dup
        [("k3", ["t1", "t2", "t3", "t4"])],     # bounds
        [("k4", None)],                         # explicit null → fails
        [("zz", ["bad"])],                      # unmatched key → ignored
        None,
    ]
    _assert_parity(pa.table({"props": pa.array(rows, mt)}), schema)

    st = pa.struct([("k1", pa.list_(pa.string())),
                    ("other", pa.list_(pa.string()))])
    rows2 = [
        {"k1": ["t1"], "other": None},
        {"k1": ["zz"], "other": None},          # item fail
        {"k1": ["t1", "t1"], "other": None},    # dup
        {"k1": None, "other": ["anything"]},    # null field ≡ absent
        None,
    ]
    _assert_parity(pa.table({"props": pa.array(rows2, st)}), schema)


def test_doubly_nested_containers():
    """T[a,b][c,d] columns: outer bounds, inner shape/null/dup/bounds/
    items with $.col[i] / $.col[i][j] datapaths — row-engine parity."""
    schema = {"@root": {"v?": "int[1,3][2,]"}}
    tbl = pa.table({"v": pa.array(
        [[[1], [2, 3]],
         [[1]],                    # outer bounds
         [[1, 2, 3, 4], [1]],      # inner bounds
         [None, [1]],              # null outer item
         [[1, None], [2]],         # null inner item (int: passes)
         None],
        pa.list_(pa.list_(pa.int64())))})
    _assert_parity(tbl, schema)

    schema2 = {"@root": {"v?": "(a|b){1,2}[]"}}
    tbl2 = pa.table({"v": pa.array(
        [[["a"], ["a", "a"]],      # dup in inner set
         [["b", "a"]],
         [["zz"]],                 # inner item fail
         []],
        pa.list_(pa.list_(pa.string())))})
    _assert_parity(tbl2, schema2)

    # scalar items under a doubly-nested type: every item fails "value"
    tbl3 = pa.table({"v": pa.array([[1, 2], []],
                                   pa.list_(pa.int64()))})
    _assert_parity(pa.table({"v": tbl3["v"]}), schema)


def test_doubly_nested_vs_reference_oracle():
    import copy

    from .conftest import run_reference

    schema = {"@root": {"v?": "(a|b){1,2}[]"}}
    tbl = pa.table({"v": pa.array(
        [[["a"], ["a", "a"]], [["b", "a"]], [["zz"]], [], [None, ["a"]],
         [[], ["a"]]],
        pa.list_(pa.list_(pa.string())))})
    tv = TableValidator(copy.deepcopy(schema))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    docs = [_doc_of(r) for r in tbl.to_pylist()]
    cases = [{"data": d, "type": "@root",
              "schema": copy.deepcopy(schema), "mode": "validate"}
             for d in docs]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_map_charlen_values():
    """char[n,m] string-length map values (fixed + regex props), both
    layouts."""
    schema = {"@root": {"props?": {"(k[0-9])": "char[2,4]",
                                   "code": "char[3,3]"}}}
    mt = pa.map_(pa.string(), pa.string())
    rows = [
        [("code", "abc"), ("k1", "xy")],
        [("code", "abcd")],               # code length
        [("code", "abc"), ("k2", "xxxxx")],  # regex charlen
        [("code", None)],                 # required null
        [("zz", "whatever"), ("code", "abc")],  # unmatched key ignored
        None,
    ]
    _assert_parity(pa.table({"props": pa.array(rows, mt)}), schema)

    st = pa.struct([("code", pa.string()), ("k1", pa.string())])
    rows2 = [
        {"code": "abc", "k1": "xy"},
        {"code": "ab", "k1": None},       # code length
        {"code": "abc", "k1": "xxxxx"},   # regex field length
        {"code": None, "k1": None},       # required missing
        None,
    ]
    _assert_parity(pa.table({"props": pa.array(rows2, st)}), schema)


def test_tuple_charlen_slots():
    """char[n,m] tuple slots: length violations report 'length' + the
    length; null slot items fail 'value' null (char items are not
    defaulted). Top-level, nested-struct, and item-object tuples."""
    schema = {"@root": {"v?": ["string", "char[2,4]"]}}
    tbl = pa.table({"v": pa.array(
        [["x", "ab"], ["x", "abcde"], ["x", None], [None, "ab"],
         ["x"], None],
        pa.list_(pa.string()))})
    _assert_parity(tbl, schema)

    schema2 = {"@root": {"meta": {"pair?": ["char[1,2]", "(a|b)"]}}}
    meta_t = pa.struct([("pair", pa.list_(pa.string()))])
    tbl2 = pa.table({"meta": pa.array(
        [{"pair": ["x", "a"]}, {"pair": ["xxx", "a"]},
         {"pair": [None, "a"]}, {"pair": None}],
        meta_t)})
    _assert_parity(tbl2, schema2)


def test_union_object_branch_map_layout():
    schema = {"@root": {"v?": [["int", {"a": "1..5", "b?": "string"}]]}}
    mt = pa.map_(pa.string(), pa.int64())
    tbl = pa.table({"v": pa.array(
        [[("a", 2)], [("a", 9)], [("z", 1)], [], [("b", 7)], None], mt)})
    # [("b", 7)]: b names the branch → full validation → a required +
    # b value wrong type
    _assert_parity(tbl, schema)


def test_embedded_sjot_nested_any_field():
    """Embedded @sjot carriers under NESTED any-typed fields are
    interpreted since r4 (the top-level carrier mechanism generalized
    to struct paths) — struct and map layouts."""
    schema = {"@root": {"box?": {"payload?": "any", "n": "0..9"}},
              "Inner": {"x": "1..5"}}
    pt = pa.struct([("@sjot", pa.string()), ("x", pa.int64())])
    bt = pa.struct([("payload", pt), ("n", pa.int64())])
    rows = [
        {"payload": {"@sjot": "#Inner", "x": 3}, "n": 1},
        {"payload": {"@sjot": "#Inner", "x": 9}, "n": 1},   # x range
        {"payload": {"@sjot": None, "x": 9}, "n": 1},       # no carrier
        {"payload": None, "n": 1},
        {"payload": {"@sjot": "#Inner", "x": 3}, "n": 50},  # n fails
        None,
    ]
    _assert_parity(pa.table({"box": pa.array(rows, bt)}), schema)

    mp = pa.map_(pa.string(), pa.string())
    bt2 = pa.struct([("payload", mp), ("n", pa.int64())])
    schema2 = {"@root": {"box?": {"payload?": "any", "n": "0..9"}},
               "S": {"k": "(on|off)"}}
    rows2 = [
        {"payload": [("@sjot", "#S"), ("k", "on")], "n": 1},
        {"payload": [("@sjot", "#S"), ("k", "zz")], "n": 1},  # k enum
        {"payload": [("other", "1")], "n": 1},                # no carrier
        None,
    ]
    _assert_parity(pa.table({"box": pa.array(rows2, bt2)}), schema2)


def test_item_object_default_injection():
    """The reference mutates ARRAY ITEM objects during validation
    (defaults injected, index.js:246-251 → 429-433); normalize_batch
    mirrors that for list<struct> items at root, nested and ref-form
    positions (r4; offsets + null masks preserved)."""
    import copy

    it = pa.list_(pa.struct([("a", pa.int64()), ("b", pa.int64())]))
    schema = {"@root": {"items?": [{"a?7": "0..9", "b": "0..9"}]}}
    tv = TableValidator(copy.deepcopy(schema))
    out = tv.normalize_batch(pa.table(
        {"items": pa.array([[{"a": None, "b": 1}], None, [],
                            [{"a": 2, "b": 3}]], it)}))
    assert out["items"].to_pylist() == [
        [{"a": 7, "b": 1}], None, [], [{"a": 2, "b": 3}]]
    # row-engine parity on the same doc
    doc = {"items": [{"b": 1}]}
    validate(doc, None, copy.deepcopy(schema))
    assert doc == {"items": [{"b": 1, "a": 7}]}

    schema2 = {"@root": {"box?": {"items?": [{"a?7": "0..9",
                                              "b": "0..9"}]}}}
    bt = pa.struct([("items", it)])
    tv2 = TableValidator(copy.deepcopy(schema2))
    out2 = tv2.normalize_batch(pa.table(
        {"box": pa.array([{"items": [{"a": None, "b": 2}]}, None], bt)}))
    assert out2["box"].to_pylist() == [
        {"items": [{"a": 7, "b": 2}]}, None]

    schema3 = {"@root": {"items?": "#T[]"},
               "T": {"a?7": "0..9", "b": "0..9"}}
    tv3 = TableValidator(copy.deepcopy(schema3))
    out3 = tv3.normalize_batch(pa.table(
        {"items": pa.array([[{"a": None, "b": 3}]], it)}))
    assert out3["items"].to_pylist() == [[{"a": 7, "b": 3}]]


@pytest.mark.parametrize("seed", range(30))
def test_normalize_parity_fuzz(seed):
    """Normalized-output parity with the row engine on VALID rows:
    random schemas over scalars-with-defaults, nested structs and
    list<struct> items. (The reference normalizes by mutating the doc
    during validation; invalid rows stop at the first error and are
    excluded.)"""
    import copy

    rng = np.random.default_rng(41000 + seed)
    nested = rng.random() < 0.4
    inner = {"a?7": "0..9", "b?": "0..9", "c?": "0..9{1,3}"}
    if nested:
        schema = {"@root": {"box?": {"items?": [dict(inner)],
                                     "s?5": "1..9"}}}
    else:
        schema = {"@root": {"items?": [dict(inner)], "s?5": "1..9"}}
    it = pa.list_(pa.struct([("a", pa.int64()), ("b", pa.int64()),
                             ("c", pa.list_(pa.int64()))]))

    def item(r):
        return {"a": int(r.integers(0, 10)) if r.random() < 0.5 else None,
                "b": int(r.integers(0, 10)) if r.random() < 0.5 else None,
                "c": sorted({int(r.integers(0, 10))
                             for _ in range(int(r.integers(1, 4)))},
                            key=str)
                if r.random() < 0.6 else None}

    def items_cell(r):
        if r.random() < 0.2:
            return None
        return [item(r) for _ in range(int(r.integers(0, 3)))]

    n = 40
    icells = [items_cell(rng) for _ in range(n)]
    scells = [int(rng.integers(1, 10)) if rng.random() < 0.5 else None
              for _ in range(n)]
    if nested:
        bt = pa.struct([("items", it), ("s", pa.int64())])
        tbl = pa.table({"box": pa.array(
            [{"items": i, "s": s} if rng.random() < 0.9 else None
             for i, s in zip(icells, scells)], bt)})
    else:
        tbl = pa.table({"items": pa.array(icells, it),
                        "s": pa.array(scells, pa.int64())})
    tv = TableValidator(copy.deepcopy(schema))
    verdicts, _, _ = tv.validate_batch(tbl)
    out = tv.normalize_batch(tbl)
    for i in range(n):
        if not verdicts[i]:
            continue
        doc = _doc_of(tbl.slice(i, 1).to_pylist()[0])
        validate(doc, None, copy.deepcopy(schema))
        got = _doc_of(out.slice(i, 1).to_pylist()[0])
        assert got == doc, (i, got, doc, schema)


def test_embedded_sjot_map_value_and_item_field():
    """@sjot carriers in MAP-layout prop values (any-typed ⇒ map_owner
    catch-all) and in any-typed ITEM-OBJECT fields (rebased carrier
    rule) are interpreted — both were silent false-passes before r4
    (node-oracle verified invalid)."""
    import copy

    schema = {"@root": {"m?": {"k": "any"}}, "I": {"x": "1..5"}}
    mv = pa.map_(pa.string(),
                 pa.struct([("@sjot", pa.string()), ("x", pa.int64())]))
    rows = [[("k", {"@sjot": "#I", "x": 9})],
            [("k", {"@sjot": "#I", "x": 3})],
            [("k", {"@sjot": None, "x": 9})]]
    tv = TableValidator(copy.deepcopy(schema))
    cv, _, _ = tv.validate_batch(pa.table({"m": pa.array(rows, mv)}))
    assert [bool(x) for x in cv] == [False, True, True]

    schema2 = {"@root": {"items?": [{"p?": "any", "n": "0..9"}]},
               "I": {"x": "1..5"}}
    it = pa.list_(pa.struct([
        ("p", pa.struct([("@sjot", pa.string()), ("x", pa.int64())])),
        ("n", pa.int64())]))
    rows2 = [[{"p": {"@sjot": "#I", "x": 9}, "n": 1}],
             [{"p": {"@sjot": "#I", "x": 3}, "n": 1}],
             [{"p": None, "n": 1}],
             [{"p": {"@sjot": "#I", "x": 3}, "n": 50}]]
    tv2 = TableValidator(copy.deepcopy(schema2))
    cv2, _, _ = tv2.validate_batch(
        pa.table({"items": pa.array(rows2, it)}))
    assert [bool(x) for x in cv2] == [False, True, True, False]

    # any[] ITEMS stay uninterpreted — the reference only re-enters
    # @sjot when the VALUE POSITION's type is "any", not per item of
    # "any[]" (node-oracle verified valid)
    schema3 = {"@root": {"lst?": "any[]"}, "I": {"x": "1..5"}}
    it3 = pa.list_(pa.struct([("@sjot", pa.string()), ("x", pa.int64())]))
    tv3 = TableValidator(copy.deepcopy(schema3))
    cv3, _, _ = tv3.validate_batch(
        pa.table({"lst": pa.array([[{"@sjot": "#I", "x": 9}]], it3)}))
    assert [bool(x) for x in cv3] == [True]
