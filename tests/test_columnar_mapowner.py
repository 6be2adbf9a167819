"""Depth-1 MAP-layout ownership: an object type beyond the vectorized
map companions (scalar prop values + @final) routes map-layout rows
through the row-engine catch-all, with every struct-path rule gated
inert on map targets. Before this gate, propsets/@dep false-FAILED and
char-length/container/nested/union/tuple prop values false-PASSED
map-layout rows at depth 1 (caught in r4). Reference semantics:
/root/reference/index.js:407-460 (object validation), :429-433
(propset presence)."""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import TableValidator
from sjot_ray.core import valid

from .test_columnar_nested import _assert_parity, _doc_of


def _check_map_parity(schema, rows, map_type, extra_cols=None):
    """Verdict parity with the (reference-verified) row engine over a
    depth-1 map column, plus first-violation parity via _assert_parity's
    full machinery."""
    cols = {"u": pa.array(rows, map_type)}
    if extra_cols:
        cols.update(extra_cols)
    _assert_parity(pa.table(cols), schema, n_invalid_min=0)


MI = pa.map_(pa.string(), pa.int64())
MS = pa.map_(pa.string(), pa.string())


def test_propset_one_over_map_column():
    # pre-fix: @one false-FAILED map rows where exactly one prop present
    schema = {"@root": {"u?": {"a?": "0..9", "b?": "0..9",
                               "@one": [["a", "b"]]}}}
    rows = [[("a", 5)], [("b", 3)], [("a", 1), ("b", 2)], None,
            [("a", 50)]]
    _check_map_parity(schema, rows, MI)


def test_propset_any_all_over_map_column():
    schema = {"@root": {"u?": {"a?": "0..9", "b?": "0..9", "c?": "0..9",
                               "@any": [["a", "b"]], "@all": [["b", "c"]]}}}
    rows = [[("a", 5)], [("b", 3), ("c", 1)], [("c", 2)],
            [("a", 1), ("b", 2), ("c", 3)]]
    _check_map_parity(schema, rows, MI)


def test_dep_over_map_column():
    # pre-fix: @dep false-PASSED map rows missing the dependency
    schema = {"@root": {"u?": {"a?": "0..9", "b?": "0..9",
                               "@dep": {"a": "b"}}}}
    rows = [[("a", 5)], [("a", 1), ("b", 2)], [("b", 3)]]
    _check_map_parity(schema, rows, MI)


def test_nested_object_value_over_map_column():
    # pre-fix: nested prop values under a map column were never checked
    m = pa.map_(pa.string(), pa.struct([("x", pa.int64())]))
    schema = {"@root": {"u?": {"inner": {"x": "0..9"}}}}
    rows = [[("inner", {"x": 5})], [("inner", {"x": 50})],
            [("inner", None)]]
    _check_map_parity(schema, rows, m)


def test_container_value_over_map_column():
    m = pa.map_(pa.string(), pa.list_(pa.int64()))
    schema = {"@root": {"u?": {"pts": "0..9[1,3]"}}}
    rows = [[("pts", [1, 2])], [("pts", [1, 50])], [("pts", [])],
            [("pts", [1, 2, 3, 4])]]
    _check_map_parity(schema, rows, m)


def test_charlen_value_over_map_column():
    schema = {"@root": {"u?": {"s": "char[2,3]"}}}
    rows = [[("s", "ab")], [("s", "abcdef")], [("s", "")]]
    _check_map_parity(schema, rows, MS)


def test_union_value_over_map_column():
    schema = {"@root": {"u?": {"v": [["(on|off)", "char[5,9]"]]}}}
    rows = [[("v", "on")], [("v", "maybe-not")], [("v", "zz")]]
    _check_map_parity(schema, rows, MS)


def test_tuple_value_over_map_column():
    m = pa.map_(pa.string(), pa.list_(pa.int64()))
    schema = {"@root": {"u?": {"pair": ["0..9", "0..99"]}}}
    rows = [[("pair", [1, 20])], [("pair", [1])], [("pair", [50, 2])]]
    _check_map_parity(schema, rows, m)


def test_simple_object_keeps_vectorized_map_path():
    """Scalar props + @final stay on the vectorized companions — the
    classifier must NOT route them to the per-row engine."""
    tv = TableValidator({"@root": {"u": {"a": "(x|y)", "b?": "string",
                                         "@final": True}}})
    assert not tv._obj_needs_map_rowengine(
        {"a": "(x|y)", "b?": "string", "@final": True}, "#")
    assert tv._obj_needs_map_rowengine({"(p.)": "string"}, "#")
    assert tv._obj_needs_map_rowengine({"a?": "0..9",
                                        "@one": [["a"]]}, "#")
    assert tv._obj_needs_map_rowengine({"a": "char[2,3]"}, "#")


def test_struct_layout_unaffected_by_map_owner():
    """The same complex object over a STRUCT layout still uses the
    vectorized struct rules (parity + the catch-all stays inert)."""
    schema = {"@root": {"u?": {"a?": "0..9", "b?": "0..9",
                               "@one": [["a", "b"]]}}}
    st = pa.struct([("a", pa.int64()), ("b", pa.int64())])
    rows = [{"a": 5, "b": None}, {"a": None, "b": 3},
            {"a": 1, "b": 2}, {"a": None, "b": None}, None]
    _assert_parity(pa.table({"u": pa.array(rows, st)}), schema,
                   n_invalid_min=1)


def test_mapowner_vs_reference_oracle():
    from .conftest import run_reference

    schema = {"@root": {"u?": {"a?": "0..9", "s": "char[2,3]",
                               "@dep": {"a": "s"}}}}
    rows = [[("a", "5"), ("s", "ab")], [("s", "toolong")],
            [("a", "3")], [("s", "ok")]]
    m = pa.map_(pa.string(), pa.string())
    tbl = pa.table({"u": pa.array(rows, m)})
    tv = TableValidator(copy.deepcopy(schema))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(schema), "mode": "validate"}
             for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (i, ref["error"], v)


@pytest.mark.parametrize("seed", range(40))
def test_mapowner_fuzz_matches_row_engine(seed):
    """Randomized complex objects (propsets, char-length, containers,
    nested dicts) over depth-1 map columns: verdict parity with the row
    engine on every row."""
    rng = np.random.default_rng(17000 + seed)
    props: dict = {}
    kinds = rng.choice(["charlen", "container", "nested", "scalar"],
                       size=2, replace=True)
    for i, k in enumerate(kinds):
        name = f"p{i}" + ("?" if rng.random() < 0.5 else "")
        if k == "charlen":
            props[name] = "char[2,4]"
        elif k == "container":
            props[name] = "0..9[1,2]"
        elif k == "nested":
            props[name] = {"x": "0..9"}
        else:
            props[name] = "(aa|bb)"
    if rng.random() < 0.5:
        names = [p.split("?")[0] for p in props]
        props["@one" if rng.random() < 0.5 else "@any"] = [names]
    schema = {"@root": {"u?": props}}

    has_nested = any(isinstance(v, dict) for v in props.values())
    has_cont = any(isinstance(v, str) and v.endswith("]")
                   and not v.startswith("char") for v in props.values())
    if has_nested:
        vt = pa.struct([("x", pa.int64())])
    elif has_cont:
        vt = pa.list_(pa.int64())
    else:
        vt = pa.string()
    m = pa.map_(pa.string(), vt)

    def cell(r):
        if r.random() < 0.15:
            return None
        out = []
        for p in props:
            if p.startswith("@"):
                continue
            if r.random() < 0.35:
                continue
            base = p.split("?")[0]
            v = props[p]
            if isinstance(v, dict):
                out.append((base, {"x": int(r.integers(-2, 12))}))
            elif v.endswith("]") and not v.startswith("char"):
                out.append((base, [int(r.integers(-2, 12))
                                   for _ in range(int(r.integers(0, 4)))]))
            elif v.startswith("char"):
                out.append((base, "a" * int(r.integers(0, 6))))
            else:
                out.append((base, str(r.choice(["aa", "bb", "zz"]))))
        return out or None

    rows = [cell(rng) for _ in range(60)]
    # mixed value kinds can't share one Arrow map type: keep only cells
    # whose values fit vt
    def fits(c):
        if c is None:
            return True
        for _k, v in c:
            if isinstance(vt, pa.StructType) and not isinstance(v, dict):
                return False
            if pa.types.is_list(vt) and not isinstance(v, list):
                return False
            if pa.types.is_string(vt) and not isinstance(v, str):
                return False
        return True
    rows = [c for c in rows if fits(c)]
    tbl = pa.table({"u": pa.array(rows, m)})
    tv = TableValidator(copy.deepcopy(schema))
    cv, _, _ = tv.validate_batch(tbl)
    for r, got in zip(tbl.to_pylist(), cv):
        doc = _doc_of(r)
        want = valid(doc, None, copy.deepcopy(schema))
        assert bool(got) == want, (doc, bool(got), want, schema)


def test_empty_map_cell_is_empty_object():
    """An EMPTY map cell means {} — valid against all-optional objects,
    invalid when a required prop exists (the parity helper cannot
    express this: as_py() renders {} and [] identically)."""
    rows = [[("a", 5)], []]
    tbl = pa.table({"u": pa.array(rows, MI)})

    tv = TableValidator({"@root": {"u?": {"a?": "0..9",
                                          "@any": [["a"]]}}})
    cv, _, _ = tv.validate_batch(tbl)
    assert bool(cv[0]) is True
    # {} fails @any (no member of the set present)
    assert bool(cv[1]) is valid({"u": {}}, None,
                                {"@root": {"u?": {"a?": "0..9",
                                                  "@any": [["a"]]}}})

    tv2 = TableValidator({"@root": {"u?": {"s": "char[2,3]",
                                           "a?": "0..9"}}})
    cv2, viols2, _ = tv2.validate_batch(tbl)
    assert bool(cv2[1]) is False  # required s missing from {}
    v = {x["row_idx"]: x for x in viols2}[1]
    assert v["what"] == "should be present"
