"""Regression suite for MAP-TYPED Arrow positions below the top level —
the r4 divergence family: object types whose Arrow layout at a NESTED
position (struct field depth ≥ 2, list items) is ``map<string, …>``
were invisible to the struct-field rule machinery. Symptoms before the
fix: nested regex props over a map field silently false-PASSED, nested
fixed-prop objects and item objects over map layouts false-FAILED valid
rows with "should be present". All such positions now route through
row-engine catch-all rules (struct-field rules gated inert), matching
the reference exactly. Top-level map columns and item-object map fields
always had vectorized machinery — also pinned here."""

from __future__ import annotations

import copy

import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import TableValidator

from .test_columnar_nested import _assert_parity, _doc_of


def test_nested_regex_over_map_field_regression():
    """r4 catch: struct<inner: map<string,int>> with a regex prop used
    to silently PASS rows the reference rejects."""
    schema = {"@root": {"box": {"inner": {"(k_.*)": "string"}}}}
    mp = pa.map_(pa.string(), pa.int64())
    tbl = pa.table({"box": pa.array([
        {"inner": [("k_bad", 5)]},       # regex value fails "string"
        {"inner": [("other", 5)]},       # unmatched key → valid
        {"inner": None},                 # inner missing
    ], pa.struct([("inner", mp)]))})
    tv = _assert_parity(tbl, schema)
    _, viols, _ = tv.validate_batch(tbl)
    assert viols[0]["datapath"] == "$.box.inner.k_bad"


def test_nested_fixed_obj_over_map_field_regression():
    """r4 catch: struct<sub: map<string,string>> against a fixed-prop
    object false-FAILED valid rows ("a should be present")."""
    schema = {"@root": {"box": {"sub": {"a": "string", "b?": "0..5"}}}}
    mp = pa.map_(pa.string(), pa.string())
    tbl = pa.table({"box": pa.array([
        {"sub": [("a", "ok")]},              # VALID (was false-FAIL)
        {"sub": [("a", None)]},              # explicit null required
        {"sub": [("zz", "x")]},              # a missing
        {"sub": [("a", "ok"), ("b", "9")]},  # b out of range
        {"sub": None},                       # sub missing
    ], pa.struct([("sub", mp)]))})
    _assert_parity(tbl, schema)
    # EMPTY map cell checked directly (the to_pylist parity helper
    # cannot tell [] from an empty list — suite convention): an empty
    # object is missing its required prop, exact reference semantics.
    empty = pa.table({"box": pa.array([{"sub": []}],
                                      pa.struct([("sub", mp)]))})
    import copy as _copy
    tv = TableValidator(_copy.deepcopy(schema))
    ok, viols, _ = tv.validate_batch(empty)
    assert not ok[0]
    assert viols[0]["datapath"] == "$.box.sub.a"
    assert viols[0]["what"] == "should be present"


def test_map_in_middle_of_path_covers_subtree():
    """A map at an intermediate level: the catch-all at ITS level owns
    everything below (deeper props validate via the row engine)."""
    schema = {"@root":
              {"box": {"sub": {"deep": {"q": "0..9"}}}}}
    mp = pa.map_(pa.string(), pa.struct([("q", pa.int64())]))
    tbl = pa.table({"box": pa.array([
        {"sub": [("deep", {"q": 3})]},
        {"sub": [("deep", {"q": 99})]},      # deep range fail
        {"sub": [("deep", None)]},           # null required value
    ], pa.struct([("sub", mp)]))})
    _assert_parity(tbl, schema)


def test_item_objects_over_list_of_maps_regression():
    """r4 catch: list<map<string,string>> against an item-object type —
    a VALID map item used to false-FAIL "should be present"."""
    schema = {"@root": {"lst": [{"a": "string", "(k_.*)": "0..9"}]}}
    mp = pa.list_(pa.map_(pa.string(), pa.string()))
    tbl = pa.table({"lst": pa.array([
        [[("a", "ok")]],                          # VALID (was false-FAIL)
        [[("a", "ok"), ("k_z", "notnum")]],       # regex value fail
        [[("zz", "x")]],                          # a missing
        [[("a", "ok")], [("a", "ok"), ("k_b", "5")]],  # item 1 fails
        [[("a", "ok")], None, [("zz", "q")]],     # null item first
    ], mp)})
    tv = _assert_parity(tbl, schema)
    _, viols, _ = tv.validate_batch(tbl)
    by_row = {v["row_idx"]: v for v in viols}
    assert by_row[3]["datapath"] == "$.lst[1].k_b"
    assert by_row[4]["datapath"] == "$.lst[1]"    # null item wins over
    #                                               the later bad map


def test_item_object_propsets_over_map_items():
    """Propsets/@dep for map items come from the row-engine catch-all;
    struct items keep the vectorized presence path."""
    schema = {"@root": {"lst": [{"x?": "0..", "y?": "0..",
                                 "@one": [["x", "y"]]}]}}
    mp = pa.list_(pa.map_(pa.string(), pa.int64()))
    tbl = pa.table({"lst": pa.array([
        [[("x", 1)]],              # valid
        [[("x", 1), ("y", 2)]],    # @one: both present
        [[("z", 3)]],              # @one: neither present
    ], mp)})
    _assert_parity(tbl, schema)


def test_top_level_map_layout_still_vectorized():
    """The always-working top-level map machinery is unchanged."""
    schema = {"@root": {"box": {"a": "string", "b?": "0..5"}}}
    mp = pa.map_(pa.string(), pa.string())
    tbl = pa.table({"box": pa.array([
        [("a", "ok")],
        [("a", "ok"), ("b", "9")],
        [("zz", "x")],
    ], mp)})
    _assert_parity(tbl, schema)


@pytest.mark.parametrize("seed", range(30))
def test_map_target_fuzz_matches_row_engine(seed):
    """Randomized differential over the divergence family: random
    object schemas (fixed + optional + regex props, scalar value types)
    landing on map layouts at depth 2 or as list items."""
    import numpy as np

    from sjot_ray.core import SJOTValidationError, validate

    from .test_columnar_fuzz import SCALARS

    rng = np.random.default_rng(9700 + seed)
    # char-length value types on regex props in nested structs are a
    # documented compile-time row-engine fallback — keep this fuzz on
    # the compiling subset so every seed exercises the columnar path
    pool = [s for s in SCALARS if not s[0].startswith("char")]
    vt, at, sam = pool[int(rng.integers(0, len(pool)))]
    obj = {"a": vt} if rng.random() < 0.5 else {"a?": vt}
    if rng.random() < 0.5:
        obj["(k_.*)"] = vt
    as_items = rng.random() < 0.5
    if as_items:
        schema = {"@root": {"col": [dict(obj)]}}
        atype = pa.list_(pa.map_(pa.string(), at))
    else:
        schema = {"@root": {"col": {"sub": dict(obj)}}}
        atype = pa.struct([("sub", pa.map_(pa.string(), at))])
    keys_pool = ["a", "k_x", "zz"]
    n_rows = 40

    def map_cell(r):
        ks = list(r.choice(keys_pool,
                           size=int(r.integers(1, 4)), replace=False))
        return [(str(k), None if r.random() < 0.12 else sam(r))
                for k in ks]

    cells = []
    for _ in range(n_rows):
        if as_items:
            cells.append([map_cell(rng)
                          for _ in range(int(rng.integers(1, 3)))])
        else:
            cells.append({"sub": map_cell(rng)})
    tbl = pa.table({"col": pa.array(cells, atype)})

    tv = TableValidator(copy.deepcopy(schema))
    col_verdict, col_v, _ = tv.validate_batch(tbl)
    col_v = {v["row_idx"]: v for v in col_v}
    mism = []
    for i, row in enumerate(tbl.to_pylist()):
        doc = _doc_of(row)
        try:
            validate(copy.deepcopy(doc), None, copy.deepcopy(schema))
            ok, rv = True, None
        except SJOTValidationError as e:
            ok, rv = False, e.violation_row()
        if bool(col_verdict[i]) != ok:
            mism.append((i, doc, ok, col_v.get(i)))
            continue
        if not ok:
            cv = col_v[i]
            for k in ("datapath", "typepath", "what", "value_repr"):
                if cv[k] != rv[k]:
                    mism.append((i, doc, k, cv[k], rv[k]))
    assert not mism, (vt, as_items, mism[:5])
