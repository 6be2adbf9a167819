"""Container-typed tuple slots (``["int", "string[1,3]"]`` over
list<list<…>> columns) — top-level, nested-struct, and item-object
positions: differential against the row engine and the node reference
oracle. Reference semantics: index.js:240-254 (tuples; null items
default to null for array types, :1195) and the array validator's
set-dup → bounds → first-item order, plus the scalar-vs-array type
duality (a non-array value range-scans the container type string)."""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import (ColumnarCompileError,
                                               TableValidator)
from sjot_ray.core import SJOTValidationError, validate

from .test_columnar_nested import _assert_parity, _doc_of

TUPLE_SCHEMA = {"@root": {"t?": ["0..9[1,2]", "10..99{1,3}"]}}
LL = pa.list_(pa.list_(pa.int64()))


def tuple_rows():
    return [
        [[1, 2], [10, 20]],        # ok
        [[1], [10, 10]],           # set dup in slot 1
        [[1, 50], [10]],           # item range slot 0
        [[], [10]],                # bounds slot 0
        [[1], [10, 20, 30, 40]],   # bounds slot 1
        [None, [10]],              # null item slot 0 → "value" null
        [[1]],                     # wrong tuple length
        None,
    ]


def test_container_slots_top_level_parity():
    tbl = pa.table({"t": pa.array(tuple_rows(), LL)})
    _assert_parity(tbl, TUPLE_SCHEMA)


def test_container_slots_vs_reference_oracle():
    from .conftest import run_reference

    tbl = pa.table({"t": pa.array(tuple_rows(), LL)})
    tv = TableValidator(copy.deepcopy(TUPLE_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(TUPLE_SCHEMA), "mode": "validate"}
             for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (i, ref["error"], v)


def test_container_slots_nested_struct():
    schema = {"@root": {"meta?": {"pair": ["0..9[1,2]", "10..99{1,3}"]}}}
    mt = pa.struct([("pair", LL)])
    rows = [
        {"pair": [[1, 2], [10]]},
        {"pair": [[1], [10, 10]]},
        {"pair": [[1, 50], [10]]},
        {"pair": [None, [10]]},
        {"pair": [[1]]},
        {"pair": None},
        None,
    ]
    _assert_parity(pa.table({"meta": pa.array(rows, mt)}), schema)


def test_container_slots_in_item_objects():
    schema = {"@root": {"items?": [{"pair": ["0..9[1,2]",
                                             "10..99{1,2}"]}]}}
    it_t = pa.list_(pa.struct([("pair", LL)]))
    rows = [
        [{"pair": [[1], [10]]}],
        [{"pair": [[1, 50], [10]]}],
        [{"pair": [[1], [10, 10]]}],
        [{"pair": [[1], [10]]}, {"pair": [[], [10]]}],
        None,
    ]
    _assert_parity(pa.table({"items": pa.array(rows, it_t)}), schema)


def test_scalar_payload_type_duality():
    """Non-array items against container slots range-scan the container
    type string (reference number branch): 1 vs "0..9[]" PASSES, 50
    fails 'is not an array'."""
    schema = {"@root": {"t?": ["0..9[]", "0..9[]"]}}
    lt = pa.list_(pa.int64())
    rows = [[1, 2], [50, 2], [1, 50], [None, 2], [1]]
    _assert_parity(pa.table({"t": pa.array(rows, lt)}), schema)


def test_charlen_item_container_slot():
    """char[n,m] ITEM types inside a container slot report "length"
    with the offending length."""
    schema = {"@root": {"t?": ["char[2,3]{1,2}", "0..9[]"]}}
    lls = pa.list_(pa.list_(pa.string()))
    rows = [
        [["ab"], []],
        [["abcdef"], []],
        [["ab", "ab"], []],       # set dup
        [["ab", "cd", "ef"], []],  # bounds
        None,
    ]
    # slot 1 "0..9[]" over list<string> items: duality applies per item
    _assert_parity(pa.table({"t": pa.array(rows, lls)}), schema)


def test_object_typed_tuple_slots():
    """Object slot types route through the row-engine slot rule —
    full object semantics with exact datapaths."""
    schema = {"@root": {"t?": [{"x": "0..9"},
                               {"x?": "0..9", "y?": "string"}]}}
    lt = pa.list_(pa.struct([("x", pa.int64()), ("y", pa.string())]))
    rows = [
        [{"x": 5, "y": None}, {"x": 1, "y": "a"}],
        [{"x": 50, "y": None}, {"x": 1, "y": None}],
        [{"x": None, "y": None}, {"x": 1, "y": None}],  # x required
        [{"x": 5, "y": None}, {"x": 50, "y": None}],    # x range slot 1
        [None, {"x": 1, "y": None}],                    # null item
        [{"x": 5, "y": None}],                          # wrong length
        None,
    ]
    _assert_parity(pa.table({"t": pa.array(rows, lt)}), schema)


def test_union_typed_tuple_slots():
    schema = {"@root": {"t?": [[["0..9", "string"]],
                               [["0..9", "string"]]]}}
    lt = pa.list_(pa.int64())
    rows = [[1, 2], [50, 2], [None, 1], None]
    _assert_parity(pa.table({"t": pa.array(rows, lt)}), schema)


def test_doubly_nested_container_tuple_slots():
    """Doubly-nested container slot types also compile now (row-engine
    slot rule instead of a whole-schema fallback)."""
    schema = {"@root": {"t?": ["0..9[][]", "0..9[][]"]}}
    lt = pa.list_(pa.list_(pa.list_(pa.int64())))
    rows = [[[[1]], [[2]]], [[[50]], [[2]]], [None, [[2]]], None]
    _assert_parity(pa.table({"t": pa.array(rows, lt)}), schema)


def test_object_slots_nested_struct_position():
    schema = {"@root": {"meta?": {"pair": [{"x": "0..9"},
                                           {"x": "0..9"}]}}}
    mt = pa.struct([("pair", pa.list_(pa.struct([("x", pa.int64())])))])
    rows = [{"pair": [{"x": 1}, {"x": 2}]},
            {"pair": [{"x": 1}, {"x": 50}]},
            {"pair": None}, None]
    _assert_parity(pa.table({"meta": pa.array(rows, mt)}), schema)


def test_object_slots_vs_reference_oracle():
    from .conftest import run_reference

    schema = {"@root": {"t?": [{"x": "0..9"}, {"x": "0..9"}]}}
    lt = pa.list_(pa.struct([("x", pa.int64())]))
    rows = [[{"x": 1}, {"x": 2}], [{"x": 1}, {"x": 50}],
            [{"x": None}, {"x": 2}], [None, {"x": 2}], None]
    tbl = pa.table({"t": pa.array(rows, lt)})
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


@pytest.mark.parametrize("seed", range(50))
def test_container_slot_fuzz_matches_row_engine(seed):
    """Randomized 2-slot container tuples over list<list<int>> at
    top level or nested in a struct: verdict + first-violation parity
    with the row engine."""
    rng = np.random.default_rng(29000 + seed)
    def slot(r):
        lo, hi = 0, int(r.integers(5, 60))
        kind = "{}" if r.random() < 0.4 else "[]"
        if r.random() < 0.6:
            b = f"{int(r.integers(0, 2))},{int(r.integers(2, 4))}"
        else:
            b = ""
        return f"{lo}..{hi}{kind[0]}{b}{kind[1]}"
    t = [slot(rng), slot(rng)]
    nested = rng.random() < 0.4
    schema = {"@root": {"meta?": {"pair": t}}} if nested \
        else {"@root": {"pair?": t}}

    def cell(r):
        if r.random() < 0.1:
            return None
        ln = int(r.integers(0, 4))
        out = []
        for _ in range(ln):
            if r.random() < 0.1:
                out.append(None)
            else:
                out.append([int(r.integers(-5, 70))
                            for _ in range(int(r.integers(0, 4)))])
        return out

    cells = [cell(rng) for _ in range(80)]
    if nested:
        mt = pa.struct([("pair", LL)])
        tbl = pa.table({"meta": pa.array(
            [{"pair": c} if c is not None or rng.random() < 0.5
             else None for c in cells], mt)})
    else:
        tbl = pa.table({"pair": pa.array(cells, LL)})
    tv = TableValidator(copy.deepcopy(schema))
    cv, viols, _ = tv.validate_batch(tbl)
    vm = {v["row_idx"]: v for v in viols}
    for i, row in enumerate(tbl.to_pylist()):
        doc = _doc_of(row)
        try:
            validate(copy.deepcopy(doc), None, copy.deepcopy(schema))
            want, werr = True, None
        except SJOTValidationError as e:
            want, werr = False, e.violation_row()
        assert bool(cv[i]) == want, (i, doc, want, schema)
        if not want:
            g = vm[i]
            assert (g["datapath"], g["what"], g["value_repr"]) == (
                werr["datapath"], werr["what"], werr["value_repr"]), (
                i, doc, g, werr, schema)
