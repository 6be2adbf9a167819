"""Per-position row-engine degradation: a type the vectorized
compilers reject no longer falls the WHOLE schema back to the row
engine — the position's rules roll back and ONE generic dyn rule
validates that column/field through the row engine, while every other
column stays columnar. Covers the shapes that used to be whole-schema
fallbacks: triply-nested containers, doubly-nested containers in
structs, union object branches on nested payloads, non-scalar map
value types, exotic item-field types."""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import TableValidator
from sjot_ray.core import SJOTValidationError, validate

from .test_columnar_nested import _assert_parity, _doc_of


def test_triply_nested_container_top_level():
    schema = {"@root": {"v?": "0..9[][][]", "k": "0..9"}}
    t3 = pa.list_(pa.list_(pa.list_(pa.int64())))
    tbl = pa.table({
        "v": pa.array([[[[1]]], [[[50]]], [[[]]], [], None], t3),
        "k": pa.array([1, 2, 3, 50, 5], pa.int64()),
    })
    _assert_parity(tbl, schema)


def test_doubly_nested_container_in_struct():
    schema = {"@root": {"meta?": {"grid": "0..9[][]", "n?": "0..9"}}}
    mt = pa.struct([("grid", pa.list_(pa.list_(pa.int64()))),
                    ("n", pa.int64())])
    rows = [{"grid": [[1]], "n": 1}, {"grid": [[50]], "n": 1},
            {"grid": [], "n": 50}, {"grid": None, "n": 1}, None]
    _assert_parity(pa.table({"meta": pa.array(rows, mt)}), schema)


def test_degraded_column_keeps_siblings_columnar():
    """The degraded position is ONE rule; sibling columns compile to
    vectorized rules (measurable: the validator has > 2 rules and the
    sibling's violation is reported with its usual rule family)."""
    schema = {"@root": {"v?": "0..9[][][]", "k": "(aa|bb)"}}
    tv = TableValidator(copy.deepcopy(schema))
    tbl = pa.table({
        "v": pa.array([None, None],
                      pa.list_(pa.list_(pa.list_(pa.int64())))),
        "k": pa.array(["aa", "zz"], pa.string()),
    })
    verdict, viols, _ = tv.validate_batch(tbl)
    assert list(map(bool, verdict)) == [True, False]
    assert viols[0]["datapath"] == "$.k"


def test_degraded_rule_major_ordering():
    """First-error-wins ordering holds across degraded and vectorized
    positions: a failing earlier prop beats the degraded later one and
    vice versa (prop declaration order)."""
    schema = {"@root": {"a?": "0..9", "deep?": "0..9[][][]",
                        "z?": "0..9"}}
    t3 = pa.list_(pa.list_(pa.list_(pa.int64())))
    tbl = pa.table({
        "a": pa.array([50, 1, 50], pa.int64()),
        "deep": pa.array([[[[50]]], [[[50]]], None], t3),
        "z": pa.array([1, 1, 50], pa.int64()),
    })
    tv = TableValidator(copy.deepcopy(schema))
    verdict, viols, _ = tv.validate_batch(tbl)
    vm = {v["row_idx"]: v for v in viols}
    assert vm[0]["datapath"] == "$.a"          # a before deep
    assert vm[1]["datapath"].startswith("$.deep")  # deep before z
    assert vm[2]["datapath"] == "$.a"          # a before z


def test_map_layout_parent_stays_owned_by_catchall():
    """A degraded position under a MAP-layout parent must stay inert —
    the parent's map catch-all owns those rows."""
    schema = {"@root": {"box?": {"grid": "0..9[][]"}}}
    m = pa.map_(pa.string(), pa.list_(pa.list_(pa.int64())))
    rows = [[("grid", [[1]])], [("grid", [[50]])], None]
    _assert_parity(pa.table({"box": pa.array(rows, m)}), schema)


def test_degraded_vs_reference_oracle():
    from .conftest import run_reference

    schema = {"@root": {"v?": "0..9[][]", "k": "0..9"}}
    t2 = pa.list_(pa.list_(pa.int64()))
    tbl = pa.table({
        "v": pa.array([[[1]], [[50]], [[]], None], t2),
        "k": pa.array([1, 2, 3, 50], pa.int64()),
    })
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
def test_degrade_fuzz_matches_row_engine(seed):
    """Randomized schemas mixing one exotic (degraded) position with
    vectorized siblings: verdict + first-violation parity with the row
    engine on every row."""
    rng = np.random.default_rng(31000 + seed)
    exotic_kind = rng.choice(["deep2", "deep3", "union_obj"])
    nested = rng.random() < 0.5
    if exotic_kind == "deep2":
        ex_t, ex_at = "0..9[][]", pa.list_(pa.list_(pa.int64()))
    elif exotic_kind == "deep3":
        ex_t, ex_at = "0..9[][][]", pa.list_(
            pa.list_(pa.list_(pa.int64())))
    else:
        ex_t = [["int", {"a": "0..9"}]]
        ex_at = pa.struct([("a", pa.int64())])
    sib = "(aa|bb)" if rng.random() < 0.5 else "0..9"
    sib_at = pa.string() if sib == "(aa|bb)" else pa.int64()

    def ex_cell(r):
        if r.random() < 0.2:
            return None
        if exotic_kind == "deep2":
            return [[int(r.integers(-2, 12))
                     for _ in range(int(r.integers(0, 3)))]
                    for _ in range(int(r.integers(0, 3)))]
        if exotic_kind == "deep3":
            return [[[int(r.integers(-2, 12))]]
                    for _ in range(int(r.integers(0, 2)))]
        return {"a": int(r.integers(-2, 12))} \
            if r.random() < 0.8 else {"a": None}

    def sib_cell(r):
        if r.random() < 0.2:
            return None
        if sib == "(aa|bb)":
            return str(r.choice(["aa", "bb", "zz"]))
        return int(r.integers(-2, 12))

    n = 60
    ex_vals = [ex_cell(rng) for _ in range(n)]
    sib_vals = [sib_cell(rng) for _ in range(n)]
    if nested:
        schema = {"@root": {"box?": {"ex?": ex_t, "s?": sib}}}
        bt = pa.struct([("ex", ex_at), ("s", sib_at)])
        tbl = pa.table({"box": pa.array(
            [{"ex": e, "s": s} for e, s in zip(ex_vals, sib_vals)], bt)})
    else:
        schema = {"@root": {"ex?": ex_t, "s?": sib}}
        tbl = pa.table({"ex": pa.array(ex_vals, ex_at),
                        "s": pa.array(sib_vals, sib_at)})
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


def test_root_regex_and_union_mix_degradations():
    """The last whole-schema fallbacks are non-object roots: unions
    mixing container/object/tuple branches and deep map value types
    all compile, degrading only their own position."""
    # union with object + container branches
    schema = {"@root": {"u?": [["0..9[]", {"a": "0..9"}]]}}
    st = pa.struct([("a", pa.int64())])
    _assert_parity(pa.table(
        {"u": pa.array([{"a": 5}, {"a": 50}, None], st)}), schema)
    _assert_parity(pa.table(
        {"u": pa.array([[1], [50], None], pa.list_(pa.int64()))}),
        schema)
    # union with a tuple branch (NB the reference's union array
    # dispatch accepts these arrays — node-oracle verified; parity is
    # the assertion, not invalidity)
    schema2 = {"@root": {"u?": [["string", ["0..9", "10..99"]]]}}
    _assert_parity(pa.table(
        {"u": pa.array([[1, 20], [1, 5], [1]], pa.list_(pa.int64()))}),
        schema2, n_invalid_min=0)
    # deep object map values
    schema3 = {"@root": {"m?": {"(k.)": {"x": "0..9[][]"}}}}
    mt = pa.map_(pa.string(),
                 pa.struct([("x", pa.list_(pa.list_(pa.int64())))]))
    rows = [[("ka", {"x": [[1]]})], [("kb", {"x": [[50]]})], None]
    _assert_parity(pa.table({"m": pa.array(rows, mt)}), schema3)


def test_only_nonobject_roots_fall_back():
    from sjot_ray.columnar.table_validator import ColumnarCompileError

    for root in ("any", "string", "0..9[]"):
        with pytest.raises(ColumnarCompileError):
            TableValidator({"@root": root})
