"""Columnar coverage for ROOT-LEVEL regex property names: a typed
table's document properties are its columns, so pattern props match
COLUMN NAMES per batch (reference /root/reference/index.js:388-405; row
engine kind-2 entries core/validator.py:967-975). Differential against
the row engine (itself reference-verified) and the node oracle."""

from __future__ import annotations

import copy

import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import (ColumnarCompileError,
                                               TableValidator)

from .test_columnar_nested import _assert_parity, _doc_of

ROOT_REGEX_SCHEMA = {
    "@root": "#Doc",
    "Doc": {
        "id": "0..",
        "(x_[a-z]+)": "0..100",
        "(tag_.*)": "(red|blue)",
    },
}


def root_regex_table():
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "x_alpha": pa.array([5, 500, 5, None, 101, None], pa.int64()),
        "x_beta": pa.array([None, None, -1, None, -2, None], pa.int64()),
        "tag_color": pa.array(
            ["red", None, None, "green", "green", None], pa.string()),
    })


def test_root_regex_scalar_parity():
    _assert_parity(root_regex_table(), ROOT_REGEX_SCHEMA)


def test_root_regex_vs_reference_oracle():
    from .conftest import run_reference

    tbl = root_regex_table()
    tv = TableValidator(copy.deepcopy(ROOT_REGEX_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(ROOT_REGEX_SCHEMA),
              "mode": "validate"} for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_root_regex_charlen_parity():
    schema = {"@root": "#D", "D": {"id": "0..", "(c_.*)": "char[2,4]"}}
    tbl = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "c_a": pa.array(["ab", "toolong", None], pa.string()),
        "c_b": pa.array(["xy", "ok", "z"], pa.string()),
    })
    _assert_parity(tbl, schema)


def test_root_regex_container_parity():
    schema = {"@root": "#D",
              "D": {"id": "0..",
                    "(l_.*)": "(on|off)[1,3]",
                    "(s_.*)": "string{1,}"}}
    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "l_modes": pa.array(
            [["on"], ["on", "bad"], [], ["on", "off", "on", "off"], None],
            pa.list_(pa.string())),
        "s_tags": pa.array(
            [["a"], ["a", "a"], ["b"], None, ["c"]],
            pa.list_(pa.string())),
    })
    _assert_parity(tbl, schema)


def test_root_regex_matches_literal_prop_too():
    """The reference's regex pass re-validates data props already matched
    by literal props when the name also matches the pattern."""
    schema = {"@root": "#D", "D": {"kx?": "string", "(k.)": "(a|b)"}}
    tbl = pa.table({"kx": pa.array(["a", "zzz"], pa.string())})
    _assert_parity(tbl, schema)


def test_root_regex_first_error_order():
    """Schema dict order decides which violation wins when a fixed prop
    and a regex prop both fail on one row."""
    schema = {"@root": "#D", "D": {"id": "0..9", "(x_.*)": "0..9"}}
    tbl = pa.table({"id": pa.array([50], pa.int64()),
                    "x_a": pa.array([99], pa.int64())})
    tv = _assert_parity(tbl, schema)
    _, viols, _ = tv.validate_batch(tbl)
    assert viols[0]["datapath"] == "$.id"


@pytest.mark.parametrize("seed", range(60))
def test_root_regex_fuzz_matches_row_engine(seed):
    """Randomized differential for root regex props: random value-type
    class (plain scalar / char-length / list / set), 1–3 matching columns
    plus decoy columns, mixed valid/invalid/null cells — verdicts AND
    first-violation fields must match the row engine."""
    import numpy as np

    from sjot_ray.core import SJOTValidationError, validate

    from .test_columnar_fuzz import SCALARS

    rng = np.random.default_rng(7000 + seed)
    base_i = int(rng.integers(0, len(SCALARS)))
    base, bat, bsam = SCALARS[base_i]
    roll = rng.random()
    if roll < 0.4:                       # plain scalar / char-length value
        vt, at, sam = base, bat, bsam
    else:                                # container value
        suffix = str(rng.choice(["[]", "[1,3]", "{2,4}", "{}"]))
        if base.startswith("char"):      # char[2,4]{} is a set of strings
            base, bat, bsam = SCALARS[1]
        vt, at = f"{base}{suffix}", pa.list_(bat)

        def sam(r, bsam=bsam):
            if r.random() < 0.15:
                return None
            return [bsam(r) for _ in range(int(r.integers(0, 5)))]

    schema = {"@root": {"id?": "0..", "(x_[a-z]+)": vt}}
    n_match = int(rng.integers(1, 4))
    n_rows = 60
    cols = {"id": pa.array(
        [int(rng.integers(0, 9)) for _ in range(n_rows)], pa.int64())}
    names = ["x_aa", "x_bb", "x_cc"][:n_match]
    for nm in names:
        cols[nm] = pa.array([sam(rng) for _ in range(n_rows)], at)
    if rng.random() < 0.5:               # decoy column the pattern skips
        cols["other1"] = pa.array(
            [str(rng.choice(["p", "q"])) for _ in range(n_rows)],
            pa.string())
    tbl = pa.table(cols)

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
    assert not mism, (vt, mism[:5])


def test_root_regex_object_type_falls_back():
    """Object-typed root regex props stay on the row engine — a
    compile-time fallback, never a worker raise."""
    schema = {"@root": "#D", "D": {"(k.)": {"v": "int"}}}
    with pytest.raises(ColumnarCompileError):
        TableValidator(copy.deepcopy(schema))


def test_root_regex_extras_column_excluded():
    """The unknown-key capture column is @final's surface, not a data
    prop: a catch-all pattern must not validate it."""
    schema = {"@root": "#D", "D": {"@final": True, "(.*)": "string"}}
    tbl = pa.table({
        "note": pa.array(["ok", "fine"], pa.string()),
        "_extras": pa.array([None, ["bogus"]], pa.list_(pa.string())),
    })
    tv = TableValidator(copy.deepcopy(schema), extras_column="_extras")
    verdict, viols, _ = tv.validate_batch(tbl)
    # without the exclusion, the catch-all would flag _extras itself
    # (list column vs "string") on row 1 with what="value"
    assert bool(verdict[0]) is True
    assert bool(verdict[1]) is False        # extra prop via capture column
    assert viols[0]["what"] == "additional property should not be present"
