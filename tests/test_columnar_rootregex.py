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


def test_root_regex_exotic_value_types_degrade():
    """Union / tuple / doubly-nested root regex value types compile
    since r4: matching columns validate per row through the row engine
    (first-failing-column-wins) — no whole-schema fallback. Deep
    object value types likewise degrade inside the embedded sub."""
    from .test_columnar_nested import _assert_parity

    schema = {"@root": "#D",
              "D": {"(k.)": [["0..9", "(aa|bb)"]], "id": "0.."}}
    tbl = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "ka": pa.array([5, 50, None, 5], pa.int64()),
        "kb": pa.array(["aa", "aa", "zz", None], pa.string()),
    })
    _assert_parity(tbl, schema, n_invalid_min=1)

    deep2 = {"@root": "#D", "D": {"(g.)": "0..9[][]", "id": "0.."}}
    t2 = pa.list_(pa.list_(pa.int64()))
    tbl2 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                     "ga": pa.array([[[1]], [[50]], None], t2)})
    _assert_parity(tbl2, deep2, n_invalid_min=1)

    tup = {"@root": "#D", "D": {"(t.)": ["0..9", "10..99"], "id": "0.."}}
    tbl3 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                     "ta": pa.array([[1, 20], [1, 5], [1]],
                                    pa.list_(pa.int64()))})
    _assert_parity(tbl3, tup, n_invalid_min=1)

    deep = {"@root": "#D",
            "D": {"(k.)": {"v": [["string[]", {"a": "0..9"}]]}}}
    TableValidator(copy.deepcopy(deep))  # compiles since r4
    ka = pa.struct([("v", pa.list_(pa.string()))])
    tbl4 = pa.table({"ka": pa.array(
        [{"v": ["x"]}, {"v": None}, None], ka)})
    _assert_parity(tbl4, deep, n_invalid_min=1)


# -- object value types ------------------------------------------------------

OBJ_VALUE_SCHEMA = {
    "@root": "#D",
    "D": {"id": "0..",
          "(cfg_[a-z]+)": {"a": "number", "b?": "(x|y)"}},
}


def obj_value_table():
    st = pa.struct([("a", pa.float64()), ("b", pa.string())])
    return pa.table({
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "cfg_one": pa.array([
            {"a": 1.0, "b": "x"},     # valid
            {"a": 2.0, "b": "zzz"},   # b fails enum
            None,                     # absent → nothing to check
            {"b": "x"},               # required a missing
            {"a": 4.0},               # valid (optional b absent)
            {"a": 5.0, "b": "y"},     # valid
        ], type=st),
        "cfg_two": pa.array([
            None, None, {"a": 9.0}, None, {"a": -1.0, "b": "q"}, None,
        ], type=st),
        "other": pa.array(["skip"] * 6, pa.string()),
    })


def test_root_regex_obj_struct_parity():
    _assert_parity(obj_value_table(), OBJ_VALUE_SCHEMA)


def test_root_regex_obj_vs_reference_oracle():
    from .conftest import run_reference

    tbl = obj_value_table()
    tv = TableValidator(copy.deepcopy(OBJ_VALUE_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(OBJ_VALUE_SCHEMA),
              "mode": "validate"} for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_root_regex_obj_scalar_and_list_layouts():
    """Shape mismatches: a scalar or list column matched by an
    object-valued pattern routes through the row engine (exact verdicts
    and violation fields; nulls stay absent)."""
    schema = {"@root": "#D", "D": {"(k_.*)": {"a": "number"}}}
    tbl = pa.table({
        "k_s": pa.array(["oops", None], pa.string()),
        "k_l": pa.array([None, [1, 2]], pa.list_(pa.int64())),
    })
    _assert_parity(tbl, schema)


def test_root_regex_obj_map_layout():
    """Map-layout matched columns (map<string, …> cells as dynamic
    objects) take the row-engine path — required/optional/enum checks
    per entry."""
    schema = {"@root": "#D",
              "D": {"id": "0..", "(m_.*)": {"a": "number", "b?": "0..5"}}}
    tbl = pa.table({
        "id": pa.array([0, 1, 2, 3], pa.int64()),
        "m_cfg": pa.array([
            [("a", 1.0)],                 # valid
            [("a", 1.0), ("b", 99.0)],    # b out of range
            [("b", 1.0)],                 # a missing
            None,                         # absent
        ], pa.map_(pa.string(), pa.float64())),
    })
    _assert_parity(tbl, schema)


def test_root_regex_obj_nested_and_final():
    """Nested object inside the matched object + runtime @final against
    the struct's physical fields."""
    schema = {"@root": "#D",
              "D": {"(n_.*)": {"@final": True, "p": "string",
                               "sub?": {"q": "0..9"}}}}
    st = pa.struct([("p", pa.string()),
                    ("sub", pa.struct([("q", pa.int64())])),
                    ("zz", pa.string())])
    tbl = pa.table({"n_x": pa.array([
        {"p": "ok", "sub": {"q": 3}},
        {"p": "ok", "sub": {"q": 99}},      # nested range fail
        {"p": "ok", "zz": "extra"},         # @final extra field
        {"sub": {"q": 1}},                  # p missing
        None,
    ], type=st)})
    _assert_parity(tbl, schema)


def test_root_regex_obj_first_column_wins():
    """Two matched struct columns failing on one row: column order
    decides, like every other root-regex value class."""
    schema = {"@root": "#D", "D": {"(c_.*)": {"a": "number"}}}
    st = pa.struct([("a", pa.string())])
    tbl = pa.table({
        "c_one": pa.array([{"a": "bad1"}], type=st),
        "c_two": pa.array([{"a": "bad2"}], type=st),
    })
    tv = _assert_parity(tbl, schema)
    _, viols, _ = tv.validate_batch(tbl)
    assert viols[0]["datapath"] == "$.c_one.a"


def test_root_regex_obj_normalization():
    """Optional-with-default props inside matched struct columns are
    injected by normalize_batch (nested defaults, null mask kept)."""
    schema = {"@root": "#D", "D": {"(d_.*)": {"a": "number",
                                              "b?7": "number"}}}
    st = pa.struct([("a", pa.float64()), ("b", pa.float64())])
    tbl = pa.table({"d_x": pa.array(
        [{"a": 1.0}, {"a": 2.0, "b": 3.0}, None], type=st)})
    tv = TableValidator(copy.deepcopy(schema))
    out = tv.normalize_batch(tbl)
    cells = out["d_x"].to_pylist()
    assert cells[0] == {"a": 1.0, "b": 7.0}
    assert cells[1] == {"a": 2.0, "b": 3.0}
    assert cells[2] is None


@pytest.mark.parametrize("seed", range(40))
def test_root_regex_obj_fuzz_matches_row_engine(seed):
    """Randomized differential for OBJECT-valued root regex props:
    random scalar prop types, required/optional mix, 1–2 matched struct
    columns with per-row nulls, occasional scalar decoy column also
    matching the pattern (shape-mismatch path)."""
    import numpy as np

    from sjot_ray.core import SJOTValidationError, validate

    from .test_columnar_fuzz import SCALARS

    rng = np.random.default_rng(8100 + seed)
    n_props = int(rng.integers(1, 4))
    obj, fields, samplers = {}, [], {}
    for pi in range(n_props):
        vt, at, sam = SCALARS[int(rng.integers(0, len(SCALARS)))]
        pname = f"p{pi}"
        obj[pname if rng.random() < 0.6 else f"{pname}?"] = vt
        fields.append((pname, at))
        samplers[pname] = sam
    schema = {"@root": {"id?": "0..", "(x_[a-z]+)": obj}}
    st = pa.struct(fields)
    n_rows = 50
    cols = {"id": pa.array(
        [int(rng.integers(0, 9)) for _ in range(n_rows)], pa.int64())}
    for nm in ["x_aa", "x_bb"][:int(rng.integers(1, 3))]:
        vals = []
        for _ in range(n_rows):
            if rng.random() < 0.2:
                vals.append(None)
            else:
                vals.append({p: samplers[p](rng) for p, _ in fields
                             if rng.random() < 0.8})
        cols[nm] = pa.array(vals, type=st)
    if rng.random() < 0.3:               # shape-mismatch decoy
        cols["x_zz"] = pa.array(
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
    assert not mism, (obj, mism[:5])


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
