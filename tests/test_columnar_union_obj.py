"""Columnar coverage for union OBJECT-branch dispatch: @if/@then
discriminators, multiple prop-dispatched object branches, and the
wildcard/empty object slot — differential against the row engine
(itself reference-verified) and the node reference oracle. Reference:
/root/reference/index.js:1919-1987 (dispatch build), :878-900 (runtime)."""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import (ColumnarCompileError,
                                               TableValidator)

from .test_columnar_nested import _assert_parity, _doc_of

# -- @if/@then discriminated union (struct layout) ---------------------------

IFTHEN_SCHEMA = {
    "@root": "#D",
    "D": {
        "id": "0..",
        "u": [[
            {"@if": "kind", "@then": {"kind": "(image)", "w": "1..100"}},
            {"@if": "kind2", "@then": {"kind2": "(audio)", "dur": "0.0.."}},
            "0..9",
        ]],
    },
}


def ifthen_table():
    u_t = pa.struct([("kind", pa.string()), ("kind2", pa.string()),
                     ("w", pa.int64()), ("dur", pa.float64())])
    rows = [
        {"kind": "image", "kind2": None, "w": 50, "dur": None},   # ok br 1
        {"kind": "image", "kind2": None, "w": 500, "dur": None},  # w range
        {"kind": None, "kind2": "audio", "w": None, "dur": 1.5},  # ok br 2
        {"kind": None, "kind2": "audio", "w": None, "dur": -1.0},  # dur
        {"kind": "video", "kind2": None, "w": 5, "dur": None},    # no match
        {"kind": "video", "kind2": "audio", "w": None, "dur": 2.0},  # br 2
        {"kind": None, "kind2": None, "w": 9, "dur": None},       # no match
        None,                                                     # absent u
    ]
    return pa.table({
        "id": pa.array(list(range(1, len(rows) + 1)), pa.int64()),
        "u": pa.array(rows, u_t),
    })


def test_ifthen_struct_parity():
    _assert_parity(ifthen_table(), IFTHEN_SCHEMA)


def test_ifthen_vs_reference_oracle():
    from .conftest import run_reference

    tbl = ifthen_table()
    tv = TableValidator(copy.deepcopy(IFTHEN_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(IFTHEN_SCHEMA),
              "mode": "validate"} for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (i, ref["error"], v)


def test_ifthen_scalar_rows_still_dispatch():
    """Scalar cells in the same union dispatch through the scalar kernel
    — an int payload validates against the 0..9 branch."""
    schema = copy.deepcopy(IFTHEN_SCHEMA)
    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "u": pa.array([5, 50], pa.int64())})
    _assert_parity(tbl, schema)


# -- multi-branch prop-name dispatch (struct layout) -------------------------

MULTI_SCHEMA = {
    "@root": "#D",
    "D": {
        "u": [[
            {"circle": "1..", "color?": "(red|blue)"},
            {"square?": "1..", "side": "1..100"},
            "string",
        ]],
    },
}


def multi_table():
    u_t = pa.struct([("circle", pa.int64()), ("color", pa.string()),
                     ("square", pa.int64()), ("side", pa.int64())])
    rows = [
        {"circle": 5, "color": "red", "square": None, "side": None},  # b1 ok
        {"circle": 0, "color": None, "square": None, "side": None},   # b1 rng
        {"circle": None, "color": None, "square": 2, "side": 7},      # b2 ok
        {"circle": None, "color": None, "square": 2, "side": None},   # b2 req
        {"circle": None, "color": None, "square": None, "side": 5},   # b2 ok
        {"circle": 5, "color": None, "square": 1, "side": 1},  # first=b1 ok
        {"circle": None, "color": "red", "square": None, "side": None},
        # ^ color names b1 → side of b1? no: b1 has no side; color alone ok?
        # b1 requires circle → fails "should be present"
        {"circle": None, "color": None, "square": None, "side": None},
        # ^ no prop names a branch → union "value" error
        None,
    ]
    return pa.table({"u": pa.array(rows, u_t)})


def test_multi_branch_struct_parity():
    _assert_parity(multi_table(), MULTI_SCHEMA)


def test_multi_branch_vs_reference_oracle():
    from .conftest import run_reference

    tbl = multi_table()
    tv = TableValidator(copy.deepcopy(MULTI_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(MULTI_SCHEMA),
              "mode": "validate"} for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))


# -- wildcard / empty-object slots -------------------------------------------

def test_object_wildcard_branch():
    """An 'object' branch claims every object row (slots.o), so any
    struct payload is accepted as-is."""
    schema = {"@root": "#D", "D": {"u": [["object", "0..9"]]}}
    u_t = pa.struct([("anything", pa.string())])
    tbl = pa.table({"u": pa.array(
        [{"anything": "x"}, {"anything": None}, None], u_t)})
    _assert_parity(tbl, schema, n_invalid_min=0)


def test_all_optional_object_branch():
    """A dict branch with only optional props lands in slots.o (the
    reference's 'empty' case): every object row validates against it."""
    schema = {"@root": "#D",
              "D": {"u": [[{"a?": "0..9", "b?": "(x|y)"}, "string"]]}}
    u_t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    tbl = pa.table({"u": pa.array(
        [{"a": 5, "b": "x"}, {"a": 50, "b": None},
         {"a": None, "b": "z"}, {"a": None, "b": None}, None], u_t)})
    _assert_parity(tbl, schema)


def test_object_slot_wins_over_ifthen():
    """slots.o set → @if triples are unreachable (runtime returns the o
    branch for every object row, core/validator.py:1041-1044)."""
    schema = {"@root": "#D",
              "D": {"u": [[
                  {"@if": "k", "@then": {"k": "(a)", "v": "0..9"}},
                  "object",
              ]]}}
    u_t = pa.struct([("k", pa.string()), ("v", pa.int64())])
    tbl = pa.table({"u": pa.array(
        [{"k": "a", "v": 500}, {"k": "zz", "v": 1}], u_t)})
    _assert_parity(tbl, schema, n_invalid_min=0)


# -- map layouts --------------------------------------------------------------

def test_ifthen_map_layout_parity():
    m = pa.map_(pa.string(), pa.string())
    schema = {"@root": "#D",
              "D": {"u": [[
                  {"@if": "kind", "@then": {"kind": "(image)",
                                            "w?": "(big|small)"}},
                  {"@if": "fmt", "@then": {"fmt": "(audio)",
                                           "codec": "(pcm|ogg)"}},
                  "0..9",
              ]]}}
    rows = [
        [("kind", "image"), ("w", "big")],            # br1 ok
        [("kind", "image"), ("w", "huge")],           # br1 w enum
        [("fmt", "audio"), ("codec", "pcm")],         # br2 ok
        [("fmt", "audio")],                           # br2 codec required
        [("kind", "video")],                          # no branch
        [("zz", "1")],                                # no branch
        [],                                           # no branch (empty)
        None,
    ]
    tbl = pa.table({"u": pa.array(rows, m)})
    _assert_parity(tbl, schema)


def test_multi_branch_map_layout_parity():
    m = pa.map_(pa.string(), pa.int64())
    schema = {"@root": "#D",
              "D": {"u": [[
                  {"circle": "1.."},
                  {"side": "1..100", "pad?": "0..9"},
              ]]}}
    rows = [
        [("circle", 5)],                  # b1 ok
        [("circle", 0)],                  # b1 range
        [("side", 7), ("pad", 3)],        # b2 ok
        [("pad", 3), ("side", 700)],      # first entry pad names b2 → side range
        [("other", 1)],                   # no branch
        [],
        None,
    ]
    tbl = pa.table({"u": pa.array(rows, m)})
    _assert_parity(tbl, schema)


# -- rich branch shapes (compiled since r4: regex/non-scalar props) ----------

def test_regex_prop_object_branch_compiles_struct():
    """A branch with regex props now compiles; struct-layout payloads
    validate via the embedded sub's per-batch field discovery."""
    schema = {"@root": "#D",
              "D": {"u": [[{"k": "0..9", "(z.)": "(on|off)"}, "string"]]}}
    u_t = pa.struct([("k", pa.int64()), ("za", pa.string()),
                     ("other", pa.string())])
    rows = [
        {"k": 5, "za": "on", "other": None},    # ok
        {"k": 5, "za": "MAYBE", "other": None},  # regex prop value fails
        {"k": 50, "za": "on", "other": None},   # k range
        {"k": None, "za": "on", "other": None},  # k required
        None,
    ]
    _assert_parity(pa.table({"u": pa.array(rows, u_t)}), schema)


def test_nested_prop_object_branch_compiles_struct():
    schema = {"@root": "#D",
              "D": {"u": [[{"k": {"nested": "0..9"}}, "string"]]}}
    u_t = pa.struct([("k", pa.struct([("nested", pa.int64())]))])
    rows = [
        {"k": {"nested": 5}},
        {"k": {"nested": 50}},
        {"k": None},
        None,
    ]
    _assert_parity(pa.table({"u": pa.array(rows, u_t)}), schema)


def test_charlen_container_props_object_branch():
    schema = {"@root": "#D",
              "D": {"u": [[
                  {"tag": "char[2,3]", "pts?": "0..9[1,2]"},
                  {"side": "1..100"},
              ]]}}
    u_t = pa.struct([("tag", pa.string()),
                     ("pts", pa.list_(pa.int64())),
                     ("side", pa.int64())])
    rows = [
        {"tag": "ab", "pts": [1, 2], "side": None},     # b1 ok
        {"tag": "toolong", "pts": None, "side": None},  # b1 length
        {"tag": "ab", "pts": [1, 50], "side": None},    # b1 item range
        {"tag": "ab", "pts": [], "side": None},         # b1 bounds
        {"tag": None, "pts": None, "side": 7},          # b2 ok
        {"tag": None, "pts": None, "side": 700},        # b2 range
        None,
    ]
    _assert_parity(pa.table({"u": pa.array(rows, u_t)}), schema)


def test_propset_object_branch():
    schema = {"@root": "#D",
              "D": {"u": [[
                  {"@if": "m", "@then": {"m": "(x)", "a?": "0..9",
                                         "b?": "0..9",
                                         "@one": [["a", "b"]]}},
                  "string",
              ]]}}
    u_t = pa.struct([("m", pa.string()), ("a", pa.int64()),
                     ("b", pa.int64())])
    rows = [
        {"m": "x", "a": 5, "b": None},   # ok
        {"m": "x", "a": 5, "b": 3},      # @one fails
        {"m": "x", "a": None, "b": None},  # @one fails
        None,
    ]
    _assert_parity(pa.table({"u": pa.array(rows, u_t)}), schema)


def test_rich_object_branch_map_layout():
    """Complex branch over a MAP-layout payload: the embedded sub's
    map_owner catch-all owns these rows (row-engine exactness)."""
    m = pa.map_(pa.string(), pa.string())
    # a regex-prop branch claims the whole object slot (slots.o), so it
    # must be the only dict branch in the union
    schema = {"@root": "#D",
              "D": {"u": [[
                  {"tag": "char[2,3]", "(z.)": "(on|off)"},
                  "0..9",
              ]]}}
    rows = [
        [("tag", "ab"), ("za", "on")],       # ok
        [("tag", "toolong")],                # length
        [("tag", "ab"), ("zq", "MAYBE")],    # regex prop fails
        [("nobody", "1")],                   # tag required
        None,
    ]
    _assert_parity(pa.table({"u": pa.array(rows, m)}), schema)


def test_rich_branch_vs_reference_oracle():
    from .conftest import run_reference

    schema = {"@root": "#D",
              "D": {"u": [[
                  {"k": "0..9", "side": {"w": "1..9"},
                   "pad?": "char[1,2]"},
                  "string",
              ]]}}
    u_t = pa.struct([("k", pa.int64()), ("pad", pa.string()),
                     ("side", pa.struct([("w", pa.int64())]))])
    rows = [
        {"k": 5, "pad": "a", "side": {"w": 3}},
        {"k": 5, "pad": "toolong", "side": {"w": 3}},
        {"k": 5, "pad": None, "side": {"w": 30}},
        {"k": 5, "pad": None, "side": None},
        {"k": 50, "pad": None, "side": {"w": 3}},
        None,
    ]
    tbl = pa.table({"u": pa.array(rows, u_t)})
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


# -- fuzz ---------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(120))
def test_union_obj_fuzz_matches_row_engine(seed):
    """Randomized discriminated/multi-branch object unions over struct
    and map layouts: verdict parity with the row engine on every row,
    first-violation field parity on failing rows."""
    from sjot_ray.core import SJOTValidationError, validate

    rng = np.random.default_rng(9000 + seed)
    use_if = rng.random() < 0.5
    use_map = rng.random() < 0.35
    n_br = int(rng.integers(1, 3))
    branches, fields = [], []
    if use_if:
        kinds = ["alpha", "beta"]
        for bi in range(n_br):
            disc = f"d{bi}"
            branches.append({"@if": disc,
                             "@then": {disc: f"({kinds[bi]})",
                                       f"v{bi}": "0..50"}})
            fields += [(disc, pa.string()), (f"v{bi}", pa.int64())]
    else:
        for bi in range(n_br):
            req = f"p{bi}"
            branches.append({req: "1..50",
                             f"q{bi}?": "(on|off)"})
            fields += [(req, pa.int64()), (f"q{bi}", pa.string())]
    # [[t]] with ONE branch is a nested-array type, not a union
    # (core/validator.py:is_union) — always keep ≥2 branches
    if n_br == 1 or rng.random() < 0.5:
        branches.append("0..9")
    schema = {"@root": {"u?": [branches]}}

    def cell(r):
        if r.random() < 0.12:
            return None
        out = {}
        if use_if:
            for bi in range(n_br):
                if r.random() < 0.55:
                    out[f"d{bi}"] = str(r.choice(
                        ["alpha", "beta", "gamma"]))
                if r.random() < 0.5:
                    out[f"v{bi}"] = int(r.integers(-5, 60))
        else:
            for bi in range(n_br):
                if r.random() < 0.55:
                    out[f"p{bi}"] = int(r.integers(-2, 60))
                if r.random() < 0.4:
                    out[f"q{bi}"] = str(r.choice(["on", "off", "zz"]))
        return out

    values = [cell(rng) for _ in range(120)]
    if use_map:
        at = pa.map_(pa.string(), pa.string())
        vals2 = [None if v is None
                 else [(k, str(x)) for k, x in v.items()]
                 for v in values]
        # map values are strings → numeric types in branches would
        # shape-mismatch; rewrite branches to string types
        if use_if:
            for b in branches:
                if isinstance(b, dict):
                    t = b["@then"]
                    for k in list(t):
                        if t[k] == "0..50":
                            t[k] = "(s[0-9])"
            for i, v in enumerate(vals2):
                if v is not None:
                    vals2[i] = [(k, f"s{int(rng.integers(0, 12))}"
                                 if k.startswith("v") else x)
                                for k, x in v]
        else:
            for b in branches:
                if isinstance(b, dict):
                    for k in list(b):
                        if b[k] == "1..50":
                            b[k] = "(n[0-9])"
            for i, v in enumerate(vals2):
                if v is not None:
                    vals2[i] = [(k, f"n{int(rng.integers(0, 12))}"
                                 if k.startswith("p") else x)
                                for k, x in v]
        tbl = pa.table({"u": pa.array(vals2, at)})
    else:
        at = pa.struct(fields)
        tbl = pa.table({"u": pa.array(values, at)})

    try:
        tv = TableValidator(copy.deepcopy(schema))
    except ColumnarCompileError:
        pytest.skip("outside columnar surface")
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
    assert not mism, (schema, mism[:5])


@pytest.mark.parametrize("seed", range(60))
def test_rich_branch_fuzz_matches_row_engine(seed):
    """Randomized object branches with char-length / container / nested
    / regex props (the r4 relaxation surface): verdict parity with the
    row engine over struct layouts; regex-prop branches (slots.o) are
    kept the only dict branch, per the union distinctness rules."""
    from sjot_ray.core import valid as row_valid_fn

    rng = np.random.default_rng(23000 + seed)
    use_regex = rng.random() < 0.3
    kinds = rng.choice(["charlen", "container", "nested", "scalar"],
                       size=2, replace=True)
    props: dict = {"k": "0..9"}
    fields = [("k", pa.int64())]
    for i, kd in enumerate(kinds):
        nm = f"p{i}" + ("?" if rng.random() < 0.5 else "")
        if kd == "charlen":
            props[nm] = "char[2,4]"
            fields.append((f"p{i}", pa.string()))
        elif kd == "container":
            props[nm] = "0..9[1,2]"
            fields.append((f"p{i}", pa.list_(pa.int64())))
        elif kd == "nested":
            props[nm] = {"x": "0..9"}
            fields.append((f"p{i}", pa.struct([("x", pa.int64())])))
        else:
            props[nm] = "(aa|bb)"
            fields.append((f"p{i}", pa.string()))
    if use_regex:
        props["(z.)"] = "(on|off)"
        fields.append(("za", pa.string()))
    branches = [props, "string"]
    schema = {"@root": {"u?": [branches]}}
    u_t = pa.struct(fields)

    def cell(r):
        if r.random() < 0.12:
            return None
        out = {}
        if r.random() < 0.8:
            out["k"] = int(r.integers(-2, 12))
        for i, kd in enumerate(kinds):
            if r.random() < 0.35:
                continue
            if kd == "charlen":
                out[f"p{i}"] = "a" * int(r.integers(0, 6))
            elif kd == "container":
                out[f"p{i}"] = [int(r.integers(-2, 12))
                                for _ in range(int(r.integers(0, 4)))]
            elif kd == "nested":
                out[f"p{i}"] = {"x": int(r.integers(-2, 12))}
            else:
                out[f"p{i}"] = str(r.choice(["aa", "bb", "zz"]))
        if use_regex and r.random() < 0.5:
            out["za"] = str(r.choice(["on", "off", "zz"]))
        return out

    rows = [cell(rng) for _ in range(80)]
    tbl = pa.table({"u": pa.array(rows, u_t)})
    tv = TableValidator(copy.deepcopy(schema))
    cv, _, _ = tv.validate_batch(tbl)
    for r, got in zip(tbl.to_pylist(), cv):
        doc = _doc_of(r)
        want = row_valid_fn(doc, None, copy.deepcopy(schema))
        assert bool(got) == want, (doc, bool(got), want, schema)


def test_scalar_never_reaches_container_branch_duality():
    """The reference dispatches a scalar datum to its DEPTH-1 kind slot
    before trying branches (core/validator.py:1032-1039); container
    branches register at depth >= 2, so a float must NOT pass
    ["boolean", "0..100[]"] via the scalar-vs-array range duality
    (marathon-caught r4 regression-in-waiting; node-oracle verified
    invalid)."""
    schema = {"@root": {"v": [["boolean", "(a|bb|ccc)", "0..100[]",
                               "(a|bb|ccc){2,4}"]]}}
    tv = TableValidator(copy.deepcopy(schema))
    cv, _, _ = tv.validate_batch(
        pa.table({"v": pa.array([1.0, 2.5], pa.float64())}))
    assert [bool(x) for x in cv] == [False, False]
    # kinds WITH a depth-1 slot still try-each
    cv2, _, _ = tv.validate_batch(
        pa.table({"v": pa.array(["a", "x"], pa.string())}))
    assert [bool(x) for x in cv2] == [True, False]
    cv3, _, _ = tv.validate_batch(
        pa.table({"v": pa.array([True], pa.bool_())}))
    assert [bool(x) for x in cv3] == [True]
