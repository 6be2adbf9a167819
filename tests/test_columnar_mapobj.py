"""Columnar coverage for OBJECT-TYPED map/regex-prop values: an object
whose (regex or fixed) property values are themselves objects, over
Arrow ``map<string, struct>`` columns (dynamic keyed sub-objects — the
natural Arrow layout for config-style documents) and over struct
layouts. Reference semantics /root/reference/index.js:388-460.
Differential against the row engine (itself reference-verified) and the
node oracle."""

from __future__ import annotations

import copy

import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import (ColumnarCompileError,
                                               TableValidator)

from .test_columnar_nested import _assert_parity, _doc_of

ST = pa.struct([("a", pa.float64()), ("b", pa.string())])

MAPOBJ_SCHEMA = {
    "@root": "#D",
    "D": {"id": "0..",
          "cfg": {"(k_[a-z]+)": {"a": "number", "b?": "(x|y)"}}},
}


def mapobj_table():
    return pa.table({
        "id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "cfg": pa.array([
            [("k_one", {"a": 1.0, "b": "x"})],                  # valid
            [("k_one", {"a": 2.0, "b": "zz"})],                 # b enum
            [("k_bad", None)],                                  # null value
            [("other", {"a": 7.0})],                            # unmatched
            [("k_a", {"b": "x"})],                              # a missing
            None,                                               # absent map
        ], pa.map_(pa.string(), ST)),
    })


def test_mapobj_regex_parity():
    _assert_parity(mapobj_table(), MAPOBJ_SCHEMA)


def test_mapobj_vs_reference_oracle():
    from .conftest import run_reference

    tbl = mapobj_table()
    tv = TableValidator(copy.deepcopy(MAPOBJ_SCHEMA))
    verdict, viols, _ = tv.validate_batch(tbl)
    viols = {v["row_idx"]: v for v in viols}
    cases = [{"data": _doc_of(r), "type": "@root",
              "schema": copy.deepcopy(MAPOBJ_SCHEMA),
              "mode": "validate"} for r in tbl.to_pylist()]
    for i, ref in enumerate(run_reference(cases)):
        assert bool(verdict[i]) == ref["valid"], (i, ref, viols.get(i))
        if not ref["valid"]:
            v = viols[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)


def test_mapobj_fixed_prop_both_layouts():
    """A FIXED object-valued prop inside a regex-bearing object: map
    layout validates by key equality; struct layout goes through the
    nested-struct family. (An object with regex props compiles the map
    family; its fixed props must still work on either layout.)"""
    schema = {"@root": "#D",
              "D": {"o": {"(z_.*)": "string",
                          "sub": {"q": "0..9"}}}}
    stsub = pa.struct([("q", pa.int64())])
    # map layout: value type must be uniform, so use map<string, struct>
    # where regex-matched entries carry a struct the string type rejects
    mp = pa.map_(pa.string(), stsub)
    tbl = pa.table({"o": pa.array([
        [("sub", {"q": 3})],                       # valid
        [("sub", {"q": 99})],                      # nested range fail
        [("sub", None)],                           # required null value
        [("z_x", {"q": 1})],                       # sub missing + z_x not string
    ], mp)})
    _assert_parity(tbl, schema)
    # struct layout
    tbl2 = pa.table({"o": pa.array([
        {"sub": {"q": 3}, "z_k": "ok"},
        {"sub": {"q": 77}, "z_k": "ok"},
        {"z_k": "ok"},                             # sub missing
    ], pa.struct([("sub", stsub), ("z_k", pa.string())]))})
    _assert_parity(tbl2, schema)


def test_mapobj_struct_layout_regex_fields():
    """Struct-layout companion: physical FIELDS matched by an
    object-valued regex prop validate through the embedded sub (struct
    fields) or the row engine (shape mismatches)."""
    schema = {"@root": "#D", "D": {"o": {"(k_.*)": {"a": "number"}}}}
    tbl = pa.table({"o": pa.array([
        {"k_one": {"a": 1.0}, "plain": "s"},
        {"k_one": {"a": None}, "plain": "s"},       # a absent
        {"k_one": None, "plain": "s"},              # null field ≡ absent
    ], pa.struct([("k_one", pa.struct([("a", pa.float64())])),
                  ("plain", pa.string())]))})
    _assert_parity(tbl, schema, n_invalid_min=1)


def test_mapobj_scalar_value_layout_row_engine():
    """map<string, scalar> against an object-valued regex prop: every
    matched valid entry fails through the row engine with exact
    fields."""
    schema = {"@root": "#D", "D": {"m": {"(k_.*)": {"a": "number"}}}}
    tbl = pa.table({"m": pa.array([
        [("k_one", 5.0)],
        [("other", 5.0)],
    ], pa.map_(pa.string(), pa.float64()))})
    _assert_parity(tbl, schema)


def test_mapobj_first_entry_wins():
    """Two failing matched entries in one map cell: entry order decides
    (the reference iterates data properties in order)."""
    schema = {"@root": "#D", "D": {"cfg": {"(k_.*)": {"a": "number"}}}}
    tbl = pa.table({"cfg": pa.array([
        [("k_one", {"a": None}), ("k_two", {"a": None})],
    ], pa.map_(pa.string(), pa.struct([("a", pa.float64())])))})
    tv = _assert_parity(tbl, schema)
    _, viols, _ = tv.validate_batch(tbl)
    assert viols[0]["datapath"] == "$.cfg.k_one.a"


def test_mapobj_deep_obj_value_compiles():
    """Object values with positions outside the vectorized surface now
    compile — those POSITIONS degrade to row-engine value rules inside
    the embedded sub (was a whole-schema fallback before r4)."""
    schema = {"@root": "#D",
              "D": {"cfg?": {"(k_.*)": {"v": [["string[]",
                                               {"a": "0..9"}]]}}}}
    TableValidator(copy.deepcopy(schema))
    # map layout: entries route through the row engine (exact)
    m = pa.map_(pa.string(), pa.struct([("v", pa.list_(pa.string()))]))
    rows = [[("k_a", {"v": ["x"]})], [("k_b", {"v": None})],
            [("other", {"v": ["x"]})], None]
    from .test_columnar_nested import _assert_parity
    _assert_parity(pa.table({"cfg": pa.array(rows, m)}), schema,
                   n_invalid_min=1)


@pytest.mark.parametrize("seed", range(40))
def test_mapobj_fuzz_matches_row_engine(seed):
    """Randomized differential: object-valued regex props over
    map<string, struct> with random inner prop types, required/optional
    mixes, matched/unmatched keys, null values and null maps."""
    import numpy as np

    from sjot_ray.core import SJOTValidationError, validate

    from .test_columnar_fuzz import SCALARS

    rng = np.random.default_rng(9300 + seed)
    n_props = int(rng.integers(1, 4))
    obj, fields, samplers = {}, [], {}
    for pi in range(n_props):
        vt, at, sam = SCALARS[int(rng.integers(0, len(SCALARS)))]
        pname = f"p{pi}"
        obj[pname if rng.random() < 0.6 else f"{pname}?"] = vt
        fields.append((pname, at))
        samplers[pname] = sam
    schema = {"@root": {"id?": "0..", "cfg?": {"(k_[a-z]+)": obj}}}
    st = pa.struct(fields)
    n_rows = 50
    keys_pool = ["k_aa", "k_bb", "other", "k_cc"]
    cells = []
    for _ in range(n_rows):
        if rng.random() < 0.15:
            cells.append(None)
            continue
        # ≥1 entry: _doc_of cannot tell an EMPTY map cell from an empty
        # list, so the row-engine doc would misrepresent it as an array
        n_entries = int(rng.integers(1, 4))
        ks = list(rng.choice(keys_pool, size=n_entries, replace=False)) \
            if n_entries else []
        entries = []
        for k in ks:
            if rng.random() < 0.1:
                entries.append((str(k), None))
            else:
                entries.append((str(k),
                                {p: samplers[p](rng) for p, _ in fields
                                 if rng.random() < 0.8}))
        cells.append(entries)
    tbl = pa.table({
        "id": pa.array([int(rng.integers(0, 9)) for _ in range(n_rows)],
                       pa.int64()),
        "cfg": pa.array(cells, pa.map_(pa.string(), st)),
    })

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


def test_any_typed_values_interpret_sjot_carriers():
    """any-typed values interpret embedded @sjot carriers in every
    layout this compiler serves: map entries (fixed + regex keys),
    struct-layout fixed fields, and root-level regex-matched columns
    (all were silent false-passes before r4; node-oracle verified)."""
    from .test_columnar_nested import _assert_parity

    st = pa.struct([("@sjot", pa.string()), ("x", pa.int64())])
    m = pa.map_(pa.string(), st)

    schema = {"@root": {"cfg?": {"(k.)": "any"}}, "I": {"x": "1..5"}}
    rows = [[("ka", {"@sjot": "#I", "x": 9})],
            [("ka", {"@sjot": "#I", "x": 3})],
            [("other", {"@sjot": "#I", "x": 9})]]
    _assert_parity(pa.table({"cfg": pa.array(rows, m)}), schema)

    schema2 = {"@root": {"cfg?": {"k": "any", "(z.)": "0..9"}},
               "I": {"x": "1..5"}}
    rows2 = [[("k", {"@sjot": "#I", "x": 9})],
             [("k", {"@sjot": "#I", "x": 3})]]
    _assert_parity(pa.table({"cfg": pa.array(rows2, m)}), schema2)

    bt = pa.struct([("k", st), ("za", pa.int64())])
    rows3 = [{"k": {"@sjot": "#I", "x": 9}, "za": 1},
             {"k": {"@sjot": "#I", "x": 3}, "za": 1}]
    _assert_parity(pa.table({"cfg": pa.array(rows3, bt)}), schema2)

    schema4 = {"@root": "#D", "D": {"(k.)": "any", "id": "0.."},
               "I": {"x": "1..5"}}
    tbl4 = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "ka": pa.array([{"@sjot": "#I", "x": 9},
                        {"@sjot": "#I", "x": 3},
                        {"@sjot": None, "x": 9}], st)})
    _assert_parity(tbl4, schema4)


def test_any_regex_struct_layout_carriers():
    """any-typed REGEX prop values over STRUCT layouts: matched
    physical fields carrying @sjot validate through the row engine —
    top-level and nested positions (the last carrier corner)."""
    from .test_columnar_nested import _assert_parity

    st = pa.struct([("@sjot", pa.string()), ("x", pa.int64())])
    bt = pa.struct([("ka", st), ("plain", pa.string())])
    schema = {"@root": {"cfg?": {"(k.)": "any", "plain?": "string"}},
              "I": {"x": "1..5"}}
    rows = [{"ka": {"@sjot": "#I", "x": 9}, "plain": "s"},
            {"ka": {"@sjot": "#I", "x": 3}, "plain": "s"},
            {"ka": None, "plain": "s"}]
    _assert_parity(pa.table({"cfg": pa.array(rows, bt)}), schema)

    schema2 = {"@root": {"outer?": {"box?": {"(k.)": "any"}}},
               "I": {"x": "1..5"}}
    rows2 = [{"box": {"ka": {"@sjot": "#I", "x": 9}, "plain": None}},
             {"box": {"ka": {"@sjot": "#I", "x": 3}, "plain": None}}]
    _assert_parity(pa.table(
        {"outer": pa.array(rows2, pa.struct([("box", bt)]))}), schema2)
