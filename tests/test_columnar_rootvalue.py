"""Non-object ROOT types on the columnar engine (``value_column`` mode):
fuzz the root-type space × column-shape space against the row engine
(itself node-oracle-verified, tests/test_core_differential.py) — exact
verdict AND first-violation field parity, 0 divergences. Closes the last
whole-schema row-engine fallback (r4 VERDICT "next" #6).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import (ColumnarCompileError,
                                               TableValidator)
from sjot_ray.core import Context, SJOTValidationError
from sjot_ray.core.errors import SJOTSchemaError
from sjot_ray.core.validator import roottype, validate_value

# every root-type FAMILY: scalars, sized ints, formats, regex, ranges,
# enums, char-length, containers (list/set/tuple, bounded, nested),
# unions (scalar and container branches), refs, wildcards
ROOT_SCHEMAS = [
    {"@root": t} for t in [
        "boolean", "true", "false", "byte", "short", "int", "long",
        "ubyte", "ushort", "uint", "ulong", "integer", "float", "double",
        "number", "string", "atom", "char", "char[2,4]", "base64", "hex",
        "uuid", "date", "time", "datetime", "duration", "(a[0-9]+)",
        "1..10", "<0..20>", "..5", "3..", "1.5..9.5", "-5..5", "1,3,5..9",
        "null", "any", "object", "array",
        "int[]", "0..9[2,4]", "string{1,3}", "date[]", "uuid{1,2}",
        "int[][]",
        ["int", "string"], ["0..9"], [2], [1, "string", 3],
        [["string", "0..9"]], [["null", "string"]],
        [["int", "string", "boolean"]], [["0..9[]", "string"]],
    ]
] + [
    {"@root": "#T", "T": "1..10"},
    {"@root": "#T", "T": "(x+y)"},
    {"@root": "#T", "T": "int{1,3}"},
]

_STRINGS = ["", "a", "ab", "abc", "abcd", "a7", "a777", "xb",
            "2020-01-02", "9999-99-99", "12:30:00", "2020-01-02T03:04:05Z",
            "P1Y2M", "deadbeef", "zz", "QUJD", "QUJD=",
            "123e4567-e89b-12d3-a456-426614174000", "x", "yy", "1.5"]


def _columns(rng: np.random.default_rng, n: int):
    def nullify(vals, typ):
        mask = rng.random(n) < 0.2
        return pa.array([None if m else v for v, m in zip(vals, mask)], typ)

    ints = rng.integers(-60, 60, n).tolist()
    big = rng.choice([0, 1, 255, 256, -129, 65536, 2**31, 2**47,
                      2**47 - 1, -2**47 - 1, 2**53, -1], n).tolist()
    floats = [float(x) for x in
              rng.choice([0.0, 1.0, 1.5, 3.0, -2.5, 9.5, 20.0, 100.0], n)]
    strs = rng.choice(_STRINGS, n).tolist()
    bools = rng.random(n) < 0.5
    li = [rng.integers(-5, 15, rng.integers(0, 5)).tolist()
          for _ in range(n)]
    ls = [rng.choice(_STRINGS, rng.integers(0, 4)).tolist()
          for _ in range(n)]
    lf = [[float(x) for x in rng.choice([1.0, 2.5, 7.0],
                                        rng.integers(0, 4))]
          for _ in range(n)]
    lli = [[rng.integers(0, 12, rng.integers(0, 3)).tolist()
            for _ in range(rng.integers(0, 3))] for _ in range(n)]
    return {
        "int64": nullify(ints, pa.int64()),
        "bigint": nullify(big, pa.int64()),
        "float64": nullify(floats, pa.float64()),
        "string": nullify(strs, pa.string()),
        "bool": nullify(bools.tolist(), pa.bool_()),
        "list_int": nullify(li, pa.list_(pa.int64())),
        "list_str": nullify(ls, pa.list_(pa.string())),
        "list_float": nullify(lf, pa.list_(pa.float64())),
        "list_list_int": nullify(lli, pa.list_(pa.list_(pa.int64()))),
    }


def _row_oracle(schema, value):
    sjots = schema if isinstance(schema, list) else [schema]
    t = roottype(sjots[0])
    try:
        validate_value(sjots, value, t, sjots[0], "$", "/@root", Context())
        return True, None
    except SJOTValidationError as e:
        return False, e.violation_row()
    except SJOTSchemaError:
        return None, None  # schema-level reject: out of scope here


@pytest.mark.parametrize("schema", ROOT_SCHEMAS,
                         ids=[str(s["@root"])[:32] for s in ROOT_SCHEMAS])
def test_root_value_fuzz_matches_row_engine(schema):
    rng = np.random.default_rng(17)
    n = 40
    ndiv = 0
    for cname, arr in _columns(rng, n).items():
        tv = TableValidator(schema, value_column="v")
        tbl = pa.table({"v": arr})
        verdict, viols, _ = tv.validate_batch(tbl)
        by_row = {v["row_idx"]: v for v in viols}
        for i in range(n):
            ok_o, row_o = _row_oracle(schema, arr[i].as_py())
            if ok_o is None:
                continue
            if bool(verdict[i]) != ok_o:
                ndiv += 1
                print("VERDICT DIV", cname, i, arr[i], bool(verdict[i]),
                      ok_o)
                continue
            if not ok_o:
                v = by_row[i]
                got = (v["datapath"], v["typepath"], v["what"],
                       v["value_repr"])
                want = (row_o["datapath"], row_o["typepath"],
                        row_o["what"], row_o["value_repr"])
                if got != want:
                    ndiv += 1
                    print("FIELD DIV", cname, i, arr[i], got, want)
    assert ndiv == 0


def test_root_value_requires_column_name():
    """A non-object root with no value_column stays a compile-time
    raise: over a table nothing says which column holds the document."""
    for root in ("any", "string", "0..9[]"):
        with pytest.raises(ColumnarCompileError):
            TableValidator({"@root": root})
        TableValidator({"@root": root}, value_column="v")  # compiles


def test_root_value_normalize_passthrough():
    tv = TableValidator({"@root": "1..10"}, value_column="v")
    t = pa.table({"v": pa.array([1, None], pa.int64())})
    assert tv.normalize_batch(t) is t


def test_root_value_node_anchor(ray_session):
    """Small node-oracle anchor: reference verdicts on representative
    (root type, document) pairs equal the columnar verdicts."""
    from .conftest import run_reference

    cases = [
        ({"@root": "1..10"}, pa.array([1, 50, None], pa.int64())),
        ({"@root": "(a+b)"}, pa.array(["aab", "xb"], pa.string())),
        ({"@root": "string{1,2}"},
         pa.array([["a", "b"], ["a", "a"], []], pa.list_(pa.string()))),
        ({"@root": [["string", "0..9"]]}, pa.array([3, 50], pa.int64())),
        ({"@root": "char[2,3]"}, pa.array(["ab", "abcd"], pa.string())),
    ]
    ref_cases, meta = [], []
    for schema, arr in cases:
        for i in range(len(arr)):
            ref_cases.append({"data": arr[i].as_py(), "type": "@root",
                              "schema": schema, "mode": "validate"})
            meta.append((schema, arr, i))
    refs = run_reference(ref_cases)
    for (schema, arr, i), ref in zip(meta, refs):
        tv = TableValidator(schema, value_column="v")
        verdict, _, _ = tv.validate_batch(pa.table({"v": arr}))
        assert bool(verdict[i]) == bool(ref["valid"]), (schema, arr[i])


def test_root_value_through_stage_surface(ray_session):
    """The pipeline surface reaches root-value mode: a Dataset of scalar
    documents validates against a non-object root via make_validate_fn
    (per-worker cached compile), with root $ datapaths."""
    import ray.data

    from sjot_ray.stages.validate import make_validate_fn

    ds = ray.data.from_arrow(pa.table(
        {"v": pa.array([1, 5, 50, None], pa.int64())}))
    out = ds.map_batches(
        make_validate_fn({"@root": "1..10"}, extras_column=None,
                         value_column="v"),
        batch_format="pyarrow").to_pandas().sort_values("v", na_position="last")
    assert out["verdict"].tolist() == [True, True, False, False]
    bad = out[~out["verdict"]]
    assert set(bad["v_datapath"]) == {"$"}
