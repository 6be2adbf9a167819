"""FIXTURES.md F2: per-type-family kernel corpus. Each SJOT type family
gets a column of valid + boundary + invalid probes; the columnar verdict
per cell must equal the row engine's (which is itself oracle-verified)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import TableValidator
from sjot_ray.core import valid as row_valid

CASES = [
    # (sjot_type, arrow_type, values)
    ("boolean", pa.bool_(), [True, False, None]),
    ("true", pa.bool_(), [True, False]),
    ("byte", pa.int64(), [-129, -128, 127, 128, 0]),
    ("short", pa.int64(), [-32769, -32768, 32767, 32768]),
    ("int", pa.int64(), [-2**31 - 1, -2**31, 2**31 - 1, 2**31]),
    ("long", pa.int64(), [-2**47 - 1, -2**47, 2**47 - 1, 2**47]),
    ("ubyte", pa.int64(), [-1, 0, 255, 256]),
    ("ushort", pa.int64(), [-1, 0, 65535, 65536]),
    ("uint", pa.int64(), [-1, 0, 2**32 - 1, 2**32]),
    ("ulong", pa.int64(), [-1, 0, 2**53]),
    ("integer", pa.float64(), [1.0, 1.5, -3.0]),
    ("number", pa.float64(), [1.5, -2.25]),
    ("float", pa.float64(), [1.5]),
    ("-10..10", pa.int64(), [-11, -10, 0, 10, 11]),
    ("-10..10", pa.float64(), [-10.0, 1.5, 10.0]),
    ("1.0..10.0", pa.float64(), [0.5, 1.0, 5.5, 10.0, 10.5]),
    ("<-10..10>", pa.int64(), [-10, -9, 9, 10]),
    ("<0.0..5.0>", pa.float64(), [0.0, 0.001, 4.999, 5.0]),
    ("..5", pa.int64(), [4, 5, 6]),
    ("5..", pa.int64(), [4, 5, 6]),
    ("..5>", pa.int64(), [4, 5]),
    ("<5..", pa.int64(), [5, 6]),
    ("-999,-1,0,1,999", pa.int64(), [-999, -2, -1, 0, 1, 2, 999, 1000]),
    ("1..10,20..30", pa.int64(), [0, 5, 15, 25, 31]),
    ("1..10,20..30", pa.float64(), [5.5, 25.0]),
    ("1,2.0..3.0", pa.float64(), [1.0, 2.5, 1.5]),
    ("string", pa.string(), ["x", "", None]),
    ("char", pa.string(), ["", "a", "ab", "日"]),
    ("char[1,3]", pa.string(), ["", "a", "abc", "abcd"]),
    ("char[2]", pa.string(), ["a", "ab", "abc"]),
    ("(a|bb)", pa.string(), ["a", "bb", "ab", "", "aa"]),
    ("base64", pa.string(), ["QUJD", "a", "a=b", "=", "!!"]),
    ("hex", pa.string(), ["", "deadBEEF", "xyz"]),
    ("uuid", pa.string(),
     ["123e4567-e89b-12d3-a456-426655440000",
      "urn:uuid:123e4567-e89b-12d3-a456-426655440000", "nope"]),
    ("date", pa.string(), ["2026-01-31", "2026-13-99", "26-1-1"]),
    ("time", pa.string(), ["23:59:59", "23:59:59.123+01:00", "24:0:0"]),
    ("datetime", pa.string(),
     ["2026-01-01T00:00:00", "2026-01-01 00:00:00"]),
    ("duration", pa.string(), ["PT0S", "-P1Y", "1S"]),
    ("atom", pa.string(), ["s"]),
    ("atom", pa.int64(), [5]),
    ("atom", pa.bool_(), [True]),
    ("any", pa.string(), ["whatever", None]),
    # unions over scalar columns (depth-1 try-each semantics)
    ([["string", "int"]], pa.string(), ["s"]),
    ([["string", "int"]], pa.int64(), [5]),
    ([["(a|b)", "1..5"]], pa.string(), ["a", "c"]),
    ([["(a|b)", "1..5"]], pa.int64(), [3, 9]),
    ([["1..5", "10..20"]], pa.int64(), [3, 7, 15]),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_columnar_scalar_kernel_matches_row_engine(case_idx):
    sjot_type, arrow_type, values = CASES[case_idx]
    tbl = pa.table({"v": pa.array(values, arrow_type)})
    tv = TableValidator({"@root": {"v?": sjot_type}})
    verdict, violations, _ = tv.validate_batch(tbl)
    for i, cell in enumerate(values):
        if cell is None:
            expected = True  # Arrow null ≡ absent; v is optional
        else:
            expected = row_valid(cell, sjot_type)
        assert bool(verdict[i]) == expected, (
            f"type={sjot_type!r} value={cell!r}: columnar={bool(verdict[i])}"
            f" row={expected}")


def test_required_null_reports_presence():
    tbl = pa.table({"v": pa.array([1, None], pa.int64())})
    tv = TableValidator({"@root": {"v": "int"}})
    verdict, violations, _ = tv.validate_batch(tbl)
    assert list(verdict) == [True, False]
    assert violations[0]["what"] == "should be present"
    assert violations[0]["datapath"] == "$.v"


def test_list_of_primitive_columns():
    tbl = pa.table({
        "xs": pa.array([["a", "b"], [], ["a", 5 * "y"], None],
                       pa.list_(pa.string())),
    })
    tv = TableValidator({"@root": {"xs?": "(a|b|x)[1,3]"}})
    verdict, violations, _ = tv.validate_batch(tbl)
    assert list(verdict) == [True, False, False, True]
    # empty list fails the [1,3] bound; 'yyyyy' fails the item regex
    assert violations[0]["what"] == "length"
    assert violations[1]["datapath"] == "$.xs[1]"


def test_set_column_semantics():
    tbl = pa.table({
        "s": pa.array([["b", "a"], ["a", "a"], None], pa.list_(pa.string())),
    })
    tv = TableValidator({"@root": {"s?": "string{1,}"}})
    verdict, violations, _ = tv.validate_batch(tbl)
    assert list(verdict) == [True, False, True]
    out = tv.normalize_batch(tbl)
    assert out["s"].to_pylist()[0] == ["a", "b"]


def test_wildcard_shape_rules():
    """object/array WILDCARD types constrain the data's shape — a
    scalar against "object" or a struct against "array" fails "value"
    exactly like the reference (was a silent pass before r4: the
    dispatcher skipped wildcards entirely)."""
    import copy

    from .test_columnar_nested import _assert_parity

    _assert_parity(pa.table({"v": pa.array([5, None], pa.int64())}),
                   {"@root": {"v": "object"}})
    _assert_parity(pa.table({"v": pa.array([[1]], pa.list_(pa.int64()))}),
                   {"@root": {"v": "object"}})
    _assert_parity(pa.table({"v": pa.array([5], pa.int64())}),
                   {"@root": {"v": "array"}})
    st = pa.struct([("x", pa.int64())])
    _assert_parity(pa.table({"v": pa.array([{"x": 1}], st)}),
                   {"@root": {"v": "array"}})
    # valid shapes stay rule-free passes
    _assert_parity(pa.table({"v": pa.array([{"x": 1}, None], st)}),
                   {"@root": {"v?": "object"}}, n_invalid_min=0)
    # nested position
    bt = pa.struct([("w", pa.int64())])
    _assert_parity(pa.table({"b": pa.array([{"w": 5}, None], bt)}),
                   {"@root": {"b?": {"w": "object"}}})
