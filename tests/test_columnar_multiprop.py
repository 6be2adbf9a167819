"""Cross-property first-error ordering fuzz: schemas with 3-5 props of
MIXED rule families (scalar, char-length, container, nested object,
union, tuple, regex-prop object) over one table — verdict AND
first-violation parity with the row engine on every row. Single-prop
fuzzers cannot catch major-ordering bugs between families (e.g. a
degraded position's rollback leaving a stale ordering key); this class
exists to pin prop-declaration-order error selection across them."""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import TableValidator
from sjot_ray.core import SJOTValidationError, validate

from .test_columnar_nested import _doc_of

FAMILIES = ["scalar", "charlen", "container", "nested", "union",
            "tuple", "deep"]


def _family(rng, i):
    """→ (prop_type, arrow_type, sampler) for family picked by rng."""
    f = rng.choice(FAMILIES)
    if f == "scalar":
        return ("(aa|bb)", pa.string(),
                lambda r: str(r.choice(["aa", "bb", "zz"])))
    if f == "charlen":
        return ("char[2,4]", pa.string(),
                lambda r: "x" * int(r.integers(0, 6)))
    if f == "container":
        return ("0..9[1,2]", pa.list_(pa.int64()),
                lambda r: [int(r.integers(-2, 12))
                           for _ in range(int(r.integers(0, 4)))])
    if f == "nested":
        return ({"x": "0..9", "y?": "(on|off)"},
                pa.struct([("x", pa.int64()), ("y", pa.string())]),
                lambda r: {"x": int(r.integers(-2, 12))
                           if r.random() < 0.85 else None,
                           "y": str(r.choice(["on", "off", "zz"]))
                           if r.random() < 0.5 else None})
    if f == "union":
        return ([["0..9", "(aa|bb)"]], pa.int64(),
                lambda r: int(r.integers(-2, 12)))
    if f == "tuple":
        return (["0..9", "(aa|bb)"], pa.list_(pa.string()),
                lambda r: [str(r.choice(["1", "5", "77"])),
                           str(r.choice(["aa", "zz"]))][
                               :int(r.integers(1, 3))])
    # deep: a degraded position (doubly-nested container)
    return ("0..9[][]", pa.list_(pa.list_(pa.int64())),
            lambda r: [[int(r.integers(-2, 12))
                        for _ in range(int(r.integers(0, 3)))]
                       for _ in range(int(r.integers(0, 3)))])


@pytest.mark.parametrize("seed", range(80))
def test_multiprop_cross_family_ordering(seed):
    rng = np.random.default_rng(37000 + seed)
    n_props = int(rng.integers(3, 6))
    schema_props: dict = {}
    cols: dict = {}
    samplers = []
    for i in range(n_props):
        pt, at, sam = _family(rng, i)
        name = f"p{i}"
        key = name + ("?" if rng.random() < 0.4 else "")
        schema_props[key] = pt
        samplers.append((name, at, sam))
    schema = {"@root": schema_props}

    n = 80
    for name, at, sam in samplers:
        vals = [sam(rng) if rng.random() < 0.8 else None
                for _ in range(n)]
        cols[name] = pa.array(vals, at)
    tbl = pa.table(cols)

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
        assert bool(cv[i]) == want, (i, doc, want, schema, vm.get(i))
        if not want:
            g = vm[i]
            assert (g["datapath"], g["what"], g["value_repr"]) == (
                werr["datapath"], werr["what"], werr["value_repr"]), (
                i, doc, g, werr, schema)
