"""exact_quantiles (pipelines/quantiles.py): planted distributions vs a
numpy rank-selection respecification, with collect_cap forced small so
the histogram-refinement RECURSION path runs, plus duplicate-mass and
all-equal degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sjot_ray.pipelines.quantiles import exact_quantiles

PCTS = [1, 10, 25, 50, 75, 90, 99]


def _expected(vals: np.ndarray, pcts) -> dict[int, float]:
    s = np.sort(vals)
    n = len(s)
    return {p: float(s[max(1, (p * n + 99) // 100) - 1]) for p in pcts}


def _run(ray, vals: np.ndarray, **kw) -> dict[int, float]:
    import ray.data

    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    t = exact_quantiles(ds.repartition(8), "x", PCTS, **kw)
    return dict(zip(t["pct"].to_pylist(), t["value"].to_pylist()))


def test_exact_quantiles_uniform(ray_session):
    rng = np.random.default_rng(3)
    vals = rng.uniform(-1000, 1000, 50_000)
    assert _run(ray_session, vals) == _expected(vals, PCTS)


def test_exact_quantiles_recursion_path(ray_session):
    """collect_cap far below n/K forces at least one recursion level;
    lognormal skew concentrates mass in few buckets."""
    rng = np.random.default_rng(4)
    vals = np.exp(rng.normal(0, 2, 60_000))
    got = _run(ray_session, vals, K=16, collect_cap=200)
    assert got == _expected(vals, PCTS)


def test_exact_quantiles_duplicate_mass(ray_session):
    """40% of rows are one exact value — the bucket holding it cannot be
    split below the cap; the selection must still be exact."""
    rng = np.random.default_rng(5)
    vals = np.concatenate([np.full(20_000, 5.0),
                           rng.uniform(0, 10, 30_000)])
    rng.shuffle(vals)
    got = _run(ray_session, vals, K=16, collect_cap=500, max_depth=3)
    exp = _expected(vals, PCTS)
    for p in PCTS:
        assert abs(got[p] - exp[p]) < 1e-9, (p, got[p], exp[p])


def test_exact_quantiles_all_equal(ray_session):
    vals = np.full(10_000, 3.25)
    got = _run(ray_session, vals, K=8, collect_cap=100)
    assert all(v == 3.25 for v in got.values())


def test_exact_quantiles_with_nulls(ray_session):
    import ray.data

    vals = [1.0, None, 2.0, 3.0, None, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
    ds = ray.data.from_arrow(pa.table({"x": pa.array(vals, pa.float64())}))
    t = exact_quantiles(ds, "x", [50])
    # 10 non-null values → rank ceil(0.5·10)=5 → value 5.0
    assert t["value"].to_pylist() == [5.0]
