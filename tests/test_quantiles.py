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


def _grouped_expected(gs, vals, pcts):
    want = {}
    for g in np.unique(gs):
        s = np.sort(vals[gs == g])
        n = len(s)
        for p in pcts:
            want[(g, p)] = float(s[max(1, (p * n + 99) // 100) - 1])
    return want


def _grouped_run(ray, gs, vals, pcts, **kw):
    import ray.data

    from sjot_ray.pipelines.quantiles import grouped_exact_quantiles

    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(list(gs)), "x": pa.array(vals, pa.float64())}))
    t = grouped_exact_quantiles(ds.repartition(8), "g", "x", pcts, **kw)
    return {(g, p): v for g, p, v in zip(t["g"].to_pylist(),
                                         t["pct"].to_pylist(),
                                         t["value"].to_pylist())}


def test_grouped_quantiles_planted(ray_session):
    """Per-group exact selection vs numpy on skewed groups of very
    different sizes and ranges (shared histogram/collect passes)."""
    rng = np.random.default_rng(11)
    gs = np.array(["a"] * 40_000 + ["b"] * 3_000 + ["c"] * 7)
    vals = np.concatenate([np.exp(rng.normal(0, 2, 40_000)),
                           rng.uniform(-50, -10, 3_000),
                           np.arange(7, dtype=np.float64)])
    pcts = [10, 50, 90]
    got = _grouped_run(ray_session, gs, vals, pcts)
    assert got == _grouped_expected(gs, vals, pcts)


def test_grouped_quantiles_recursion_and_dup_mass(ray_session):
    """Tiny collect_cap forces per-group refinement levels; one group is
    40% a single exact value (unsplittable bucket), the other is smooth
    — both must stay exact through the batched level loop."""
    rng = np.random.default_rng(12)
    gs = np.array(["hot"] * 50_000 + ["cold"] * 20_000)
    vals = np.concatenate([
        np.concatenate([np.full(20_000, 5.0),
                        rng.uniform(0, 10, 30_000)]),
        rng.normal(0, 1, 20_000)])
    pcts = [25, 50, 75]
    got = _grouped_run(ray_session, gs, vals, pcts,
                       K=16, collect_cap=300)
    assert got == _grouped_expected(gs, vals, pcts)


def test_grouped_quantiles_nulls_and_empty_group(ray_session):
    """Null measure values are excluded per group; a group whose values
    are ALL null contributes no output rows."""
    t = pa.table({
        "g": pa.array(["a"] * 5 + ["b"] * 3),
        "x": pa.array([1.0, None, 3.0, 2.0, None, None, None, None])})
    import ray.data

    from sjot_ray.pipelines.quantiles import grouped_exact_quantiles

    out = grouped_exact_quantiles(
        ray_session.data.from_arrow(t), "g", "x", [50, 99])
    rows = {(g, p): v for g, p, v in zip(out["g"].to_pylist(),
                                         out["pct"].to_pylist(),
                                         out["value"].to_pylist())}
    assert rows == {("a", 50): 2.0, ("a", 99): 3.0}


def test_grouped_quantiles_two_oversized_buckets_same_group(ray_session):
    """Two far-apart dense clusters in ONE group put p10 and p90 into two
    DIFFERENT oversized buckets — both must refine (entry-grained
    pending), not fall back to an over-cap collect."""
    rng = np.random.default_rng(13)
    vals = np.concatenate([rng.uniform(0.0, 1.0, 30_000),
                           rng.uniform(999.0, 1000.0, 30_000)])
    gs = np.array(["g"] * 60_000)
    pcts = [10, 90]
    got = _grouped_run(ray_session, gs, vals, pcts, K=8, collect_cap=500)
    assert got == _grouped_expected(gs, vals, pcts)


def test_values_at_ranks_exact(ray_session):
    """The rank-selection core returns exactly the sorted-column values
    at arbitrary ranks (callable form receives the true n), out-of-range
    ranks clamp."""
    import ray.data

    from sjot_ray.pipelines.quantiles import values_at_ranks

    rng = np.random.default_rng(11)
    vals = rng.normal(0, 50, 20_000)
    s = np.sort(vals)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.float64())})).repartition(6)
    seen = {}

    def ranks_fn(m: int):
        seen["n"] = m
        return [1, 7, 9_999, 20_000, 25_000]

    res, n = values_at_ranks(ds, "x", ranks_fn)
    assert n == 20_000 and seen["n"] == 20_000
    assert res[1] == float(s[0])
    assert res[7] == float(s[6])
    assert res[9_999] == float(s[9_998])
    assert res[20_000] == float(s[-1])  # 25_000 clamped onto n too


def test_quantile_cont_planted(ray_session, tmp_path):
    """Interpolated percentile_cont against a numpy respecification of
    the SAME integer-exact frac formula (and numpy.percentile linear
    interpolation, which it equals for these inputs)."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.quantiles import q_quantile_cont_price

    rng = np.random.default_rng(12)
    vals = rng.uniform(900.0, 105_000.0, 5_003)
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"l_extendedprice": pa.array(vals,
                                                         pa.float64())}),
                   sf / "lineitem.parquet")
    out = q_quantile_cont_price(str(sf))
    got = dict(zip(out["pct"].to_pylist(), out["value"].to_pylist()))
    s = np.sort(vals)
    n = len(s)
    for p in (10, 25, 50, 75, 90):
        lo0 = (p * (n - 1)) // 100
        frac = ((p * (n - 1)) % 100) / 100.0
        exp = round(float(s[lo0] + frac * (s[min(lo0 + 1, n - 1)]
                                           - s[lo0])), 6)
        assert got[p] == exp
        assert abs(got[p] - np.percentile(vals, p)) < 1e-6
