"""Planted-data tests for the temporal operators (pipelines/temporal.py):
as-of join strictness/tie/key-isolation semantics, per-key window
functions vs a pandas respecification, and the time-bucket range join vs
a brute-force double loop (including windows that straddle a bucket
boundary)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from sjot_ray.pipelines.temporal import (BUCKET_DAYS, _segmented_cummax,
                                         asof_join, range_join_count,
                                         window_funcs)

US_DAY = 86_400_000_000


def _ts(us):
    return pa.array(np.asarray(us, np.int64), pa.timestamp("us"))


def test_asof_join_semantics(ray_session):
    import ray.data

    # key 1: sources at t=10,20; probes at t=5 (no match), t=20 (strict:
    #   the t=20 source sorts AFTER by tie? no — ties are (ts, tie); the
    #   probe at (20, tie=103) matches the source at (20, tie=12) because
    #   (20,12) < (20,103); the probe at (20, tie=11) must NOT match it),
    # key 2: only source — probes of key 1 must not see it (isolation).
    probe = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": _ts([5, 20, 20, 30]),
        "tie": pa.array([100, 11, 103, 104], pa.int64()),
    }))
    source = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "ts": _ts([10, 20, 1]),
        "tie": pa.array([1, 12, 2], pa.int64()),
        "v": pa.array([10.5, 20.5, 99.0], pa.float64()),
    }))
    out = asof_join(probe, source, "k", "ts", "tie", ["tie", "v"],
                    n_rows=7).to_pandas().sort_values("tie") \
        .reset_index(drop=True)
    assert out["tie"].tolist() == [11, 100, 103, 104]
    # probe (20,11): only source strictly earlier is (10,1)
    # probe (5,100): none;  (20,103): source (20,12) counts;  (30,104): latest
    assert out["prior_tie"].tolist()[0] == 1
    assert pd.isna(out["prior_tie"].tolist()[1])
    assert out["prior_tie"].tolist()[2:] == [12, 12]
    assert out["prior_v"].tolist()[0] == 10.5
    assert out["prior_v"].tolist()[2:] == [20.5, 20.5]


def test_asof_join_no_sources(ray_session):
    import ray.data

    probe = ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()), "ts": _ts([5, 6]),
        "tie": pa.array([1, 2], pa.int64())}))
    source = ray.data.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "ts": _ts([]),
        "tie": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64())}))
    out = asof_join(probe, source, "k", "ts", "tie", ["v"],
                    n_rows=2).to_pandas()
    assert len(out) == 2 and out["prior_v"].isna().all()


def test_segmented_cummax_exact():
    val = np.array([3.0, 1.0, 5.0, 2.0, 7.0, 0.5, 0.25])
    run = np.array([0, 0, 0, 1, 1, 2, 2])
    got = _segmented_cummax(val, run)
    assert got.tolist() == [3.0, 3.0, 5.0, 2.0, 7.0, 0.5, 0.5]
    assert _segmented_cummax(np.array([]), np.array([])).tolist() == []


def test_window_funcs_vs_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    n = 5_000
    df = pd.DataFrame({
        "k": rng.integers(0, 37, n).astype(np.int64),
        "ts_us": rng.integers(0, 10**9, n).astype(np.int64),
        "tie": np.arange(n, dtype=np.int64),
        "v": rng.normal(0, 100, n),
    })
    ds = ray.data.from_arrow(pa.table({
        "k": pa.array(df.k), "ts": _ts(df.ts_us),
        "tie": pa.array(df.tie), "v": pa.array(df.v)})).repartition(9)
    out = window_funcs(ds, "k", "ts", "tie", "v", n_rows=n).to_pandas() \
        .sort_values("tie").reset_index(drop=True)

    exp = df.sort_values(["k", "ts_us", "tie"]).copy()
    g = exp.groupby("k", sort=False)
    exp["prev_delta_us"] = g["ts_us"].diff()
    exp["row_number"] = g.cumcount() + 1
    exp["running_max"] = g["v"].cummax()
    exp = exp.sort_values("tie").reset_index(drop=True)

    assert out["row_number"].tolist() == exp["row_number"].tolist()
    assert out["running_max"].tolist() == exp["running_max"].tolist()
    ours_delta = out["prev_delta_us"].astype("Float64")
    theirs = exp["prev_delta_us"].astype("Float64")
    assert ours_delta.isna().equals(theirs.isna())
    assert ours_delta.fillna(0).tolist() == theirs.fillna(0).tolist()


def test_range_join_count_planted(ray_session):
    import ray.data

    rng = np.random.default_rng(11)
    # build days spread over ~6 buckets; probe windows 7d, several
    # planted right at a bucket boundary so the 2-bucket fan-out and the
    # per-bucket clamps both matter
    build_days = rng.integers(0, 6 * BUCKET_DAYS, 4_000).astype(np.int64)
    probe_days = np.concatenate([
        rng.integers(0, 6 * BUCKET_DAYS, 300),
        np.array([BUCKET_DAYS - 1, BUCKET_DAYS - 6, 2 * BUCKET_DAYS - 3,
                  6 * BUCKET_DAYS + 5]),   # boundary straddles + no-match
    ]).astype(np.int64)
    W = 7
    build = ray.data.from_arrow(pa.table({
        "t": _ts(build_days * US_DAY)})).repartition(7)
    probe = ray.data.from_arrow(pa.table({
        "pid": pa.array(np.arange(len(probe_days), dtype=np.int64)),
        "t": _ts(probe_days * US_DAY)})).repartition(5)
    out = range_join_count(build, "t", probe, "pid", "t", window_days=W,
                           n_rows=4_000).to_pandas()
    got = dict(zip(out.pid, out.n))

    exp = {}
    for pid, d in enumerate(probe_days):
        c = int(((build_days >= d) & (build_days < d + W)).sum())
        if c:
            exp[pid] = c
    assert got == exp
    assert len(probe_days) - 1 not in got  # the beyond-range probe


def test_range_join_intraday_exact(ray_session):
    """Microsecond-granular semantics (seed-9002 differential
    regression): a build row 1 µs BEFORE the probe timestamp is
    excluded, one exactly AT it counts, one 1 µs before the exclusive
    end counts, one exactly at probe+window is excluded — day
    truncation would get all four wrong on non-midnight timestamps."""
    import ray.data

    W = 7
    probe_us = np.int64(3 * US_DAY + 12 * 3_600_000_000 + 123)
    build_us = np.array([
        probe_us - 1,                     # just before → out
        probe_us,                         # inclusive start → in
        probe_us + W * US_DAY - 1,        # just inside end → in
        probe_us + W * US_DAY,            # exclusive end → out
    ], np.int64)
    build = ray.data.from_arrow(pa.table({"t": _ts(build_us)}))
    probe = ray.data.from_arrow(pa.table({
        "pid": pa.array([0], pa.int64()), "t": _ts([probe_us])}))
    out = range_join_count(build, "t", probe, "pid", "t",
                           window_days=W, n_rows=4).to_pandas()
    assert dict(zip(out.pid, out.n)) == {0: 2}


def test_range_join_window_cap():
    import ray.data

    ds = ray.data.from_arrow(pa.table({"t": _ts([0])}))
    with pytest.raises(ValueError):
        range_join_count(ds, "t", ds, "t", "t",
                         window_days=BUCKET_DAYS + 1, n_rows=1)


def test_ntile_matches_sql_spec():
    """NTILE(n): first cnt%n buckets get cnt//n+1 rows — property-check
    the vectorized formula against the per-partition loop spec."""
    from sjot_ray.pipelines.temporal import _ntile

    for cnt in range(1, 30):
        for n in (1, 2, 3, 4, 7, 40):
            rn = np.arange(1, cnt + 1, dtype=np.int64)
            got = _ntile(rn, np.full(cnt, cnt, np.int64), n)
            q, r = divmod(cnt, n)
            expect = []
            b = 1
            left = q + 1 if r >= 1 else q
            for _ in range(cnt):
                if left == 0:
                    b += 1
                    left = q + 1 if b <= r else q
                expect.append(b)
                left -= 1
            assert got.tolist() == expect, (cnt, n)


def test_rank_window_funcs_planted(ray_session):
    """Planted per-key spec: value ties share RANK and compress under
    DENSE_RANK; LEAD is null on each key's last row; NTILE follows the
    (ts, tie) order."""
    import ray.data

    from sjot_ray.pipelines.temporal import rank_window_funcs

    # user 1: values 5, 5, 3, 1 in ts order → rnk 1,1,3,4 / drnk 1,1,2,3
    # user 2: single row
    t = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_id": pa.array([1, 2, 3, 4, 9], pa.int64()),
        "ts": _ts([10, 20, 30, 40, 5]),
        "value": pa.array([5.0, 5.0, 3.0, 1.0, 2.0]),
        "event_type": pa.array(["a", "b", "c", "d", "z"])})
    out = rank_window_funcs(ray.data.from_arrow(t), "user_id", "ts",
                            "event_id", "value", "event_type",
                            n_rows=5, n_tiles=2)
    rows = {r["event_id"]: r for r in
            pa.concat_tables(out.iter_batches(
                batch_format="pyarrow", batch_size=None)).to_pylist()}
    assert [rows[i]["rnk"] for i in (1, 2, 3, 4)] == [1, 1, 3, 4]
    assert [rows[i]["drnk"] for i in (1, 2, 3, 4)] == [1, 1, 2, 3]
    assert [rows[i]["lead_label"] for i in (1, 2, 3, 4)] == \
        ["b", "c", "d", None]
    assert [rows[i]["tile"] for i in (1, 2, 3, 4)] == [1, 1, 2, 2]
    assert rows[9]["rnk"] == 1 and rows[9]["drnk"] == 1
    assert rows[9]["lead_label"] is None and rows[9]["tile"] == 1
