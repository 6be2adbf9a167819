"""Scale evidence for the analytics operator family: run the grouped
argmin (q2_min_cost_supplier), the window-frame moving sum
(events_moving_sum) and the co-purchase pair miner over GENERATED
large inputs with PLANTED ground truth, and report per-op wall time
plus driver RSS before/after. The points:

* q2: planted below-market rows (price 0.01 on every 1000th part, with
  a deliberate argmin TIE on one of them) are recovered EXACTLY at
  10M rows — the partial-argmin merge loses nothing;
* moving sum: 20 sampled users' outputs equal a local numpy replay of
  the ROWS-4 frame — the segmented cumsum-difference is exact;
* co-purchase: a planted always-together part pair dominates the
  support ranking;
* driver RSS stays flat — per-op results are aggregates (argmin rows,
  per-user windows shuffled not collected, supported pairs), never the
  input.

Usage: python scripts/analytics_scale_check.py [--rows 10000000]
                                               [--num-cpus 16]
Writes the inputs once under /tmp and reuses them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


N_PARTS = 100_000
N_SUPPS = 10_000
PLANT_STRIDE = 1_000          # every 1000th part gets a 1-cent row
TIE_PART = 5_000              # this part gets TWO 1-cent suppliers
N_USERS = 50_000
PAIR_A, PAIR_B = 3, 11        # planted always-together parts


def gen_lineitem(out_dir: str, n_rows: int, seed: int = 13) -> str:
    """lineitem-shaped parquet with planted argmin + co-purchase
    structure. Random prices are ≥ 1.00, planted rows are 0.01, so
    every planted part's min is known; orders of 4 parts each always
    include the (PAIR_A, PAIR_B) pair in order 0 mod 100."""
    path = os.path.join(out_dir, "lineitem.parquet")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_orders = n_rows // 4
    okey = np.repeat(np.arange(n_orders, dtype=np.int64), 4)
    pkey = rng.integers(0, N_PARTS, n_rows).astype(np.int64)
    # planted co-purchase: order ≡ 0 (mod 100) carries PAIR_A and PAIR_B
    planted_orders = np.arange(0, n_orders, 100)
    pkey[planted_orders * 4] = PAIR_A
    pkey[planted_orders * 4 + 1] = PAIR_B
    skey = rng.integers(0, N_SUPPS, n_rows).astype(np.int64)
    price = (rng.integers(100, 10_000_000, n_rows)
             / 100.0)                      # ≥ 1.00, exact cents
    # planted argmin rows: parts 0, 1000, 2000, … get a 0.01 row whose
    # supplier is part % 997; the tie part gets a second 0.01 row with
    # a HIGHER suppkey that must lose the tie-break
    plant_parts = np.arange(0, N_PARTS, PLANT_STRIDE, dtype=np.int64)
    k = len(plant_parts)
    rows = rng.choice(n_rows, size=k + 1, replace=False)
    pkey[rows[:k]] = plant_parts
    skey[rows[:k]] = plant_parts % 997
    price[rows[:k]] = 0.01
    pkey[rows[k]] = TIE_PART
    skey[rows[k]] = (TIE_PART % 997) + 7
    price[rows[k]] = 0.01
    t = pa.table({"l_orderkey": pa.array(okey),
                  "l_partkey": pa.array(pkey),
                  "l_suppkey": pa.array(skey),
                  "l_extendedprice": pa.array(price)})
    pq.write_table(t, path, row_group_size=262_144)
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    return out_dir


def gen_events(out_dir: str, n_rows: int, seed: int = 17) -> str:
    path = os.path.join(out_dir, "events.parquet")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    ts = base + np.sort(rng.integers(0, 30 * 86_400_000_000, n_rows))
    t = pa.table({
        "event_id": pa.array(np.arange(n_rows, dtype=np.int64)),
        "user_id": pa.array(
            rng.integers(0, N_USERS, n_rows).astype(np.int64)),
        "ts": pa.array(ts.view("datetime64[us]")),
        "value": pa.array(
            rng.integers(0, 100_000, n_rows) / 100.0)})
    pq.write_table(t, path, row_group_size=262_144)
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    li_dir = gen_lineitem(f"/tmp/analytics_scale_li_{args.rows}",
                          args.rows)
    ev_dir = gen_events(f"/tmp/analytics_scale_ev_{args.rows // 2}",
                        args.rows // 2)
    rss0 = _rss_mb()
    report: dict = {"rows_lineitem": args.rows,
                    "rows_events": args.rows // 2,
                    "num_cpus": args.num_cpus,
                    "driver_rss_mb_before": round(rss0, 1)}

    from sjot_ray.pipelines.analytics import (copurchase_pairs_ds,
                                              q_events_moving_sum,
                                              q_q2_min_cost_supplier)
    from sjot_ray.pipelines.queries import _t

    # -- grouped argmin: planted minima recovered exactly ------------
    t0 = time.perf_counter()
    argmin = q_q2_min_cost_supplier(li_dir)
    report["q2_wall_s"] = round(time.perf_counter() - t0, 2)
    got = {r["p_partkey"]: (r["s_suppkey"], r["min_cents"])
           for r in argmin.to_pylist()}
    plant = {int(p): (int(p % 997), 1)
             for p in range(0, N_PARTS, PLANT_STRIDE)}
    bad = {p: (got.get(p), v) for p, v in plant.items()
           if got.get(p) != v}
    report["q2_planted_parts"] = len(plant)
    report["q2_planted_recovered"] = len(plant) - len(bad)
    assert not bad, f"argmin lost planted minima: {list(bad)[:5]}"
    # the tie part must have picked the LOWER suppkey
    assert got[TIE_PART] == (TIE_PART % 997, 1), got[TIE_PART]

    # -- moving sum: sampled users replayed locally ------------------
    t0 = time.perf_counter()
    mov = q_events_moving_sum(ev_dir)
    report["moving_sum_wall_s"] = round(time.perf_counter() - t0, 2)
    ev = pq.read_table(os.path.join(ev_dir, "events.parquet"))
    uid = ev["user_id"].to_numpy()
    rng = np.random.default_rng(23)
    sample = rng.choice(np.unique(uid), 20, replace=False)
    got_map = {}
    mu = mov["user_id"].to_numpy()
    keep = np.isin(mu, sample)
    for eid, m in zip(mov["event_id"].to_numpy()[keep],
                      mov["moving_cents"].to_numpy()[keep]):
        got_map[int(eid)] = int(m)
    checked = 0
    for u in sample.tolist():
        rows = ev.filter(pa.array(uid == u))
        order = np.lexsort((rows["event_id"].to_numpy(),
                            rows["ts"].to_numpy().astype(np.int64)))
        cents = np.round(rows["value"].to_numpy() * 100).astype(
            np.int64)[order]
        eids = rows["event_id"].to_numpy()[order]
        csum = np.cumsum(cents)
        for j, eid in enumerate(eids.tolist()):
            lo = max(0, j - 3)
            want = int(csum[j] - (csum[lo - 1] if lo > 0 else 0))
            assert got_map[int(eid)] == want, (u, eid)
            checked += 1
    report["moving_sum_rows_replayed"] = checked

    # -- co-purchase: planted pair dominates the support ranking -----
    t0 = time.perf_counter()
    pairs = _t(copurchase_pairs_ds(li_dir, min_orders=50))
    report["copurchase_wall_s"] = round(time.perf_counter() - t0, 2)
    top = max(pairs.to_pylist(), key=lambda r: r["n_orders"])
    assert {top["part_a"], top["part_b"]} == {PAIR_A, PAIR_B}, top
    report["copurchase_top_pair_support"] = int(top["n_orders"])
    report["copurchase_pairs_ge50"] = pairs.num_rows

    report["driver_rss_mb_after"] = round(_rss_mb(), 1)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
