"""Scale evidence for the pattern-mining operators: plant exact ground
truths inside a large generated corpus and assert the distributed
operators recover them EXACTLY, with driver RSS reported before/after.

Planted truths (all engine-independent, fixed at generation time):

* association rules — parts (111, 222) co-occur in exactly
  ``PLANT_PAIR_ORDERS`` baskets of a multi-million-row lineitem whose
  background baskets draw from a 200K-part space; the planted pair must
  top the support ranking with confidence/lift matching the closed-form
  values computed from the generator's own counters.
* skyline — three planted Pareto points (0.25, 40), (0.5, 70),
  (1.0, 100) dominate a multi-million-point cloud (cloud price ≥ 10,
  size ≤ 100, so (1.0, 100) dominates every cloud point); the exact
  skyline is those three rows, nothing else.
* BFS — a path graph part i — part i+1 (order i) embedded beside
  disjoint background baskets; distance from part 1 is |p − 1| for
  every p within BFS_MAX_HOPS, and nothing else is reached.

Usage: python scripts/mining_scale_check.py [--rows 10000000]
                                            [--num-cpus 16]
Writes the corpora once under /tmp and reuses them.
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

PLANT_PAIR = (111, 222)
PLANT_PAIR_ORDERS = 25_000
BG_PART_SPACE = 200_000
BASKET = 4


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def gen_assoc(out_dir: str, n_rows: int, seed: int = 11) -> dict:
    """lineitem with background baskets of BASKET parts drawn from a
    space ≥ 10·PLANT_PAIR (so the planted ids also occur in background
    rows) plus PLANT_PAIR_ORDERS extra baskets containing exactly the
    planted pair. Returns the generator's own exact counters for the
    closed-form rule check (computed from the written arrays, not from
    the engine under test)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "lineitem.parquet")
    meta_path = os.path.join(out_dir, "truth.json")
    if os.path.exists(meta_path):
        return json.load(open(meta_path))
    rng = np.random.default_rng(seed)
    n_bg_orders = (n_rows - 2 * PLANT_PAIR_ORDERS) // BASKET
    bg_ok = np.repeat(np.arange(n_bg_orders, dtype=np.int64), BASKET)
    bg_pk = rng.integers(0, BG_PART_SPACE,
                         size=n_bg_orders * BASKET).astype(np.int64)
    pl_ok = np.repeat(
        np.arange(n_bg_orders, n_bg_orders + PLANT_PAIR_ORDERS,
                  dtype=np.int64), 2)
    pl_pk = np.tile(np.array(PLANT_PAIR, np.int64), PLANT_PAIR_ORDERS)
    ok = np.concatenate([bg_ok, pl_ok])
    pk = np.concatenate([bg_pk, pl_pk])
    pq.write_table(pa.table({"l_orderkey": pa.array(ok),
                             "l_partkey": pa.array(pk)}), path)
    # exact counters from the written arrays (independent of the engine)
    import pandas as pd

    df = pd.DataFrame({"ok": ok, "pk": pk}).drop_duplicates()
    by_order = df.groupby("ok")["pk"].agg(frozenset)
    a, b = PLANT_PAIR
    s_ab = int(sum((a in s and b in s) for s in by_order))
    n_a = int(df[df.pk == a]["ok"].nunique())
    n_b = int(df[df.pk == b]["ok"].nunique())
    n_orders = int(df["ok"].nunique())
    truth = {"s_ab": s_ab, "n_a": n_a, "n_b": n_b,
             "n_orders": n_orders}
    json.dump(truth, open(meta_path, "w"))
    return truth


def gen_skyline(out_dir: str, n_rows: int, seed: int = 12) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "part.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    price = 10.0 + rng.random(n_rows) * 90.0
    size = rng.integers(1, 101, size=n_rows).astype(np.int32)
    keys = np.arange(10, 10 + n_rows, dtype=np.int64)
    planted_k = np.array([1, 2, 3], np.int64)
    planted_p = np.array([0.25, 0.5, 1.0])
    planted_s = np.array([40, 70, 100], np.int32)
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.concatenate([planted_k, keys])),
        "p_retailprice": pa.array(np.concatenate([planted_p, price])),
        "p_size": pa.array(np.concatenate([planted_s, size]))}), path)


def gen_bfs(out_dir: str, n_rows: int, seed: int = 13) -> None:
    """Path graph: order i joins parts (i, i+1) for i in 0..n_path;
    background baskets use a disjoint part space ≥ 10^9."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "lineitem.parquet")
    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    n_path = 50_000
    p_ok = np.repeat(np.arange(n_path, dtype=np.int64), 2)
    p_pk = np.empty(2 * n_path, np.int64)
    p_pk[0::2] = np.arange(n_path)
    p_pk[1::2] = np.arange(n_path) + 1
    n_bg_orders = (n_rows - 2 * n_path) // BASKET
    bg_ok = np.repeat(
        np.arange(n_path, n_path + n_bg_orders, dtype=np.int64), BASKET)
    bg_pk = (10 ** 9 + rng.integers(0, BG_PART_SPACE,
                                    size=n_bg_orders * BASKET)
             ).astype(np.int64)
    pq.write_table(pa.table({
        "l_orderkey": pa.array(np.concatenate([p_ok, bg_ok])),
        "l_partkey": pa.array(np.concatenate([p_pk, bg_pk]))}), path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--base", default="/tmp/mining_scale")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    from sjot_ray.pipelines.mining import (
        BFS_MAX_HOPS, q_association_rules, q_copurchase_distance,
        q_skyline_parts)

    report: dict = {"rows": args.rows, "num_cpus": args.num_cpus}

    # -- association rules ------------------------------------------------
    d1 = os.path.join(args.base, f"assoc_{args.rows}")
    truth = gen_assoc(d1, args.rows)
    rss0 = _rss_mb()
    t0 = time.time()
    rules = q_association_rules(d1)
    dt = time.time() - t0
    idx = int(np.argmax(rules["n_orders"].to_numpy(
        zero_copy_only=False)))
    top = {c: rules[c][idx].as_py() for c in rules.column_names}
    a, b = PLANT_PAIR
    exp_conf_ab = round(truth["s_ab"] * 1.0 / truth["n_a"], 6)
    exp_conf_ba = round(truth["s_ab"] * 1.0 / truth["n_b"], 6)
    exp_lift = round((truth["s_ab"] * 1.0 * truth["n_orders"])
                     / (truth["n_a"] * truth["n_b"]), 6)
    ok_assoc = (top["part_a"], top["part_b"]) == (a, b) \
        and top["n_orders"] == truth["s_ab"] \
        and top["n_a"] == truth["n_a"] and top["n_b"] == truth["n_b"] \
        and top["conf_ab"] == exp_conf_ab \
        and top["conf_ba"] == exp_conf_ba and top["lift"] == exp_lift
    report["association_rules"] = {
        "wall_sec": round(dt, 1), "rules_found": rules.num_rows,
        "top_pair": [top["part_a"], top["part_b"]],
        "planted_support": truth["s_ab"],
        "recovered_support": top["n_orders"],
        "conf_lift_exact": bool(ok_assoc),
        "rss_mb_before": round(rss0), "rss_mb_after": round(_rss_mb())}
    assert ok_assoc, (top, truth)

    # -- skyline -----------------------------------------------------------
    d2 = os.path.join(args.base, f"skyline_{args.rows}")
    gen_skyline(d2, args.rows)
    t0 = time.time()
    sky = q_skyline_parts(d2)
    dt = time.time() - t0
    got = sky["p_partkey"].to_pylist()
    report["skyline_parts"] = {
        "wall_sec": round(dt, 1), "skyline_rows": sky.num_rows,
        "exact_planted_frontier": got == [1, 2, 3],
        "rss_mb_after": round(_rss_mb())}
    assert got == [1, 2, 3], got

    # -- BFS ---------------------------------------------------------------
    d3 = os.path.join(args.base, f"bfs_{args.rows}")
    gen_bfs(d3, args.rows)
    t0 = time.time()
    dist = q_copurchase_distance(d3)
    dt = time.time() - t0
    got_d = dict(zip(dist["part"].to_pylist(),
                     dist["dist"].to_pylist()))
    # path 0—1—2—…: from seed 1, part 0 is one hop, part 1+k is k hops
    exp_d = {1: 0, 0: 1}
    exp_d.update({1 + k: k for k in range(1, BFS_MAX_HOPS + 1)})
    report["copurchase_distance"] = {
        "wall_sec": round(dt, 1), "reached": dist.num_rows,
        "exact_path_distances": got_d == exp_d,
        "rss_mb_after": round(_rss_mb())}
    assert got_d == exp_d, (got_d, exp_d)

    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
