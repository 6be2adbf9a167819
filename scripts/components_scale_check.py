"""Scale evidence for the distributed connected components: label a
random 10^6-edge graph (one giant component) via min-label propagation
over the manual hash shuffle and report wall time, rounds-bounded
convergence and driver RSS. The point (r2 VERDICT #4): grouping no
longer runs a driver-side union-find over the edge list — edges, labels
and messages stay in the object store; the driver holds refs and one
change counter per round.

Usage: python scripts/components_scale_check.py [--edges 1000000]
       [--nodes 200000] [--num-cpus 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--edges", type=int, default=1_000_000)
    ap.add_argument("--nodes", type=int, default=200_000)
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from sjot_ray.pipelines.components import near_dup_groups_distributed

    rng = np.random.default_rng(1)
    src = rng.integers(0, args.nodes, args.edges)
    dst = rng.integers(0, args.nodes, args.edges)
    edges = pa.table({
        "id_a": pa.array(np.minimum(src, dst), pa.int64()),
        "id_b": pa.array(np.maximum(src, dst) + 1, pa.int64())})
    rss0 = _rss_mb()
    t0 = time.time()
    # real-run contract: the decision table is WRITTEN, not collected —
    # the driver only ever holds refs, per-round change counts, and the
    # (tiny) per-block distinct-group summaries below
    out_path = "/tmp/components_scale_check_labels"
    labels = near_dup_groups_distributed(ray.data.from_arrow(edges),
                                         out_path=out_path)
    n_labeled = labels.count()
    wall = time.time() - t0

    def _distinct_groups(t: pa.Table) -> pa.Table:
        return pa.table({"group_id": pa.array(
            np.unique(t["group_id"].to_numpy(zero_copy_only=False)))})

    per_block = labels.map_batches(_distinct_groups, batch_format="pyarrow")
    groups = len(set(per_block.to_pandas()["group_id"]))
    print(json.dumps({
        "edges": args.edges, "nodes_labeled": n_labeled,
        "components": groups, "wall_sec": round(wall, 2),
        "labels_parquet": out_path,
        "driver_rss_mb_before": round(rss0, 1),
        "driver_rss_mb_after": round(_rss_mb(), 1)}))
    ray.shutdown()


if __name__ == "__main__":
    main()
