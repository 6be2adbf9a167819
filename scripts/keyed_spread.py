"""Run-to-run spread of the six KEYED (shuffle-bearing) benchmark
queries — the r4 noise-story pin (r4 VERDICT "next" #7): one warmed Ray
session, K timed runs per query, per-query min/median/max printed as one
JSON line and recorded as a dated table in BASELINE.md.

Usage: python scripts/keyed_spread.py [--reps K] [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

KEYED = ("q1_lineitem", "events_hourly", "dedup_exact",
         "uniqueness_events_user", "order_lineitem_join",
         "user_sessions_salted")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 6
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args = [a for a in args if a != str(reps)]
    sf_dir = args[0] if args else os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from sjot_ray.pipelines import queries as Q

    out: dict = {"sf": sf_dir, "num_cpus": ncpu, "reps": reps,
                 "queries": {}}
    for name in KEYED:
        fn = getattr(Q, f"q_{name}")
        fn(sf_dir)  # warm (worker pool, parquet readers, shuffle pool)
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn(sf_dir)
            samples.append(round(time.time() - t0, 3))
        out["queries"][name] = {
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
            "max": max(samples),
        }
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
