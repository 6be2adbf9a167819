"""Seed-range driver for the randomized mining differential
(tests/test_mining_random.py): N random sf-dirs, every
MINING_ORACLE_SQL pair vs DuckDB under the driver's canonical compare.
Usage: python scripts/mining_random_sweep.py [--seeds 20]
[--start 5000] [--num-cpus 8]"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--start", type=int, default=5000)
    ap.add_argument("--num-cpus", type=int, default=8)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    from test_mining_random import run_differential

    from sjot_ray.sources.randsf import gen_random_sf

    bad = {}
    for seed in range(args.start, args.start + args.seeds):
        with tempfile.TemporaryDirectory() as td:
            sf = gen_random_sf(os.path.join(td, "sf"), seed)
            failures = run_differential(sf)
            if failures:
                bad[seed] = failures
            print(f"seed {seed}: "
                  f"{'OK' if not failures else failures}",
                  file=sys.stderr)
    print(json.dumps({"seeds": args.seeds, "start": args.start,
                      "failing_seeds": bad}))
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
