"""Seed-range driver for the randomized differential over the CORE
queries.py oracle family (plus temporal/quantiles/textsim dicts):
N random sf-dirs, each oracle pair vs DuckDB under the driver's
canonical compare. Usage: python scripts/queries_random_sweep.py
[--seeds 10] [--start 9000] [--num-cpus 8] [--families core,temporal]
"""

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

_TABLES = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")


def family_pairs(which: set[str]):
    pairs = []
    if "core" in which:
        from sjot_ray.pipelines import queries as Q

        pairs += [(n, Q.ORACLE_SQL[n], getattr(Q, f"q_{n}"))
                  for n in sorted(Q.ORACLE_SQL)]
    if "temporal" in which:
        from sjot_ray.pipelines import temporal as T

        pairs += [(n, T.TEMPORAL_ORACLE_SQL[n], getattr(T, f"q_{n}"))
                  for n in sorted(T.TEMPORAL_ORACLE_SQL)]
    if "quantiles" in which:
        from sjot_ray.pipelines import quantiles as QT

        pairs += [(n, QT.QUANTILES_ORACLE_SQL[n], getattr(QT, f"q_{n}"))
                  for n in sorted(QT.QUANTILES_ORACLE_SQL)]
    if "textsim" in which:
        from sjot_ray.pipelines import textsim as TS

        pairs += [(n, TS.TEXTSIM_ORACLE_SQL[n], getattr(TS, f"q_{n}"))
                  for n in sorted(TS.TEXTSIM_ORACLE_SQL)]
    return pairs


def run_differential(sf: str, pairs) -> list[str]:
    import duckdb

    from test_analytics_random import canon_hash, to_pandas

    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = []
    for name, sql, fn in pairs:
        try:
            got = to_pandas(fn(sf))
            want = con.execute(sql).df()
        except Exception as ex:                     # noqa: BLE001
            failures.append(f"{name}: {type(ex).__name__}: "
                            f"{str(ex)[:120]}")
            continue
        if len(got) != len(want):
            failures.append(f"{name}: rows {len(got)} != {len(want)}")
            continue
        if sorted(got.columns) != sorted(want.columns):
            failures.append(f"{name}: columns {sorted(got.columns)} "
                            f"!= {sorted(want.columns)}")
            continue
        if len(got) and canon_hash(got) != canon_hash(want):
            failures.append(f"{name}: value hash")
    return failures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=10)
    ap.add_argument("--start", type=int, default=9000)
    ap.add_argument("--num-cpus", type=int, default=8)
    ap.add_argument("--families",
                    default="core,temporal,quantiles,textsim")
    ap.add_argument("--reinit", type=int, default=8,
                    help="restart the Ray session every N seeds: a "
                    "long session accumulating hundreds of shuffle "
                    "plans can trip a Ray-core reference-count fatal "
                    "(reference_count.cc:581, observed twice around "
                    "~650 datasets in one session); bounded sessions "
                    "sidestep it")
    args = ap.parse_args()

    import time

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)

    from sjot_ray.sources.randsf import gen_random_sf

    pairs = family_pairs(set(args.families.split(",")))
    bad = {}
    for i, seed in enumerate(range(args.start,
                                   args.start + args.seeds)):
        if args.reinit and i and i % args.reinit == 0:
            ray.shutdown()
            time.sleep(1.5)       # avoid the same-second init race
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False)
        with tempfile.TemporaryDirectory() as td:
            sf = gen_random_sf(os.path.join(td, "sf"), seed)
            failures = run_differential(sf, pairs)
            if failures:
                bad[seed] = failures
            print(f"seed {seed}: "
                  f"{'OK' if not failures else failures}",
                  file=sys.stderr, flush=True)
    print(json.dumps({"seeds": args.seeds, "start": args.start,
                      "families": args.families,
                      "n_pairs": len(pairs), "failing_seeds": bad}))
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
