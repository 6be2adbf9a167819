"""Local simulation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin on the same sf dir,
compare row count + schema + order-insensitive value hash.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def canon(df):
    """Order-insensitive canonical form: sort columns by name, sort rows,
    stringify with float rounding."""
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def value_hash(df) -> str:
    return hashlib.sha256(
        canon(df).to_csv(index=False).encode()).hexdigest()[:16]


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events"
              " documents embeddings").split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    oracles = E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback

            traceback.print_exc()
            fails.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok   {name}: rows={len(ours)} (rows-only) {dt:.1f}s")
            continue
        try:
            ref = con.sql(oracles[name]).df()
        except Exception as e:
            fails.append(name)
            print(f"FAIL {name}: oracle raised {e}")
            continue
        problems = []
        if len(ours) != len(ref):
            problems.append(f"rows {len(ours)} vs {len(ref)}")
        if sorted(map(str.lower, ours.columns)) != \
                sorted(map(str.lower, ref.columns)):
            problems.append(f"cols {sorted(ours.columns)} vs"
                            f" {sorted(ref.columns)}")
        elif value_hash(ours) != value_hash(ref):
            problems.append("value hash")
            a, b = canon(ours), canon(ref)
            neq = (a != b) & ~(a.isna() & b.isna())
            if neq.any().any() and len(a) == len(b):
                rows = neq.any(axis=1)
                print("  first diffs:\n", a[rows].head(3), "\n  vs\n",
                      b[rows].head(3))
        if problems:
            fails.append(name)
            print(f"FAIL {name}: {', '.join(problems)} {dt:.1f}s")
        else:
            print(f"ok   {name}: rows={len(ours)} hash match {dt:.1f}s")

    print(f"\n{len(fails)} failures: {fails}")
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
