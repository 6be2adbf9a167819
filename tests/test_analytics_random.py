"""Randomized differential certification of the whole analytics
family: generate seeded random sf-dirs (sjot_ray/sources/randsf.py —
same value domains as the driver's testdata, but with tiny groups,
dangling keys and empty filter matches the fixed corpora never
produce) and assert every ANALYTICS_ORACLE_SQL pair matches DuckDB
under the driver's canonical compare (sorted columns, sorted rows,
floats rounded to 6). Two seeds in-suite; scripts/
analytics_random_sweep.py runs arbitrarily many."""

import hashlib
import os

import pyarrow as pa
import pytest

from sjot_ray.sources.randsf import gen_random_sf

_TABLES = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")


def canon_hash(df) -> str:
    """The driver's order-insensitive compare: sort columns by name,
    round floats to 6, stringify timestamps, sort rows, hash CSV."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.sha256(
        df.to_csv(index=False).encode()).hexdigest()[:16]


def to_pandas(res):
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pa.concat_tables(list(res.iter_batches(
        batch_format="pyarrow", batch_size=None))).to_pandas()


def run_differential(sf: str) -> list[str]:
    import duckdb

    from sjot_ray.pipelines import analytics as A

    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = []
    for name, sql in sorted(A.ANALYTICS_ORACLE_SQL.items()):
        got = to_pandas(getattr(A, f"q_{name}")(sf))
        want = con.execute(sql).df()
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


@pytest.mark.parametrize("seed", [101, 202])
def test_analytics_random_differential(ray_session, tmp_path, seed):
    sf = gen_random_sf(str(tmp_path / f"sf_{seed}"), seed)
    failures = run_differential(sf)
    assert not failures, failures
