"""Randomized differential certification of the pattern-mining family:
seeded random sf-dirs (sjot_ray/sources/randsf.py — tiny groups,
dangling keys, empty filter matches, sub-threshold supports) vs every
MINING_ORACLE_SQL twin under the driver's canonical compare. Two seeds
in-suite; scripts/mining_random_sweep.py runs arbitrarily many."""

import os
import sys

import pyarrow as pa  # noqa: F401 (re-exported compare helpers use it)
import pytest

from sjot_ray.sources.randsf import gen_random_sf

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_analytics_random import canon_hash, to_pandas  # noqa: E402

_TABLES = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")


def run_differential(sf: str) -> list[str]:
    import duckdb

    from sjot_ray.pipelines import mining as M

    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    failures = []
    for name, sql in sorted(M.MINING_ORACLE_SQL.items()):
        got = to_pandas(getattr(M, f"q_{name}")(sf))
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


@pytest.mark.parametrize("seed", [303, 404])
def test_mining_random_differential(ray_session, tmp_path, seed):
    sf = gen_random_sf(str(tmp_path / f"sf_{seed}"), seed)
    failures = run_differential(sf)
    assert not failures, failures
