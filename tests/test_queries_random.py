"""Randomized differential certification of the CORE query family
(queries.py ORACLE_SQL + temporal/quantiles/textsim dicts): seeded
random sf-dirs — tiny groups, dangling custkeys/orderkeys, intra-day
timestamps, survivor-free filters — vs DuckDB under the driver's
canonical compare. One seed in-suite (the full 73-pair pass costs
~60 s); scripts/queries_random_sweep.py runs arbitrarily many. This
family's first sweep caught four real frailties: broadcast joins kept
the NULL (dangling-key) group an INNER join drops, the Q3 top-k crashed
on an empty join result, three filter-all ops collected schema-less
tables, and the range join truncated to days while the oracle compares
microsecond timestamps."""

import pytest

from sjot_ray.sources.randsf import gen_random_sf


@pytest.mark.parametrize("seed", [9000])
def test_queries_random_differential(ray_session, tmp_path, seed):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "queries_random_sweep",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "queries_random_sweep.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    pairs = mod.family_pairs({"core", "temporal", "quantiles",
                              "textsim"})
    sf = gen_random_sf(str(tmp_path / f"sf_{seed}"), seed)
    failures = mod.run_differential(sf, pairs)
    assert not failures, failures
