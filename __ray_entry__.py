"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in sjot_ray) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()`` — flagship pipeline at smoke scale: deterministic interleaved
  corpus → actor-pool columnar SJOT validation → verdict + violation
  columns (Dataset).
* ``queries()`` — one entry per implemented operator/pipeline
  (SURVEY.md §2); each callable takes ``sf_dir``.
* ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset;
  sketch/sampling/inference pipelines are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from sjot_ray.pipelines.flagship import read_corpus, validated

    ds = validated(read_corpus(2_000, seed=42), batch_size=1024)
    # materialize the small smoke result so schema/row-count are stable
    return ds.materialize()


def _flagship_summary(sf_dir: str):
    """Flagship interleaved-corpus validation summary, corpus size scaled
    off the sf's events row count (deterministic seed 42)."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.flagship import read_corpus, validated, verdict_summary

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_docs = max(2_000, 2 * n_events)
    summary = verdict_summary(validated(read_corpus(num_docs, seed=42)))
    import pyarrow as pa

    return pa.Table.from_pandas(summary)


def _flagship_violations(sf_dir: str):
    """ALL violation rows of the flagship corpus in the reference
    diagnostic format (doc_id, datapath, typepath, what, value_repr) —
    oracle-checked against the generator's planted-violation sidecar
    (see ``oracle_sql``/``_ensure_violation_sidecars``)."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.flagship import read_corpus, validated, violations

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_docs = max(2_000, 2 * n_events)
    v = violations(validated(read_corpus(num_docs, seed=42)))
    cols = ["doc_id", "datapath", "typepath", "what", "value_repr"]
    return v.select_columns(cols).sort("doc_id")


def _dangling_media(sf_dir: str):
    """Referential check on the flagship corpus media refs (Bloom + exact
    broadcast semi-join)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.flagship import read_corpus
    from sjot_ray.pipelines.wide_checks import referential_check
    from sjot_ray.sources.gen import media_catalog

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_docs = max(2_000, 2 * n_events)
    ds = read_corpus(num_docs, seed=42)

    def media_rows(t: pa.Table) -> pa.Table:
        flat = t["spans"].combine_chunks().flatten()
        mr = flat.field("media_ref")
        doc = t["doc_id"].combine_chunks().take(
            __import__("numpy").repeat(
                __import__("numpy").arange(t.num_rows),
                pc.fill_null(pc.list_value_length(t["spans"]), 0)
                .to_numpy(zero_copy_only=False).astype("int64")))
        tb = pa.table({"doc_id": doc, "media_ref": mr})
        return tb.filter(pc.is_valid(mr))

    refs = ds.map_batches(media_rows, batch_format="pyarrow",
                          zero_copy_batch=True)
    dangling = referential_check(refs, "media_ref", media_catalog())
    return dangling.groupby("media_ref").count()


def queries() -> dict[str, Callable[[str], Any]]:
    from sjot_ray.pipelines import queries as Q

    d: dict[str, Callable[[str], Any]] = {
        name: getattr(Q, f"q_{name}") for name in Q.ORACLE_SQL
    }
    # non-SQL-expressible pipelines (rows-only checks)
    d["ann_ivf_topk"] = Q.q_ann_ivf_topk
    try:
        from sjot_ray.pipelines.ivf import (q_ann_ivf_fullprobe,
                                            q_ann_ivf_partitioned)

        d["ann_ivf_partitioned"] = q_ann_ivf_partitioned
        d["ann_ivf_fullprobe"] = q_ann_ivf_fullprobe
    except ImportError:
        pass
    d["flagship_interleaved"] = _flagship_summary
    d["sample_documents"] = Q.q_sample_documents
    d["flagship_violations"] = _flagship_violations
    d["flagship_dangling_media"] = _dangling_media
    try:
        from sjot_ray.pipelines import dedup as D

        d["dedup_minhash_lsh"] = D.q_minhash_near_dups
        d["dedup_groups"] = D.q_dedup_groups
        d["dedup_simhash"] = D.q_simhash_near_dups
        d["dedup_embedding_cosine"] = D.q_embedding_near_dups
        # dedup_ngram_jaccard is oracle-checked via queries.ORACLE_SQL
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import textsim as TS

        d["edit_distance_pairs"] = TS.q_edit_distance_pairs
        d["heavy_hitter_tokens"] = TS.q_heavy_hitter_tokens
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import infer as I

        d["infer_schema_events"] = I.q_infer_events_props
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import temporal as T

        d["asof_purchase_click"] = T.q_asof_purchase_click
        d["events_window"] = T.q_events_window
        d["events_rank"] = T.q_events_rank
        d["order_shipments_window"] = T.q_order_shipments_window
        d["latest_event_per_user"] = T.q_latest_event_per_user
        d["funnel_view_click_purchase"] = T.q_funnel_view_click_purchase
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import quantiles as QT

        d["quantiles_lineitem_price"] = QT.q_quantiles_lineitem_price
        d["quantiles_price_by_flag"] = QT.q_quantiles_price_by_flag
        d["quantile_cont_price"] = QT.q_quantile_cont_price
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import drift as DR

        d["drift_lineitem_price"] = DR.q_drift_lineitem_price
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import multimodal as MM

        d["multimodal_media_meta"] = MM.q_media_meta
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import analytics as AN

        for name in AN.ANALYTICS_ORACLE_SQL:
            d[name] = getattr(AN, f"q_{name}")
    except ImportError:
        pass
    try:
        from sjot_ray.pipelines import mining as MN

        for name in MN.MINING_ORACLE_SQL:
            d[name] = getattr(MN, f"q_{name}")
    except ImportError:
        pass
    return d


def _ensure_violation_sidecars() -> None:
    """Write the oracle sidecar parquets for every sf dir: planted
    flagship violations (sjot_ray/sources/gen.py `_CLASS_TEMPLATES`,
    node-oracle-verified in tests), planted media metadata
    (multimodal.media_params, fixed before any encode), the generator's
    dangling-media decisions, and the brute-force pair specs (SimHash /
    MinHash-LSH-Jaccard / plane-LSH-cosine independent scans) plus the
    union-find groups derived from them — all engine-independent ground
    truths DuckDB can join."""
    import glob
    import os

    import pyarrow.parquet as pq

    from sjot_ray.sources.gen import expected_violations_parquet
    from sjot_ray.sources.sidecars import (expected_dangling_parquet,
                                           expected_embedding_parquet,
                                           expected_groups_parquet,
                                           expected_media_meta_parquet,
                                           expected_minhash_parquet,
                                           expected_simhash_parquet)

    for d in sorted(glob.glob("/root/testdata/sf*")):
        ev = os.path.join(d, "events.parquet")
        if os.path.exists(ev):
            n_events = pq.read_metadata(ev).num_rows
            expected_violations_parquet(max(2_000, 2 * n_events), 42)
            expected_dangling_parquet(max(2_000, 2 * n_events), 42)
            expected_media_meta_parquet(
                min(20_000, max(2_000, 2 * n_events)), 42)
        dp = os.path.join(d, "documents.parquet")
        if os.path.exists(dp):
            expected_simhash_parquet(dp, radius=3)
            expected_minhash_parquet(dp)
            expected_groups_parquet(dp)
        ep = os.path.join(d, "embeddings.parquet")
        if os.path.exists(ep):
            expected_embedding_parquet(ep)


def oracle_sql() -> dict[str, str]:
    from sjot_ray.pipelines.quantiles import QUANTILES_ORACLE_SQL
    from sjot_ray.pipelines.queries import ORACLE_SQL
    from sjot_ray.pipelines.temporal import TEMPORAL_ORACLE_SQL

    d = dict(ORACLE_SQL)
    d.update(TEMPORAL_ORACLE_SQL)
    d.update(QUANTILES_ORACLE_SQL)
    from sjot_ray.pipelines.textsim import TEXTSIM_ORACLE_SQL

    d.update(TEXTSIM_ORACLE_SQL)
    from sjot_ray.pipelines.analytics import ANALYTICS_ORACLE_SQL

    d.update(ANALYTICS_ORACLE_SQL)
    from sjot_ray.pipelines.mining import MINING_ORACLE_SQL

    d.update(MINING_ORACLE_SQL)
    # full-probe IVF must reproduce the exact brute-force ranking, so it
    # shares the ann_cosine_topk oracle (full-probe ≡ exact, tests/test_ivf.py)
    d["ann_ivf_fullprobe"] = d["ann_cosine_topk"]
    _ensure_violation_sidecars()
    d["flagship_violations"] = """
        SELECT doc_id, datapath, typepath, what, value_repr
        FROM read_parquet(
            '/tmp/sjot_ray_corpus/expected_violations_v2_n*_s42.parquet')
        WHERE num_docs = greatest(2000, 2 * (SELECT count(*) FROM events))
        ORDER BY doc_id
    """
    # flagship summary: per-rule doc counts from the planted-violation
    # sidecar + the PASS row (corpus size minus violating docs)
    d["flagship_interleaved"] = """
        WITH sz AS (SELECT greatest(2000, 2 * (SELECT count(*) FROM events))
                    AS nd),
             v AS (SELECT rule, count(*) AS n
                   FROM read_parquet(
              '/tmp/sjot_ray_corpus/expected_violations_v2_n*_s42.parquet')
                   WHERE num_docs = (SELECT nd FROM sz)
                   GROUP BY rule)
        SELECT rule, CAST(n AS BIGINT) AS n FROM v
        UNION ALL
        SELECT 'PASS' AS rule,
               CAST((SELECT nd FROM sz) - (SELECT sum(n) FROM v)
                    AS BIGINT) AS n
        ORDER BY rule
    """
    d["flagship_dangling_media"] = """
        SELECT media_ref, n AS "count()"
        FROM read_parquet(
            '/tmp/sjot_ray_corpus/expected_dangling_n*_s42.parquet')
        WHERE num_docs = greatest(2000, 2 * (SELECT count(*) FROM events))
    """
    d["dedup_minhash_lsh"] = """
        SELECT id_a, id_b, jaccard
        FROM read_parquet('/tmp/sjot_ray_corpus/expected_minhash_k*.parquet')
        WHERE corpus_key = (SELECT sum(doc_id * 1000003 + n_chars)
                            FROM documents)
    """
    d["dedup_groups"] = """
        SELECT doc_id, group_id, keep
        FROM read_parquet('/tmp/sjot_ray_corpus/expected_groups_k*.parquet')
        WHERE corpus_key = (SELECT sum(doc_id * 1000003 + n_chars)
                            FROM documents)
    """
    d["dedup_embedding_cosine"] = """
        SELECT id_a, id_b, cosine
        FROM read_parquet('/tmp/sjot_ray_corpus/expected_embcos_k*.parquet')
        WHERE corpus_key = (SELECT sum(vec_id * 1000003 + label * 7919)
                            FROM embeddings)
    """
    d["multimodal_media_meta"] = """
        SELECT kind, max(width) AS max_width,
               max(duration_s) AS max_duration
        FROM read_parquet(
            '/tmp/sjot_ray_corpus/expected_media_meta_n*_s42.parquet')
        WHERE num_docs = least(20000,
                               greatest(2000, 2 * (SELECT count(*) FROM events)))
        GROUP BY kind
    """
    d["dedup_simhash"] = """
        SELECT id_a, id_b, hamming
        FROM read_parquet(
            '/tmp/sjot_ray_corpus/expected_simhash_k*_r3.parquet')
        WHERE corpus_key = (SELECT sum(doc_id * 1000003 + n_chars)
                            FROM documents)
    """
    return d
