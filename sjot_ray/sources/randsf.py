"""Randomized small sf-dir generator for differential certification:
writes the ten driver tables with the SAME value domains as
/root/testdata (segment / priority / nation / brand / type / event-type
vocabularies, 2-decimal money, integer-valued quantities, µs
timestamps) at seeded-random small sizes — including the degenerate
shapes the fixed testdata never produces (tiny groups, dangling keys,
empty filter matches, single-part baskets). Used by
tests/test_analytics_random.py and scripts/analytics_random_sweep.py
to differentially certify every analytics oracle pair on inputs the
operators were not written against."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["de", "en", "es", "fr", "ja"]
BRANDS = [f"Brand#{i}" for i in range(20)]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
ADJS = ["red", "blue", "hot", "small", "big"]
NOUNS = ["widget", "bolt", "gear", "ring", "gizmo"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
WORDS = ["the", "table", "row", "scan", "fast", "slow", "key", "agg",
         "batch", "part", "value", "merge", "data", "a", "big",
         # the BM25 fixed-query vocabulary, so q_bm25_docs is
         # non-vacuous on random corpora
         "hash", "join", "stream"]


def _money(rng, n, lo=1.0, hi=100_000.0):
    return np.round(rng.uniform(lo, hi, n), 2)


def gen_random_sf(out_dir: str, seed: int) -> str:
    """Write all ten tables under ``out_dir`` and return it."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    pq.write_table(pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(REGIONS)}),
        os.path.join(out_dir, "region.parquet"))

    pq.write_table(pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(
            rng.integers(0, 5, 25).astype(np.int32))}),
        os.path.join(out_dir, "nation.parquet"))

    n_cust = int(rng.integers(3, 40))
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(n_cust)]),
        "c_nationkey": pa.array(
            rng.integers(0, 25, n_cust).astype(np.int32)),
        "c_acctbal": pa.array(_money(rng, n_cust, -999.0, 9999.0)),
        "c_mktsegment": pa.array(
            rng.choice(SEGMENTS, n_cust).tolist())}),
        os.path.join(out_dir, "customer.parquet"))

    n_supp = int(rng.integers(2, 15))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}"
                            for i in range(1, n_supp + 1)]),
        "s_nationkey": pa.array(
            rng.integers(0, 25, n_supp).astype(np.int32)),
        "s_acctbal": pa.array(_money(rng, n_supp, -99.0, 999.0))}),
        os.path.join(out_dir, "supplier.parquet"))

    n_part = int(rng.integers(3, 30))
    pq.write_table(pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": pa.array([
            f"{rng.choice(ADJS)} {rng.choice(NOUNS)}"
            for _ in range(n_part)]),
        "p_brand": pa.array(rng.choice(BRANDS, n_part).tolist()),
        "p_type": pa.array(rng.choice(PTYPES, n_part).tolist()),
        "p_size": pa.array(rng.integers(1, 51, n_part)
                           .astype(np.int32)),
        "p_retailprice": pa.array(_money(rng, n_part, 900, 2000))}),
        os.path.join(out_dir, "part.parquet"))

    n_ord = int(rng.integers(5, 80))
    base95 = np.datetime64("1995-01-01", "us").astype(np.int64)
    span = np.int64(6.5 * 365 * 86_400_000_000)
    ocust = rng.integers(1, n_cust + 1, n_ord)
    ocust[rng.random(n_ord) < 0.05] = 99_999          # dangling refs
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(ocust.astype(np.int64)),
        "o_orderstatus": pa.array(
            rng.choice(["F", "O", "P"], n_ord).tolist()),
        "o_totalprice": pa.array(_money(rng, n_ord, 900, 500_000)),
        "o_orderdate": pa.array(
            (base95 + rng.integers(0, span, n_ord))
            .view("datetime64[us]")),
        "o_orderpriority": pa.array(
            rng.choice(PRIORITIES, n_ord).tolist())}),
        os.path.join(out_dir, "orders.parquet"))

    n_li = int(rng.integers(10, 200))
    lok = rng.integers(1, n_ord + 1, n_li)
    lok[rng.random(n_li) < 0.03] = 88_888             # dangling orders
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok.astype(np.int64)),
        "l_partkey": pa.array(
            rng.integers(1, n_part + 1, n_li).astype(np.int64)),
        "l_suppkey": pa.array(
            rng.integers(1, n_supp + 1, n_li).astype(np.int64)),
        "l_linenumber": pa.array(
            rng.integers(1, 8, n_li).astype(np.int32)),
        "l_quantity": pa.array(
            rng.integers(1, 51, n_li).astype(np.float64)),
        "l_extendedprice": pa.array(_money(rng, n_li)),
        "l_discount": pa.array(
            np.round(rng.uniform(0, 0.1, n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n_li), 2)),
        "l_returnflag": pa.array(
            rng.choice(["A", "N", "R"], n_li).tolist()),
        "l_linestatus": pa.array(
            rng.choice(["F", "O"], n_li).tolist()),
        "l_shipdate": pa.array(
            (base95 + rng.integers(0, span, n_li))
            .view("datetime64[us]"))}),
        os.path.join(out_dir, "lineitem.parquet"))

    n_ev = int(rng.integers(10, 120))
    base24 = np.datetime64("2024-01-01", "us").astype(np.int64)
    k = rng.integers(-50, 200, n_ev)
    props = [f'{{"k": {int(v)}}}' if rng.random() > 0.1
             else '{"other": 1}' for v in k]
    pq.write_table(pa.table({
        "event_id": pa.array(range(1, n_ev + 1), pa.int64()),
        "ts": pa.array(
            (base24 + rng.integers(0, np.int64(60) * 86_400_000_000,
                                   n_ev)).view("datetime64[us]")),
        "user_id": pa.array(
            rng.integers(1, 11, n_ev).astype(np.int64)),
        "event_type": pa.array(
            rng.choice(EVENT_TYPES, n_ev).tolist()),
        "value": pa.array(np.round(rng.uniform(0, 1000, n_ev), 2)),
        "props": pa.array(props)}),
        os.path.join(out_dir, "events.parquet"))

    n_doc = int(rng.integers(3, 40))
    texts = [" ".join(rng.choice(WORDS,
                                 int(rng.integers(3, 80))).tolist())
             for _ in range(n_doc)]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n_doc + 1), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(LANGS, n_doc).tolist()),
        "source": pa.array(
            [f"src{int(i)}" for i in rng.integers(0, 20, n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
        os.path.join(out_dir, "documents.parquet"))

    n_emb = int(rng.integers(2, 30))
    dim = 8
    pq.write_table(pa.table({
        "vec_id": pa.array(range(1, n_emb + 1), pa.int64()),
        "embedding": pa.array(
            rng.normal(0, 1, (n_emb, dim)).astype(np.float32)
            .tolist(), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 4, n_emb)
                          .astype(np.int32))}),
        os.path.join(out_dir, "embeddings.parquet"))
    return out_dir
