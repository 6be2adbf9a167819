"""Planted-data tests for the analytics operator family
(sjot_ray/pipelines/analytics.py): hand-computed expectations for the
behavioral / quality / graph operators, and DuckDB differentials on
planted tables for the statistics and TPC-H shapes (engine-independent:
DuckDB computes its own skewness/kurtosis/regr_* aggregates)."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sjot_ray.pipelines.analytics import (
    ANALYTICS_ORACLE_SQL, _pair_indices, q_copurchase_pairs,
    q_copurchase_triangles, q_entropy_user_by_type, q_event_transitions,
    q_q7_volume_shipping, q_q8_market_share, q_q13_order_distribution,
    q_q17_small_quantity, q_q22_idle_customers, q_quality_filter_docs,
    q_regr_price_on_qty_by_flag, q_retention_weekly,
    q_skew_kurt_price_by_flag)

_TABLES = ("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")


def _duck(sf: str, sql: str) -> pa.Table:
    import duckdb

    con = duckdb.connect()
    for t in _TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetch_arrow_table()


def _ts(*dates):
    return pa.array(np.array(list(dates), dtype="datetime64[us]"))


def test_pair_indices_unit():
    li, ri = _pair_indices(np.array([7, 7, 7, 9, 9, 11]))
    got = sorted(zip(li.tolist(), ri.tolist()))
    assert got == [(0, 1), (0, 2), (1, 2), (3, 4)]
    li, ri = _pair_indices(np.array([], dtype=np.int64))
    assert len(li) == 0 and len(ri) == 0
    li, ri = _pair_indices(np.array([5]))
    assert len(li) == 0


def test_copurchase_planted(ray_session, tmp_path):
    """Known baskets: three pairs at support 2 forming one triangle;
    support-1 pairs die; duplicate (order, part) rows dedup first."""
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [(1, 1), (1, 1), (1, 2), (1, 3),       # basket {1,2,3}
            (2, 1), (2, 2), (2, 3),               # basket {1,2,3} again
            (3, 4), (3, 5),                       # support-1 pair
            (4, 1), (4, 4)]                       # support-1 pair
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        sf / "lineitem.parquet")

    pairs = q_copurchase_pairs(str(sf))
    got = sorted(zip(pairs["part_a"].to_pylist(),
                     pairs["part_b"].to_pylist(),
                     pairs["n_orders"].to_pylist()))
    assert got == [(1, 2, 2), (1, 3, 2), (2, 3, 2)]
    tri = q_copurchase_triangles(str(sf))
    assert tri["n_triangles"].to_pylist() == [1]


def test_event_transitions_planted(ray_session, tmp_path):
    """Per-user ordered bigrams, (ts, event_id) tie-break, no
    cross-user leakage."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "ts": _ts("2024-01-01T00:00:01", "2024-01-01T00:00:02",
                  "2024-01-01T00:00:03", "2024-01-01T00:00:01",
                  "2024-01-01T00:00:02", "2024-01-01T00:00:05",
                  "2024-01-01T00:00:05"),
        "user_id": pa.array([1, 1, 1, 2, 2, 3, 3], pa.int64()),
        "event_type": pa.array(["A", "B", "A", "B", "B", "C", "D"])}),
        sf / "events.parquet")

    out = q_event_transitions(str(sf))
    got = sorted(zip(out["prev_type"].to_pylist(),
                     out["next_type"].to_pylist(),
                     out["n"].to_pylist()))
    # user 3's two events share a ts: event_id orders C before D
    assert got == [("A", "B", 1), ("B", "A", 1), ("B", "B", 1),
                   ("C", "D", 1)]


def test_retention_weekly_planted(ray_session, tmp_path):
    """Two cohorts (2024-01-01 was a Monday), one retained user each;
    a gap week does NOT count as retained."""
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [
        (1, "2024-01-02"), (1, "2024-01-09"),    # cohort 1/1, retained
        (2, "2024-01-03"),                       # cohort 1/1, not
        (3, "2024-01-10"), (3, "2024-01-16"),    # cohort 1/8, retained
        (4, "2024-01-08"), (4, "2024-01-22"),    # cohort 1/8, gap week
    ]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": _ts(*[r[1] + "T12:00:00" for r in rows])}),
        sf / "events.parquet")

    out = q_retention_weekly(str(sf))
    got = {str(c): (u, r) for c, u, r in zip(
        out["cohort"].to_pylist(), out["n_users"].to_pylist(),
        out["n_retained"].to_pylist())}
    assert got == {"2024-01-01 00:00:00": (2, 1),
                   "2024-01-08 00:00:00": (2, 1)}


def test_entropy_planted(ray_session, tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "event_type": pa.array(["X", "X", "X", "Y"]),
        "user_id": pa.array([1, 1, 2, 5], pa.int64())}),
        sf / "events.parquet")

    out = q_entropy_user_by_type(str(sf))
    got = dict(zip(out["event_type"].to_pylist(),
                   out["user_entropy"].to_pylist()))
    expect_x = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert got["Y"] == 0.0
    assert abs(got["X"] - expect_x) < 1e-6


def test_quality_filter_planted(ray_session, tmp_path):
    """One doc passes every rule; each other doc fails exactly one."""
    sf = tmp_path / "sf"
    sf.mkdir()
    good = "abcd " * 20 + "the " + "abcd " * 18 + "abcd"
    assert 100 <= len(good) <= 500 and " the " in good
    too_short = "abcd the abcd"
    no_stop = "abcd " * 39 + "abcd"
    long_words = ("abcdefghij " * 30 + "the " + "abcdefghij " * 9
                  + "abcdefghij")          # mean word length > 6
    few_words = "abcdefgh " * 12 + "the abcdefgh"   # < 30 words
    docs = [good, too_short, no_stop, long_words, few_words]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(docs) + 1), pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * len(docs))}),
        sf / "documents.parquet")

    out = q_quality_filter_docs(str(sf))
    assert out["doc_id"].to_pylist() == [1]
    assert out["n_words"].to_pylist() == [good.count(" ") + 1]

    # zero survivors: every doc fails → typed empty table, not a crash
    # (random-sweep seed 3027 regression)
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([too_short, no_stop]),
        "lang": pa.array(["en", "en"])}),
        sf / "documents.parquet")
    out = q_quality_filter_docs(str(sf))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "lang", "n_words"]


def test_skew_kurt_regr_match_duckdb_planted(ray_session, tmp_path):
    """DuckDB computes its own skewness/kurtosis/regr_* on a planted
    lineitem — an engine-independent check of the shifted-moment
    algebra (formulas, bias corrections, and the shift-invariance)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(11)
    n = 400
    pq.write_table(pa.table({
        "l_returnflag": pa.array(
            np.where(rng.random(n) < 0.5, "A", "B").tolist()),
        "l_quantity": pa.array(
            rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(
            np.round(rng.lognormal(9.5, 0.8, n), 2))}),
        sf / "lineitem.parquet")

    got = q_skew_kurt_price_by_flag(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["skew_kurt_price_by_flag"])
    assert got.to_pylist() == want.to_pylist()

    got = q_regr_price_on_qty_by_flag(str(sf))
    want = _duck(str(sf),
                 ANALYTICS_ORACLE_SQL["regr_price_on_qty_by_flag"])
    assert got.to_pylist() == want.to_pylist()


def test_q13_planted(ray_session, tmp_path):
    """Zero-order customers count at k=0; urgent orders excluded;
    dangling order custkeys dropped (LEFT join from customer)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64())}),
        sf / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 1, 2, 99], pa.int64()),
        "o_orderpriority": pa.array([
            "5-LOW", "5-LOW", "1-URGENT", "2-HIGH", "5-LOW"])}),
        sf / "orders.parquet")

    out = q_q13_order_distribution(str(sf))
    got = dict(zip(out["c_count"].to_pylist(),
                   out["custdist"].to_pylist()))
    assert got == {2: 1, 1: 1, 0: 2}


def test_q22_planted(ray_session, tmp_path):
    """Integer-cents mean threshold over positive balances; urgent-order
    anti-join; negative balances excluded from the mean but eligible
    rows must still exceed it."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "c_mktsegment": pa.array(["A", "A", "B", "B", "B"]),
        "c_acctbal": pa.array([150.0, 50.0, -10.0, 80.0, 200.0])}),
        sf / "customer.parquet")
    # positive cents: 15000+5000+8000+20000 = 48000, n=4 → mean 120.00
    # rich: c1 (150) and c5 (200); c1 has an URGENT order → excluded
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 5, 4], pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "5-LOW", "1-URGENT"])}),
        sf / "orders.parquet")

    out = q_q22_idle_customers(str(sf))
    assert out.to_pylist() == [{"c_mktsegment": "B", "numcust": 1,
                                "totacctbal": 200.0}]


def test_q17_planted(ray_session, tmp_path):
    """Per-part 0.2·avg(qty) threshold: only the one below-threshold
    row of the brand's parts contributes; other brands ignored."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#7", "Brand#9", "Brand#7"])}),
        sf / "part.parquet")
    # part 1: qtys [10,10,10,1] → avg 7.75, thr 1.55 → the qty-1 row
    # part 3: qtys [2,2] → thr 0.8 → none; part 2: not the brand
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 3, 3, 2], pa.int64()),
        "l_quantity": pa.array([10.0, 10.0, 10.0, 1.0, 2.0, 2.0, 1.0]),
        "l_extendedprice": pa.array(
            [5.0, 5.0, 5.0, 700.0, 9.0, 9.0, 11.0])}),
        sf / "lineitem.parquet")

    out = q_q17_small_quantity(str(sf))
    assert out["avg_yearly"].to_pylist() == [100.0]


def test_q7_q8_match_duckdb_planted(ray_session, tmp_path):
    """Planted five-table joins vs DuckDB running the oracle SQL —
    covers the nation-pair mask, the region mask, the pre-shuffle part
    filter, year extraction, and dangling keys falling out."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["AMERICA", "ASIA"])}),
        sf / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2, 3, 4], pa.int32()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3",
                            "NATION_4"]),
        "n_regionkey": pa.array([0, 0, 0, 1], pa.int32())}),
        sf / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_nationkey": pa.array([1, 2, 4], pa.int32())}),
        sf / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([20, 21, 22], pa.int64()),
        "s_nationkey": pa.array([2, 1, 3], pa.int32())}),
        sf / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([30, 31], pa.int64()),
        "p_type": pa.array(["PROMO", "LARGE"])}),
        sf / "part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
        "o_custkey": pa.array([10, 11, 12, 999], pa.int64()),
        "o_orderdate": _ts("1995-03-01", "1996-07-01", "1995-05-01",
                           "1996-01-01")}),
        sf / "orders.parquet")
    rng = np.random.default_rng(5)
    ok = pa.array([100, 100, 101, 101, 102, 103, 555], pa.int64())
    pq.write_table(pa.table({
        "l_orderkey": ok,
        "l_partkey": pa.array([30, 31, 30, 30, 30, 30, 30], pa.int64()),
        "l_suppkey": pa.array([20, 20, 21, 22, 20, 21, 20], pa.int64()),
        "l_shipdate": _ts("1995-04-01", "1995-04-02", "1996-08-01",
                          "1996-08-02", "1995-06-01", "1996-02-01",
                          "1996-02-02"),
        "l_extendedprice": pa.array(
            np.round(rng.uniform(100, 1000, 7), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, 7), 2))}),
        sf / "lineitem.parquet")

    got = q_q7_volume_shipping(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["q7_volume_shipping"])
    assert got.to_pylist() == want.to_pylist()
    assert got.num_rows >= 2            # both directions present

    got = q_q8_market_share(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["q8_market_share"])
    assert got.to_pylist() == want.to_pylist()
    assert got.num_rows >= 2            # both years present


def test_oracle_keys_registered():
    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    for name in ANALYTICS_ORACLE_SQL:
        assert name in q and name in o


def test_mad_planted(ray_session, tmp_path):
    """Odd-count column with a hand-checkable rank-50 median and MAD."""
    sf = tmp_path / "sf"
    sf.mkdir()
    vals = [10.0, 20.0, 30.0, 100.0, 1000.0]
    pq.write_table(pa.table({"l_extendedprice": pa.array(vals)}),
                   sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_mad_lineitem_price

    out = q_mad_lineitem_price(str(sf))
    # rank ceil(50*5/100)=3 → median 30; deviations sorted:
    # [0, 10, 20, 70, 970] → rank 3 → MAD 20
    assert out.to_pylist() == [{"median": 30.0, "mad": 20.0}]


def test_q15_ties_planted(ray_session, tmp_path):
    """Two suppliers tied at the max window revenue both surface;
    out-of-window rows are excluded."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_name": pa.array(["s1", "s2", "s3"])}),
        sf / "supplier.parquet")
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 2, 3, 3], pa.int64()),
        "l_shipdate": _ts("1996-01-10", "1996-02-10", "1996-03-10",
                          "1996-01-20", "1996-06-01"),
        "l_extendedprice": pa.array([100.0, 100.0, 200.0, 200.0,
                                     9999.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_q15_top_supplier

    out = q_q15_top_supplier(str(sf))
    assert out.to_pylist() == [
        {"s_suppkey": 1, "s_name": "s1", "total_cents": 20000},
        {"s_suppkey": 2, "s_name": "s2", "total_cents": 20000},
        {"s_suppkey": 3, "s_name": "s3", "total_cents": 20000}]


def test_q16_distinct_planted(ray_session, tmp_path):
    """Repeat (part, supplier) rows count once; the excluded brand
    vanishes; distinct supplier counts are per (brand, size)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#1", "Brand#4"]),
        "p_size": pa.array([5, 5, 5], pa.int32())}),
        sf / "part.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 7, 8, 9], pa.int64())}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_q16_supplier_variety

    out = q_q16_supplier_variety(str(sf))
    # brand1/size5 sees suppliers {7, 8}; Brand#4 excluded entirely
    assert out.to_pylist() == [
        {"p_brand": "Brand#1", "p_size": 5, "supplier_cnt": 2}]


def test_q11_above_mean_planted(ray_session, tmp_path):
    """Strictly-above-mean selection in integer cents: values 10, 20,
    30 → mean 20 → only part 3 survives (strict >)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 2, 3, 3, 3], pa.int64()),
        "l_extendedprice": pa.array(
            [10.0, 10.0, 10.0, 10.0, 10.0, 10.0])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import (
        q_q11_part_value_concentration)

    out = q_q11_part_value_concentration(str(sf))
    assert out.to_pylist() == [{"p_partkey": 3, "value_cents": 3000}]


def test_q19_arms_planted(ray_session, tmp_path):
    """Each disjunction arm admits its own rows; a row failing all
    arms (right brand, wrong quantity) is excluded."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], pa.int64()),
        "p_brand": pa.array(["Brand#1", "Brand#2", "Brand#3"]),
        "p_size": pa.array([5, 10, 15], pa.int32())}),
        sf / "part.parquet")
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 1], pa.int64()),
        "l_quantity": pa.array([11.0, 10.0, 30.0, 50.0]),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0, 999.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_q19_disjunctive_revenue

    out = q_q19_disjunctive_revenue(str(sf))
    assert out.to_pylist() == [{"revenue": 500.0, "n_lines": 3}]


def test_q9_matches_duckdb_planted(ray_session, tmp_path):
    """Q9 on planted tables vs DuckDB: name-substring part filter,
    supplier-nation grouping, order-year extraction."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2], pa.int32()),
        "n_name": pa.array(["NATION_1", "NATION_2"]),
        "n_regionkey": pa.array([0, 0], pa.int32())}),
        sf / "nation.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([20, 21], pa.int64()),
        "s_nationkey": pa.array([1, 2], pa.int32())}),
        sf / "supplier.parquet")
    pq.write_table(pa.table({
        "p_partkey": pa.array([30, 31], pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"])}),
        sf / "part.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 101], pa.int64()),
        "o_orderdate": _ts("1995-03-01", "1996-07-01")}),
        sf / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 100, 101], pa.int64()),
        "l_partkey": pa.array([30, 31, 30], pa.int64()),
        "l_suppkey": pa.array([20, 20, 21], pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0]),
        "l_discount": pa.array([0.1, 0.0, 0.2])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_q9_product_profit

    got = q_q9_product_profit(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["q9_product_profit"])
    assert got.to_pylist() == want.to_pylist()
    assert got.num_rows == 2      # one (nation, year) row per supplier


def test_q2_argmin_ties_planted(ray_session, tmp_path):
    """Min-cents ties resolve to the lowest suppkey; per-part argmins
    are independent."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "l_suppkey": pa.array([9, 3, 5, 7, 8], pa.int64()),
        "l_extendedprice": pa.array([5.0, 5.0, 6.0, 2.0, 1.5])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_q2_min_cost_supplier

    out = q_q2_min_cost_supplier(str(sf))
    assert out.to_pylist() == [
        {"p_partkey": 1, "s_suppkey": 3, "min_cents": 500},
        {"p_partkey": 2, "s_suppkey": 8, "min_cents": 150}]


def test_solo_supplier_planted(ray_session, tmp_path):
    """Single-supplier orders count per supplier; multi-supplier
    orders and duplicate rows don't."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 7, 7, 8, 9], pa.int64())}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_solo_supplier_orders

    out = q_solo_supplier_orders(str(sf))
    assert out.to_pylist() == [
        {"s_suppkey": 7, "n_solo_orders": 1},
        {"s_suppkey": 9, "n_solo_orders": 1}]


def test_rolling_distinct_planted(ray_session, tmp_path):
    """Trailing-7-day distinct users: only real event days appear;
    a user active twice in the window counts once; day 8 sees only
    the day-8 user (day 1 is outside its window)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [(1, "2024-01-01"), (1, "2024-01-01"), (2, "2024-01-03"),
            (3, "2024-01-08")]
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": _ts(*[r[1] + "T09:00:00" for r in rows])}),
        sf / "events.parquet")

    from sjot_ray.pipelines.analytics import q_rolling_distinct_users

    out = q_rolling_distinct_users(str(sf))
    got = {str(d): n for d, n in zip(out["d"].to_pylist(),
                                     out["users_7d"].to_pylist())}
    # 1/1: {u1}; 1/3: {u1,u2}; 1/8: {u2 (1/3 in window), u3} — u1 aged out
    assert got == {"2024-01-01 00:00:00": 1,
                   "2024-01-03 00:00:00": 2,
                   "2024-01-08 00:00:00": 2}


def test_label_inertia_planted(ray_session, tmp_path):
    """Hand-computed WCSS: label 0 = {(0,0),(2,2)} → centroid (1,1),
    inertia 4; label 1 = one vector → inertia 0."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "embedding": pa.array([[0.0, 0.0], [2.0, 2.0], [5.0, 5.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1], pa.int32())}),
        sf / "embeddings.parquet")

    from sjot_ray.pipelines.analytics import q_label_centroid_inertia

    out = q_label_centroid_inertia(str(sf))
    assert out.to_pylist() == [
        {"label": 0, "n_vectors": 2, "inertia": 4.0},
        {"label": 1, "n_vectors": 1, "inertia": 0.0}]


def test_chi2_matches_duckdb_planted(ray_session, tmp_path):
    """Chi-square vs DuckDB on skewed planted events — includes a
    zero-observed (type, weekday) cell, which the full-grid expected
    formula must still count."""
    sf = tmp_path / "sf"
    sf.mkdir()
    rng = np.random.default_rng(3)
    n = 300
    days = rng.integers(0, 14, n)          # two weeks
    types = np.where(days % 7 < 2, "A", rng.choice(["A", "B"], n))
    base = np.datetime64("2024-01-01T10:00:00", "us")
    pq.write_table(pa.table({
        "ts": pa.array(base + days * np.timedelta64(86400_000_000, "us")),
        "event_type": pa.array(types.tolist())}),
        sf / "events.parquet")

    from sjot_ray.pipelines.analytics import q_chi2_event_weekday

    got = q_chi2_event_weekday(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["chi2_event_weekday"])
    assert got.to_pylist() == want.to_pylist()
    assert got["dof"].to_pylist() == [6]


def test_weighted_sample_matches_duckdb_planted(ray_session, tmp_path):
    """Weighted membership is the documented integer formula — longer
    docs sample more often; zero-length docs never."""
    sf = tmp_path / "sf"
    sf.mkdir()
    n = 500
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array([(i * 37) % 120000 for i in range(n)],
                            pa.int64()),
        "text": pa.array(["x"] * n)}),
        sf / "documents.parquet")

    from sjot_ray.pipelines.analytics import q_weighted_sample_docs

    got = q_weighted_sample_docs(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["weighted_sample_docs"])
    assert got.to_pylist() == want.to_pylist()
    # the formula, replayed in plain python
    expect = [i for i in range(1, n + 1)
              if ((i * 2654435761) % (1 << 32)) % 10000
              < min(10000, (((i - 1) * 37) % 120000) // 10)]
    assert got["doc_id"].to_pylist() == expect
    assert 0 < len(expect) < n


def test_moving_sum_planted(ray_session, tmp_path):
    """ROWS BETWEEN 3 PRECEDING AND CURRENT ROW: the frame truncates at
    each key's start and slides off the 4th-oldest row."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
        "ts": _ts(*[f"2024-01-01T00:00:0{i}" for i in range(1, 7)]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 9.0])}),
        sf / "events.parquet")

    from sjot_ray.pipelines.analytics import q_events_moving_sum

    out = q_events_moving_sum(str(sf))
    assert out["moving_cents"].to_pylist() == [
        100, 300, 600, 1000, 1400, 900]
    # row 5: 2+3+4+5 (row 1 slid out); row 6: new key


def test_equidepth_histogram_planted(ray_session, tmp_path):
    """Eight distinct values → exact quartile edges at ranks 2/4/6 and
    half-open buckets of sizes 2/2/2/2."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "l_extendedprice": pa.array(
            [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_equidepth_histogram_price

    out = q_equidepth_histogram_price(str(sf))
    assert out.to_pylist() == [
        {"bucket": 0, "n_rows": 2}, {"bucket": 1, "n_rows": 2},
        {"bucket": 2, "n_rows": 2}, {"bucket": 3, "n_rows": 2}]


def test_outlier_fence_planted(ray_session, tmp_path):
    """Nine tight values + one far point: exact quartiles at ranks
    3/8, only the planted extreme crosses the Tukey fence."""
    sf = tmp_path / "sf"
    sf.mkdir()
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 15.0, 16.0, 17.0, 18.0,
            1000.0]
    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A"] * 9 + ["B"]),
        "l_extendedprice": pa.array(vals)}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_outlier_fence_price

    out = q_outlier_fence_price(str(sf))
    got = {r["l_returnflag"]: (r["n_rows"], r["n_outliers"])
           for r in out.to_pylist()}
    # q1 = rank ceil(25*10/100)=3 → 12; q3 = rank 8 → 17; IQR 5
    # fences [4.5, 24.5] → only 1000.0 (flag B) is outside
    assert got == {"A": (9, 0), "B": (1, 1)}


def test_reconciliation_planted(ray_session, tmp_path):
    """Exact-match, within-tolerance, mismatch and childless orders
    classify correctly in integer cents."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([100.00, 200.50, 300.00, 50.0])}),
        sf / "orders.parquet")
    # order 1: lines sum exactly 100.00 → match
    # order 2: lines sum 200.00 (off by 0.50 ≤ 1.00) → match
    # order 3: lines sum 100.00 (off by 200) → mismatch
    # order 4: no lines → no_lines
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([60.0, 40.0, 200.0, 100.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0])}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import (
        q_order_total_reconciliation)

    out = q_order_total_reconciliation(str(sf))
    got = {r["status"]: r["n_orders"] for r in out.to_pylist()}
    assert got == {"match": 2, "mismatch": 1, "no_lines": 1}


def test_props_extraction_planted(ray_session, tmp_path):
    """Regex extraction handles negatives, whitespace and malformed
    JSON rows (dropped) — certified against DuckDB's JSON parser."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "b", "b"]),
        "props": pa.array(['{"k": 5}', '{"k":  -7}', '{"k": 100}',
                           '{"other": 1}'])}),
        sf / "events.parquet")

    from sjot_ray.pipelines.analytics import q_props_k_stats

    got = q_props_k_stats(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["props_k_stats"])
    assert got.to_pylist() == want.to_pylist()
    assert got.to_pylist() == [
        {"event_type": "a", "n": 2, "sum_k": -2, "max_k": 5},
        {"event_type": "b", "n": 1, "sum_k": 100, "max_k": 100}]


def test_docs_page2_planted(ray_session, tmp_path):
    """OFFSET pagination returns exactly rows 11-20 of the global
    order with deterministic doc_id ties."""
    sf = tmp_path / "sf"
    sf.mkdir()
    n = 40
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "lang": pa.array(["en"] * n),
        "n_chars": pa.array([(i % 4) * 100 for i in range(n)],
                            pa.int64()),
        "text": pa.array(["x"] * n)}),
        sf / "documents.parquet")

    from sjot_ray.pipelines.analytics import q_docs_page2

    got = q_docs_page2(str(sf))
    want = _duck(str(sf), ANALYTICS_ORACLE_SQL["docs_page2"])
    assert got.to_pylist() == want.to_pylist()
    assert got.num_rows == 10


def test_top_terms_df_planted(ray_session, tmp_path):
    """Document frequency counts distinct DOCS, not occurrences:
    a term repeated in one doc scores 1; ties order by term."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["apple apple apple zoo",
                          "apple berry zoo",
                          "berry cherry"])}),
        sf / "documents.parquet")

    from sjot_ray.pipelines.analytics import q_top_terms_df

    out = q_top_terms_df(str(sf))
    got = list(zip(out["term"].to_pylist(), out["df"].to_pylist()))
    assert got == [("apple", 2), ("berry", 2), ("zoo", 2),
                   ("cherry", 1)]


def test_customer_value_buckets_planted(ray_session, tmp_path):
    """Equi-width integer banding: max spender lands in bucket 9,
    spend aggregates per customer before banding."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 2, 3], pa.int64()),
        "o_totalprice": pa.array([60.0, 40.0, 100.0, 9.0])}),
        sf / "orders.parquet")

    from sjot_ray.pipelines.analytics import q_customer_value_buckets

    out = q_customer_value_buckets(str(sf))
    # totals: c1 10000, c2 10000, c3 900 cents; max 10000
    # buckets: 10000*10//10001 = 9 (both), 900*10//10001 = 0
    assert out.to_pylist() == [
        {"bucket": 0, "n_customers": 1, "sum_cents": 900},
        {"bucket": 9, "n_customers": 2, "sum_cents": 20000}]


def test_pagerank_planted(ray_session, tmp_path):
    """Path graph 1–2–3 from two baskets: three iterations replayed
    with plain scalar arithmetic; the center node dominates and the
    leaves tie exactly."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64()),
        "l_partkey": pa.array([1, 2, 2, 3], pa.int64())}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import q_pagerank_copurchase

    out = q_pagerank_copurchase(str(sf))
    got = dict(zip(out["p_partkey"].to_pylist(),
                   out["score_scaled"].to_pylist()))

    # scalar replay: nodes 1,2,3; edges 1↔2, 2↔3; deg = {1:1, 2:2, 3:1}
    score = {1: 1 / 3, 2: 1 / 3, 3: 1 / 3}
    deg = {1: 1.0, 2: 2.0, 3: 1.0}
    for _ in range(3):
        m = {1: score[2] / deg[2],
             2: score[1] / deg[1] + score[3] / deg[3],
             3: score[2] / deg[2]}
        score = {k: 0.15 / 3 + 0.85 * m[k] for k in score}
    want = {k: round(v * 3, 6) for k, v in score.items()}
    assert got == want
    assert got[1] == got[3] and got[2] > got[1]


def test_stats_degenerate_groups_match_duckdb(ray_session, tmp_path):
    """Degenerate groups (n=1/2/3, zero variance, constant regressand)
    produce the SAME nulls/values DuckDB does."""
    sf = tmp_path / "sf"
    sf.mkdir()
    flags, qty, price = [], [], []

    def add(f, rows):
        for q, p in rows:
            flags.append(f)
            qty.append(q)
            price.append(p)

    add("n1", [(3.0, 10.0)])
    add("n2", [(1.0, 10.0), (2.0, 20.0)])
    add("n3", [(1.0, 10.0), (2.0, 20.0), (3.0, 40.0)])
    add("cp", [(1.0, 7.0), (2.0, 7.0), (3.0, 7.0), (4.0, 7.0),
               (5.0, 7.0)])                      # constant price
    add("cq", [(4.0, 1.0), (4.0, 2.0), (4.0, 5.0), (4.0, 9.0)])
    add("ok", [(1.0, 5.0), (2.0, 9.0), (3.0, 14.0), (4.0, 30.0),
               (5.0, 31.0)])
    pq.write_table(pa.table({
        "l_returnflag": pa.array(flags),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price)}),
        sf / "lineitem.parquet")

    from sjot_ray.pipelines.analytics import (
        q_regr_price_on_qty_by_flag, q_skew_kurt_price_by_flag)

    got = q_skew_kurt_price_by_flag(str(sf))
    want = _duck(str(sf),
                 ANALYTICS_ORACLE_SQL["skew_kurt_price_by_flag"])
    assert got.to_pylist() == want.to_pylist()

    got = q_regr_price_on_qty_by_flag(str(sf))
    want = _duck(str(sf),
                 ANALYTICS_ORACLE_SQL["regr_price_on_qty_by_flag"])
    assert got.to_pylist() == want.to_pylist()
