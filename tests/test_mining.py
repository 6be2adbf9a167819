"""Planted-data tests for the pattern-mining operator family
(sjot_ray/pipelines/mining.py): hand-computed expectations plus DuckDB
differentials on planted tables (engine-independent: DuckDB evaluates
its own SQL over the same parquet)."""

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from sjot_ray.pipelines.mining import (
    MINING_ORACLE_SQL, PMI_MIN_SUPPORT, _skyline_mask,
    q_association_rules, q_audience_overlap, q_benford_order_totals,
    q_bm25_docs, q_mi_event_weekday, q_monthly_revenue_partitioned,
    q_pmi_bigrams, q_skyline_parts, partitioned_orders_path)

_TABLES = ("part", "orders", "lineitem", "events", "documents")


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


def test_oracle_keys_registered():
    import __ray_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    for name in MINING_ORACLE_SQL:
        assert name in q and name in o, name


def test_association_rules_planted(ray_session, tmp_path):
    """Baskets {1,2},{1,2},{1,3},{2}: only (1,2) reaches support 2;
    confidence = 2/3 both ways, lift = 2·4/(3·3); duplicate
    (order, part) rows dedup before counting."""
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [(1, 1), (1, 2), (1, 2),
            (2, 1), (2, 2),
            (3, 1), (3, 3),
            (4, 2)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        sf / "lineitem.parquet")

    out = q_association_rules(str(sf))
    assert out.num_rows == 1
    r = {c: out[c][0].as_py() for c in out.column_names}
    assert (r["part_a"], r["part_b"], r["n_orders"]) == (1, 2, 2)
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["conf_ab"] == round(2 / 3, 6)
    assert r["conf_ba"] == round(2 / 3, 6)
    assert r["lift"] == round(2.0 * 4 / 9, 6)

    duck = _duck(str(sf), MINING_ORACLE_SQL["association_rules"])
    assert out.to_pydict() == duck.to_pydict()


def test_audience_overlap_planted(ray_session, tmp_path):
    """Audiences A={1,2}, B={1,3}, C={3,4}: J(A,B)=1/3, J(A,C)=0,
    J(B,C)=1/3; zero-intersection pairs still emit a row; duplicate
    events dedup to distinct (user, type)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    users = [1, 1, 1, 2, 3, 3, 4, 4]
    types = ["A", "B", "A", "A", "B", "C", "C", "C"]
    pq.write_table(pa.table({
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types)}), sf / "events.parquet")

    out = q_audience_overlap(str(sf))
    got = {(a, b): (ni, nu, j) for a, b, ni, nu, j in zip(
        out["type_a"].to_pylist(), out["type_b"].to_pylist(),
        out["n_inter"].to_pylist(), out["n_union"].to_pylist(),
        out["jaccard"].to_pylist())}
    assert got == {("A", "B"): (1, 3, round(1 / 3, 6)),
                   ("A", "C"): (0, 4, 0.0),
                   ("B", "C"): (1, 3, round(1 / 3, 6))}

    duck = _duck(str(sf), MINING_ORACLE_SQL["audience_overlap"])
    assert out.to_pydict() == duck.to_pydict()


def test_skyline_mask_unit():
    """Duplicates both survive; equal-price-bigger-size dominates;
    equal-size-cheaper dominates."""
    price = np.array([4.0, 4.0, 5.0, 4.5, 4.0, 3.0])
    size = np.array([8, 8, 12, 8, 7, 1])
    keep = _skyline_mask(price, size)
    assert keep.tolist() == [True, True, True, False, False, True]
    assert _skyline_mask(np.array([]), np.array([])).tolist() == []


def test_skyline_parts_planted(ray_session, tmp_path):
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "p_retailprice": pa.array([4.0, 4.0, 5.0, 4.5, 4.0, 3.0]),
        "p_size": pa.array([8, 8, 12, 8, 7, 1], pa.int32())}),
        sf / "part.parquet")

    out = q_skyline_parts(str(sf))
    assert out["p_partkey"].to_pylist() == [1, 2, 3, 6]
    duck = _duck(str(sf), MINING_ORACLE_SQL["skyline_parts"])
    assert out.to_pydict() == duck.to_pydict()


def test_benford_planted(ray_session, tmp_path):
    """Digit from integer cents (123.45 → '1' of 12345); zero and
    negative totals are excluded; expected share is log10(1+1/d)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_totalprice": pa.array([123.45, 19.99, 2.00, 0.0, 900.00]),
        "o_orderdate": _ts(*["2024-01-01"] * 5),
        "o_orderpriority": pa.array(["1"] * 5)}),
        sf / "orders.parquet")

    out = q_benford_order_totals(str(sf))
    got = {d: (n, o, e) for d, n, o, e in zip(
        out["digit"].to_pylist(), out["n"].to_pylist(),
        out["obs_frac"].to_pylist(), out["exp_frac"].to_pylist())}
    assert got == {
        "1": (2, 0.5, round(math.log10(2), 6)),
        "2": (1, 0.25, round(math.log10(1.5), 6)),
        "9": (1, 0.25, round(math.log10(10 / 9), 6))}
    duck = _duck(str(sf), MINING_ORACLE_SQL["benford_order_totals"])
    assert out.to_pydict() == duck.to_pydict()


def test_mi_planted(ray_session, tmp_path):
    """Perfectly dependent grid (A only Monday, B only Tuesday) has
    MI = ln 2; an independent grid has MI = 0."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "ts": _ts("2024-01-01T05:00", "2024-01-01T06:00",
                  "2024-01-02T05:00", "2024-01-02T06:00"),
        "event_type": pa.array(["A", "A", "B", "B"])}),
        sf / "events.parquet")
    out = q_mi_event_weekday(str(sf))
    assert out["mi_nats"].to_pylist() == [round(math.log(2), 6)]
    assert out["n"].to_pylist() == [4]
    duck = _duck(str(sf), MINING_ORACLE_SQL["mi_event_weekday"])
    assert out.to_pydict() == duck.to_pydict()

    # independent grid: both types uniform over both days → MI 0
    pq.write_table(pa.table({
        "ts": _ts("2024-01-01T05:00", "2024-01-01T06:00",
                  "2024-01-02T05:00", "2024-01-02T06:00"),
        "event_type": pa.array(["A", "B", "A", "B"])}),
        sf / "events.parquet")
    out = q_mi_event_weekday(str(sf))
    assert out["mi_nats"].to_pylist() == [0.0]


def test_bm25_planted(ray_session, tmp_path):
    """Docs without any query term are excluded but still count toward
    N and avgdl; the score matches the textbook formula computed
    directly."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["hash hash join", "stream",
                          "foo bar baz qux"])}),
        sf / "documents.parquet")

    out = q_bm25_docs(str(sf))
    assert out["doc_id"].to_pylist() == [1, 2]
    n, avgdl = 3, 8 / 3
    k1, b = 1.2, 0.75

    def idf(df):
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def w(tf, dl):
        return (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))

    exp1 = idf(1) * w(2, 3) + idf(1) * w(1, 3)   # hash×2, join×1
    exp2 = idf(1) * w(1, 1)                       # stream×1
    got = out["bm25"].to_pylist()
    assert abs(got[0] - exp1) < 1e-6 and abs(got[1] - exp2) < 1e-6
    duck = _duck(str(sf), MINING_ORACLE_SQL["bm25_docs"])
    assert out.to_pydict() == duck.to_pydict()


def test_pmi_planted(ray_session, tmp_path):
    """Support threshold gates the output; PMI matches the direct
    formula over token/pair totals that include sub-threshold docs."""
    sf = tmp_path / "sf"
    sf.mkdir()
    text1 = " ".join(["a b"] * (PMI_MIN_SUPPORT + 5))   # 30× "a b"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([text1, "x y"])}),
        sf / "documents.parquet")

    out = q_pmi_bigrams(str(sf))
    reps = PMI_MIN_SUPPORT + 5
    n_tok = 2 * reps + 2
    n_pair = (2 * reps - 1) + 1
    got = dict(zip(out["ngram"].to_pylist(), out["n"].to_pylist()))
    assert got == {"a b": reps, "b a": reps - 1}
    pmi = dict(zip(out["ngram"].to_pylist(), out["pmi"].to_pylist()))

    def expect(nab):
        return math.log((nab * 1.0 / n_pair)
                        / ((reps * 1.0 / n_tok) * (reps * 1.0 / n_tok)))

    assert abs(pmi["a b"] - expect(reps)) < 1e-6
    assert abs(pmi["b a"] - expect(reps - 1)) < 1e-6
    duck = _duck(str(sf), MINING_ORACLE_SQL["pmi_bigrams"])
    assert out.to_pydict() == duck.to_pydict()


def test_copurchase_distance_planted(ray_session, tmp_path):
    """Chain 1—2 (order 10), 2—3 (order 11), isolated 4: distances
    0/1/2, part 4 unreachable and absent; a reached part freezes at its
    first hop (part 1 re-reached at hop 2 stays 0)."""
    from sjot_ray.pipelines.mining import q_copurchase_distance

    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [(10, 1), (10, 2), (11, 2), (11, 3), (12, 4)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}),
        sf / "lineitem.parquet")

    out = q_copurchase_distance(str(sf))
    got = dict(zip(out["part"].to_pylist(), out["dist"].to_pylist()))
    assert got == {1: 0, 2: 1, 3: 2}
    duck = _duck(str(sf), MINING_ORACLE_SQL["copurchase_distance"])
    assert out.to_pydict() == duck.to_pydict()

    # seed absent from the graph → only the base row, like the CTE
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10], pa.int64()),
        "l_partkey": pa.array([7, 8], pa.int64())}),
        sf2 / "lineitem.parquet")
    out2 = q_copurchase_distance(str(sf2))
    assert dict(zip(out2["part"].to_pylist(),
                    out2["dist"].to_pylist())) == {1: 0}
    duck2 = _duck(str(sf2), MINING_ORACLE_SQL["copurchase_distance"])
    assert out2.to_pydict() == duck2.to_pydict()


def test_gini_planted(ray_session, tmp_path):
    """Counts {1,1,2,4}: G = 2·25/(4·8) − 5/4 = 0.3125; perfectly even
    keys give G = 0."""
    from sjot_ray.pipelines.mining import q_lineitem_per_order_gini

    sf = tmp_path / "sf"
    sf.mkdir()
    ok = [1, 2, 3, 3, 4, 4, 4, 4]
    pq.write_table(pa.table({
        "l_orderkey": pa.array(ok, pa.int64())}),
        sf / "lineitem.parquet")
    out = q_lineitem_per_order_gini(str(sf))
    assert out["gini"].to_pylist() == [0.3125]
    assert out["n_keys"].to_pylist() == [4]
    duck = _duck(str(sf), MINING_ORACLE_SQL["lineitem_per_order_gini"])
    assert out.to_pydict() == duck.to_pydict()

    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], pa.int64())}),
        sf / "lineitem.parquet")
    out = q_lineitem_per_order_gini(str(sf))
    assert out["gini"].to_pylist() == [0.0]


def test_hourly_anomaly_planted(ray_session, tmp_path):
    """Counts {3,1} per hour: mean 2, σ 1 → z = ±1; a constant grid
    (σ = 0) yields NULL z like the SQL's division by zero."""
    from sjot_ray.pipelines.mining import q_hourly_anomaly

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "ts": _ts("2024-01-01T05:01", "2024-01-01T05:02",
                  "2024-01-01T05:59", "2024-01-01T06:30")}),
        sf / "events.parquet")
    out = q_hourly_anomaly(str(sf))
    assert out["n"].to_pylist() == [3, 1]
    assert out["z"].to_pylist() == [1.0, -1.0]
    duck = _duck(str(sf), MINING_ORACLE_SQL["hourly_anomaly"])
    assert out.to_pydict() == duck.to_pydict()

    pq.write_table(pa.table({
        "ts": _ts("2024-01-01T05:01", "2024-01-01T06:30")}),
        sf / "events.parquet")
    out = q_hourly_anomaly(str(sf))
    assert out["z"].to_pylist() == [None, None]
    duck = _duck(str(sf), MINING_ORACLE_SQL["hourly_anomaly"])
    assert out.to_pydict() == duck.to_pydict()


def test_sessionize_auto_plans(ray_session, tmp_path):
    """The skew census picks the salted arm for a planted hot key and
    the plain arm for a uniform corpus; both arms match the oracle."""
    from sjot_ray.pipelines.mining import (SESSION_AUTO_STATS,
                                           q_user_sessions_auto)

    sf = tmp_path / "sf"
    sf.mkdir()
    # hot user 7: 3,000 events 10 min apart (spans days); user 8: 2
    hot = np.datetime64("2024-01-01T00:00:00", "us") \
        + np.arange(3000) * np.timedelta64(10 * 60 * 1_000_000, "us")
    cold = np.array(["2024-01-05T00:00:00", "2024-01-05T02:00:00"],
                    dtype="datetime64[us]")
    pq.write_table(pa.table({
        "user_id": pa.array([7] * 3000 + [8, 8], pa.int64()),
        "ts": pa.array(np.concatenate([hot, cold]))}),
        sf / "events.parquet")

    out = q_user_sessions_auto(str(sf), salt_rows=1_000)
    assert SESSION_AUTO_STATS["plan"] == "salted"
    assert SESSION_AUTO_STATS["est_max_key_rows"] == 3000
    got = {u: (e, s) for u, e, s in zip(
        out["user_id"].to_pylist(), out["n_events"].to_pylist(),
        out["n_sessions"].to_pylist())}
    # 10-min gaps never split; the cold user's 2h gap does
    assert got == {7: (3000, 1), 8: (2, 2)}
    duck = _duck(str(sf), MINING_ORACLE_SQL["user_sessions_auto"])
    want = {u: (e, s) for u, e, s in zip(
        duck["user_id"].to_pylist(), duck["n_events"].to_pylist(),
        duck["n_sessions"].to_pylist())}
    assert got == want

    out2 = q_user_sessions_auto(str(sf))      # default threshold
    assert SESSION_AUTO_STATS["plan"] == "plain"
    got2 = {u: (e, s) for u, e, s in zip(
        out2["user_id"].to_pylist(), out2["n_events"].to_pylist(),
        out2["n_sessions"].to_pylist())}
    assert got2 == want


def test_csv_jsonl_sources_planted(ray_session, tmp_path):
    """The CSV path round-trips awkward doubles bit-exactly (repr →
    Arrow CSV parser); the JSONL path round-trips non-ASCII strings;
    both match the parquet-side oracle."""
    from sjot_ray.pipelines.mining import (q_documents_jsonl_census,
                                           q_events_csv_census)

    sf = tmp_path / "sf"
    sf.mkdir()
    vals = [0.1 + 0.2, -1e-17, 1234567.8912345678, 2.0, float(2**53)]
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "b", "b", "b"]),
        "value": pa.array(vals, pa.float64())}),
        sf / "events.parquet")
    out = q_events_csv_census(str(sf))
    duck = _duck(str(sf), MINING_ORACLE_SQL["events_csv_census"])
    assert out.to_pydict() == duck.to_pydict()

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "lang": pa.array(["fr-ça", "中文", "fr-ça"]),
        "n_chars": pa.array([10, 20, 30], pa.int64())}),
        sf / "documents.parquet")
    out = q_documents_jsonl_census(str(sf))
    got = {lg: (n, s) for lg, n, s in zip(
        out["lang"].to_pylist(), out["n_docs"].to_pylist(),
        out["sum_chars"].to_pylist())}
    assert got == {"fr-ça": (2, 40), "中文": (1, 20)}
    duck = _duck(str(sf), MINING_ORACLE_SQL["documents_jsonl_census"])
    assert out.to_pydict() == duck.to_pydict()


def test_partitioned_sink_prunes_and_caches(ray_session, tmp_path):
    """The sink writes one hive dir per month; the probed read touches
    only the requested month; a rerun reuses the cached sink (same
    root, no rewrite); a corpus without the probed month returns the
    empty schema."""
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.00, 20.00, 30.00, 40.00]),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH",
                                     "1-URGENT", "2-HIGH"]),
        "o_orderdate": _ts("1996-06-03", "1996-06-15",
                           "1996-07-01", "1996-07-02")}),
        sf / "orders.parquet")

    out = q_monthly_revenue_partitioned(str(sf))
    got = dict(zip(out["o_orderpriority"].to_pylist(),
                   zip(out["n_orders"].to_pylist(),
                       out["revenue_cents"].to_pylist())))
    assert got == {"1-URGENT": (1, 1000), "2-HIGH": (1, 2000)}
    duck = _duck(str(sf), MINING_ORACLE_SQL["monthly_revenue_partitioned"])
    assert out.to_pydict() == duck.to_pydict()

    root = partitioned_orders_path(str(sf))
    assert os.path.isdir(os.path.join(root, "o_month=1996-06"))
    assert os.path.isdir(os.path.join(root, "o_month=1996-07"))
    mtime = os.path.getmtime(os.path.join(root, "_DONE"))
    assert partitioned_orders_path(str(sf)) == root
    assert os.path.getmtime(os.path.join(root, "_DONE")) == mtime

    # corpus without the probed month → empty result, stable schema
    sf2 = tmp_path / "sf2"
    sf2.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_totalprice": pa.array([10.00]),
        "o_orderpriority": pa.array(["1-URGENT"]),
        "o_orderdate": _ts("1997-01-01")}), sf2 / "orders.parquet")
    out2 = q_monthly_revenue_partitioned(str(sf2))
    assert out2.num_rows == 0
    assert out2.column_names == ["o_orderpriority", "n_orders",
                                 "revenue_cents"]
