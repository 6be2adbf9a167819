"""EXACT distributed quantiles — the hard-oracle companion to the KLL /
t-digest sketches in pipelines/drift.py (which are approximate by
design and therefore rows-only at the gate).

Algorithm: histogram-refinement selection. Each level histograms the
(filtered) column into K fixed buckets with ONE streaming pass (per-batch
nonzero (bucket, count) partials → small keyed groupby-sum → ≤K rows on
the driver), locates the bucket holding each target rank, then either

* collects that bucket's values exactly (a second streaming pass that
  ships ONLY the ≤ ~n/K matching values to the driver), or
* recurses into the bucket when it still holds more than ``collect_cap``
  values (mass concentration / extreme scale): at 10^12 rows and
  K = 2048, level 1 buckets hold ~5×10^8 values, level 2 ~2.4×10^5 — two
  levels reach driver-collectable size with 2 passes per level.

Bucket membership is decided by ONE shared function (`_bucket_ids`) used
identically in the histogram and collect passes, so float rounding at
bucket edges cannot desynchronize them; recursion filters by the parent
bucket-id CHAIN rather than recomputed float ranges for the same reason.
Ranks are exact integer arithmetic: rank(p) = max(1, ceil(p·n/100)) =
max(1, (p·n + 99) // 100) — matching the SQL oracle digit for digit.
Nulls are excluded (SQL ORDER BY semantics over a WHERE NOT NULL scan).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _bucket_ids(v: np.ndarray, lo: float, hi: float, K: int) -> np.ndarray:
    """Bucket index in [0, K) for finite float values in [lo, hi]."""
    if hi <= lo:
        return np.zeros(len(v), dtype=np.int64)
    idx = np.floor((v - lo) * (K / (hi - lo))).astype(np.int64)
    return np.clip(idx, 0, K - 1)


def _col_values(t: pa.Table, col: str) -> np.ndarray:
    c = t[col]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if c.null_count:
        c = c.drop_null()
    return c.to_numpy(zero_copy_only=False).astype(np.float64)


def _chain_mask(v: np.ndarray, chain) -> np.ndarray:
    """Rows whose bucket id matches every (lo, hi, K, b) level filter."""
    m = np.ones(len(v), dtype=bool)
    for lo, hi, K, b in chain:
        m &= _bucket_ids(v, lo, hi, K) == b
    return m


def _histogram(ds, col: str, chain, lo: float, hi: float, K: int):
    """One streaming histogram pass → (bucket ids, counts) sorted."""
    def partial(t: pa.Table) -> pa.Table:
        v = _col_values(t, col)
        v = v[_chain_mask(v, chain)]
        cnt = np.bincount(_bucket_ids(v, lo, hi, K), minlength=K)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("bucket").sum("cnt")
    rows = agg.take_all()   # ≤ K tiny rows
    b = np.array([r["bucket"] for r in rows], dtype=np.int64)
    c = np.array([r["sum(cnt)"] for r in rows], dtype=np.int64)
    order = np.argsort(b)
    return b[order], c[order]


def _collect(ds, col: str, chain) -> np.ndarray:
    """Ship exactly the chain-matching values to the driver, sorted."""
    def keep(t: pa.Table) -> pa.Table:
        v = _col_values(t, col)
        return pa.table({"v": pa.array(v[_chain_mask(v, chain)])})

    out = ds.map_batches(keep, batch_format="pyarrow",
                         zero_copy_batch=True)
    vals = np.concatenate(
        [b["v"].to_numpy(zero_copy_only=False)
         for b in out.iter_batches(batch_format="pyarrow")] or
        [np.array([], np.float64)])
    return np.sort(vals)


def values_at_ranks(ds: "ray.data.Dataset", col: str, ranks,
                    K: int = 2048, collect_cap: int = 4_000_000,
                    max_depth: int = 4) -> tuple[dict[int, float], int]:
    """Exact sorted-column values at arbitrary 1-based ranks (the
    selection core behind ``exact_quantiles`` and the interpolated
    ``quantile_cont`` variant). ``ranks`` is a list of ranks or a
    callable ``n -> list[int]`` (for rank formulas that need the
    non-null count, discovered on the first histogram pass). Returns
    ({rank: value}, n_non_null); ranks outside [1, n] are clamped."""
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min(col), Max(col))
    glo, ghi = float(mm[f"min({col})"]), float(mm[f"max({col})"])

    buckets, counts = _histogram(ds, col, [], glo, ghi, K)
    n = int(counts.sum())
    if n == 0:
        return {}, 0
    rank_list = ranks(n) if callable(ranks) else ranks
    want = sorted({max(1, min(int(r), n)) for r in rank_list})

    def solve(chain, lo, hi, b, c, rank_items, depth) -> dict[int, float]:
        """rank_items: [(rank_id, rank-within-this-range 1-based)]."""
        out: dict[int, float] = {}
        cum = np.concatenate([[0], np.cumsum(c)])
        # group ranks by the bucket that contains them
        by_bucket: dict[int, list] = {}
        for pct, r in rank_items:
            # counts are > 0, so cum is strictly increasing: the unique i
            # with cum[i] < r <= cum[i+1] is searchsorted(left) - 1
            i = int(np.searchsorted(cum, r, side="left")) - 1
            i = max(0, min(i, len(b) - 1))
            by_bucket.setdefault(i, []).append((pct, r - cum[i]))
        for i, items in sorted(by_bucket.items()):
            sub_chain = chain + [(lo, hi, K, int(b[i]))]
            blo = lo + (hi - lo) * (int(b[i]) / K)
            bhi = lo + (hi - lo) * ((int(b[i]) + 1) / K)
            if int(c[i]) > collect_cap and bhi <= blo:
                # zero-width bucket past the collect budget: an
                # equal-value mass no split can separate — all its
                # values agree with the range's low end to float
                # resolution, so answer directly instead of shipping
                # an unbounded value list to the driver
                for pct, _ in items:
                    out[pct] = blo
            elif int(c[i]) > collect_cap and depth < max_depth:
                sb, sc = _histogram(ds, col, sub_chain, blo, bhi, K)
                out.update(solve(sub_chain, blo, bhi, sb, sc,
                                 sorted(items, key=lambda x: x[1]),
                                 depth + 1))
            else:
                vals = _collect(ds, col, sub_chain)
                for pct, rr in items:
                    out[pct] = float(vals[rr - 1])
        return out

    res = solve([], glo, ghi, buckets, counts,
                [(r, r) for r in want], 1)
    return res, n


def exact_quantiles(ds: "ray.data.Dataset", col: str, pcts: list[int],
                    K: int = 2048, collect_cap: int = 4_000_000,
                    max_depth: int = 4) -> pa.Table:
    """Exact percentile values of ``ds[col]``: for each integer percent
    p, the value at 1-based rank max(1, ceil(p·n/100)) of the sorted
    non-null column. Returns a (pct, value) table ordered by pct."""
    # the rank formula needs n, which the selection core discovers on its
    # first histogram pass — so resolve ranks lazily via the callable form
    def ranks_fn(n: int) -> list[int]:
        return [max(1, (p * n + 99) // 100) for p in pcts]

    res, n = values_at_ranks(ds, col, ranks_fn, K, collect_cap, max_depth)
    if n == 0:
        return pa.table({"pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    ps = sorted(pcts)
    return pa.table({
        "pct": pa.array(ps, pa.int64()),
        "value": pa.array([res[max(1, (p * n + 99) // 100)] for p in ps],
                          pa.float64())})


def q_quantiles_lineitem_price(sf_dir: str):
    """Exact deciles/tails of l_extendedprice — hash-oracled against a
    DuckDB row_number() rank selection (same integer rank formula)."""
    from .queries import _read

    # the selector makes several streaming passes; pin the one pruned
    # float column in the object store so each pass re-reads a column,
    # not the source table (measured ~2x at sf0.1)
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice"]).materialize()
    return exact_quantiles(ds, "l_extendedprice",
                           [1, 10, 25, 50, 75, 90, 99])


QUANTILES_ORACLE_SQL: dict[str, str] = {
    "quantiles_lineitem_price": """
        WITH r AS (SELECT l_extendedprice AS v,
                          row_number() OVER (ORDER BY l_extendedprice)
                            AS rn,
                          count(*) OVER () AS n
                   FROM lineitem WHERE l_extendedprice IS NOT NULL)
        SELECT p.pct, r.v AS value
        FROM (VALUES (1), (10), (25), (50), (75), (90), (99)) p(pct)
        JOIN r ON r.rn = greatest(1, (p.pct * r.n + 99) // 100)
        ORDER BY p.pct
    """,
}


def grouped_exact_quantiles(ds: "ray.data.Dataset", group_col: str,
                            col: str, pcts: list[int], K: int = 2048,
                            collect_cap: int = 4_000_000,
                            max_depth: int = 4) -> pa.Table:
    """Exact per-group percentiles for a LOW-cardinality group key (the
    grouped companion to ``exact_quantiles``; same rank formula per
    group). Every refinement level is batched across groups: ONE
    streaming histogram pass emits (group, bucket, count) partials for
    all still-pending groups, and ONE collect pass ships all
    collect-ready buckets (tagged by entry id) — so the pass count is
    O(levels), not O(groups). Designed for group cardinalities that fit
    a driver dict (flags/status/lang-style keys, ≤ ~10^4); per-key
    distribution sketches over high-cardinality keys belong to
    drift.py's KLL path instead."""
    # pass 0: per-group n / min / max (tiny partials, driver fold)
    def stats(t: pa.Table) -> pa.Table:
        keep = t.select([group_col, col]).filter(
            pc.is_valid(t[col]))
        return keep.group_by(group_col).aggregate(
            [(col, "count"), (col, "min"), (col, "max")])

    parts = list(ds.map_batches(stats, batch_format="pyarrow",
                                zero_copy_batch=True)
                 .iter_batches(batch_format="pyarrow", batch_size=None))
    if not parts:
        return pa.table({group_col: pa.array([], pa.string()),
                         "pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    st = pa.concat_tables(parts, promote_options="default") \
        .group_by(group_col).aggregate([
            (f"{col}_count", "sum"), (f"{col}_min", "min"),
            (f"{col}_max", "max")])
    groups = st[group_col].to_pylist()
    ns = st[f"{col}_count_sum"].to_numpy(zero_copy_only=False)
    los = st[f"{col}_min_min"].to_numpy(zero_copy_only=False)
    his = st[f"{col}_max_max"].to_numpy(zero_copy_only=False)

    # pending refinement entries: (group, chain, lo, hi,
    # [(pct, local_rank)]) — entry-grained (not group-grained) so two
    # target ranks landing in two different oversized buckets of the
    # SAME group each refine independently in the same level
    pending: list = []
    answers: dict = {g: {} for g in groups}
    for g, n, lo, hi in zip(groups, ns, los, his):
        n = int(n)
        if n == 0:
            continue
        items = sorted(((p, max(1, (p * n + 99) // 100)) for p in pcts),
                       key=lambda x: x[1])
        pending.append((g, [], float(lo), float(hi), items))

    def _group_values(t: pa.Table, g) -> np.ndarray:
        m = pc.equal(t[group_col], g)
        sub = t.filter(pc.and_kleene(m, pc.is_valid(t[col])))
        c = sub[col]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        return c.to_numpy(zero_copy_only=False).astype(np.float64)

    depth = 1
    while pending:
        level = list(pending)  # freeze this level's entries

        def hist(t: pa.Table) -> pa.Table:
            es, bs, cs = [], [], []
            for eid, (g, chain, lo, hi, _items) in enumerate(level):
                v = _group_values(t, g)
                v = v[_chain_mask(v, chain)]
                cnt = np.bincount(_bucket_ids(v, lo, hi, K), minlength=K)
                nz = np.nonzero(cnt)[0]
                es.extend([eid] * len(nz))
                bs.append(nz.astype(np.int64))
                cs.append(cnt[nz].astype(np.int64))
            return pa.table({
                "e": pa.array(np.asarray(es, np.int64)),
                "bucket": pa.array(np.concatenate(bs) if bs else
                                   np.array([], np.int64)),
                "cnt": pa.array(np.concatenate(cs) if cs else
                                np.array([], np.int64))})

        hp = list(ds.map_batches(hist, batch_format="pyarrow",
                                 zero_copy_batch=True)
                  .iter_batches(batch_format="pyarrow", batch_size=None))
        ht = pa.concat_tables(hp, promote_options="default") \
            .group_by(["e", "bucket"]).aggregate([("cnt", "sum")])

        pending = []
        collects: list = []  # (g, sub_chain, items)
        for eid, (g, chain, lo, hi, items) in enumerate(level):
            sub = ht.filter(pc.equal(ht["e"], eid))
            b = sub["bucket"].to_numpy(zero_copy_only=False)
            c = sub["cnt_sum"].to_numpy(zero_copy_only=False)
            order = np.argsort(b)
            b, c = b[order].astype(np.int64), c[order].astype(np.int64)
            cum = np.concatenate([[0], np.cumsum(c)])
            by_bucket: dict[int, list] = {}
            for pct, r in items:
                i = int(np.searchsorted(cum, r, side="left")) - 1
                i = max(0, min(i, len(b) - 1))
                by_bucket.setdefault(i, []).append((pct, r - cum[i]))
            for i, its in sorted(by_bucket.items()):
                sub_chain = chain + [(lo, hi, K, int(b[i]))]
                blo = lo + (hi - lo) * (int(b[i]) / K)
                bhi = lo + (hi - lo) * ((int(b[i]) + 1) / K)
                if int(c[i]) > collect_cap and bhi <= blo:
                    for pct, _ in its:
                        answers[g][pct] = blo
                elif int(c[i]) > collect_cap and depth < max_depth:
                    pending.append((g, sub_chain, blo, bhi,
                                    sorted(its, key=lambda x: x[1])))
                else:
                    collects.append((g, sub_chain, its))

        if collects:
            ids = list(range(len(collects)))

            def keep(t: pa.Table) -> pa.Table:
                es, vs = [], []
                for eid in ids:
                    g, sub_chain, _its = collects[eid]
                    v = _group_values(t, g)
                    v = v[_chain_mask(v, sub_chain)]
                    es.extend([eid] * len(v))
                    vs.append(v)
                return pa.table({
                    "eid": pa.array(np.asarray(es, np.int64)),
                    "v": pa.array(np.concatenate(vs) if vs else
                                  np.array([], np.float64))})

            out = ds.map_batches(keep, batch_format="pyarrow",
                                 zero_copy_batch=True)
            bs = list(out.iter_batches(batch_format="pyarrow",
                                       batch_size=None))
            allv = pa.concat_tables(bs, promote_options="default") \
                if bs else pa.table({"eid": pa.array([], pa.int64()),
                                     "v": pa.array([], pa.float64())})
            ev = allv["eid"].to_numpy(zero_copy_only=False)
            vv = allv["v"].to_numpy(zero_copy_only=False)
            for eid in ids:
                g, _chain, its = collects[eid]
                vals = np.sort(vv[ev == eid])
                for pct, rr in its:
                    answers[g][pct] = float(vals[rr - 1])
        depth += 1

    gs_out, ps_out, vs_out = [], [], []
    for g in sorted(answers):
        for p in sorted(pcts):
            if p in answers[g]:
                gs_out.append(g)
                ps_out.append(p)
                vs_out.append(answers[g][p])
    return pa.table({group_col: pa.array(gs_out),
                     "pct": pa.array(ps_out, pa.int64()),
                     "value": pa.array(vs_out, pa.float64())})


def q_quantiles_price_by_flag(sf_dir: str):
    """Exact per-group quartiles/p90 of l_extendedprice grouped by
    l_returnflag — the grouped-quantile operator, hash-oracled against a
    per-partition row_number() rank selection."""
    from .queries import _read

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice"]).materialize()
    return grouped_exact_quantiles(ds, "l_returnflag", "l_extendedprice",
                                   [25, 50, 75, 90])


QUANTILES_ORACLE_SQL["quantiles_price_by_flag"] = """
    WITH r AS (SELECT l_returnflag, l_extendedprice AS v,
                      row_number() OVER (PARTITION BY l_returnflag
                                         ORDER BY l_extendedprice) AS rn,
                      count(*) OVER (PARTITION BY l_returnflag) AS n
               FROM lineitem WHERE l_extendedprice IS NOT NULL)
    SELECT r.l_returnflag, p.pct, r.v AS value
    FROM (VALUES (25), (50), (75), (90)) p(pct)
    JOIN r ON r.rn = greatest(1, (p.pct * r.n + 99) // 100)
    ORDER BY l_returnflag, pct
"""


def q_quantile_cont_price(sf_dir: str):
    """Interpolated percentiles (SQL ``percentile_cont`` semantics) of
    l_extendedprice: h = p·(n−1)/100 as an exact rational, neighbor
    values fetched by the rank-selection core, then ONE shared formula
    ``v_lo + frac·(v_hi − v_lo)`` with frac = (p·(n−1) mod 100)/100 —
    integer-exact, so the oracle SQL computes the interpolation from the
    SAME two doubles with the SAME expression and the hash cannot drift
    on an engine's internal quantile_cont formula choice."""
    from .queries import _read

    pcts = [10, 25, 50, 75, 90]
    ds = _read(sf_dir, "lineitem",
               columns=["l_extendedprice"]).materialize()

    def ranks_fn(n: int) -> list[int]:
        out = []
        for p in pcts:
            lo0 = (p * (n - 1)) // 100
            out.extend([lo0 + 1, min(lo0 + 2, n)])
        return out

    vals, n = values_at_ranks(ds, "l_extendedprice", ranks_fn)
    if n == 0:
        return pa.table({"pct": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    out = []
    for p in sorted(pcts):
        lo0 = (p * (n - 1)) // 100
        frac = ((p * (n - 1)) % 100) / 100.0
        vlo = vals[lo0 + 1]
        vhi = vals[min(lo0 + 2, n)]
        out.append(round(vlo + frac * (vhi - vlo), 6))
    return pa.table({"pct": pa.array(sorted(pcts), pa.int64()),
                     "value": pa.array(out, pa.float64())})


QUANTILES_ORACLE_SQL["quantile_cont_price"] = """
    WITH n AS (SELECT count(*) AS n FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
    r AS (SELECT l_extendedprice AS v,
                 row_number() OVER (ORDER BY l_extendedprice) AS rn
          FROM lineitem WHERE l_extendedprice IS NOT NULL),
    k AS (SELECT p.pct,
                 (p.pct * (n.n - 1)) // 100 + 1 AS lo_rn,
                 least((p.pct * (n.n - 1)) // 100 + 2, n.n) AS hi_rn,
                 ((p.pct * (n.n - 1)) % 100) / 100.0 AS frac
          FROM (VALUES (10), (25), (50), (75), (90)) p(pct), n)
    SELECT k.pct, round(lo.v + k.frac * (hi.v - lo.v), 6) AS value
    FROM k JOIN r lo ON lo.rn = k.lo_rn
           JOIN r hi ON hi.rn = k.hi_rn
    ORDER BY k.pct
"""
