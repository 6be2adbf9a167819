"""Operator-coverage query suite over the driver's parquet tables.

Each public ``q_*`` function takes ``sf_dir`` and returns a Dataset /
pyarrow Table; ``ORACLE_SQL`` holds the DuckDB-equivalent SQL the driver
runs side-by-side (column names match exactly — the correctness gate
hashes values under sorted column names). Non-SQL-expressible pipelines
(sketches, MinHash/SimHash, schema inference, the flagship corpus) have no
oracle entry and get the driver's rows-only check.

Every query is written Ray-Data-first and scale-shaped:
* aggregates pre-reduce inside ``map_batches`` (one partial row per key
  per batch) before the small keyed shuffle;
* joins broadcast the small side via ``ray.put`` — no shuffle join;
* top-k = per-batch partial top-k, tiny final sort;
* reads prune columns at the source.
"""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..columnar.table_validator import TableValidator
from ..stages.validate import make_validate_fn, make_validate_json_fn




def _round(arr, ndigits: int):
    """DuckDB-compatible rounding (half away from zero; pyarrow/numpy
    default to half-to-even which diverges on exact halves)."""
    return pc.round(arr, ndigits, round_mode="half_towards_infinity")

def _read(sf_dir: str, table: str, columns=None,
          split: bool = True) -> "ray.data.Dataset":
    """Pruned parquet read with a row-proportional block count: Ray's
    read splitter otherwise targets ~200 blocks regardless of input
    size, and 200 tiny tasks of fixed overhead dominate small-table
    queries (measured 2-3x wall).

    ``split=False`` additionally caps the count at the file's ROW GROUP
    count. A row group is the parquet read-parallelism unit: asking for
    more blocks makes one task decode the whole group and re-split it
    post-decode, which only pays when the DOWNSTREAM stage is CPU-heavy
    enough to use the extra blocks. Measured on the single-row-group
    600K-row lineitem at 32 CPUs: plain aggregates run 0.46 s capped vs
    1.7 s split (q1), while the row-engine events validation runs 0.55 s
    split vs 1.1 s capped — so cheap-aggregate queries pass
    ``split=False`` and compute-heavy ones keep the default."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(f"{sf_dir}/{table}.parquet")
    nb = int(min(512, max(1, md.num_rows // 16384)))
    if not split:
        nb = min(nb, md.num_row_groups)
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns, override_num_blocks=nb)


def _parquet_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet footer metadata (no data read)."""
    import pyarrow.parquet as pq

    return pq.read_metadata(f"{sf_dir}/{table}.parquet").num_rows


def _emb_matrix(col) -> np.ndarray:
    """(n, dim) float64 view of a fixed-width list<float> column —
    flatten + reshape on the Arrow buffers, no Python list round-trip."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0))
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(n, -1)


def _t(ds) -> pa.Table:
    """Materialize a SMALL result dataset to one Arrow table."""
    batches = list(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    if not batches:
        return pa.table({})
    return pa.concat_tables(batches, promote_options="default")


def _t_or(ds, empty: pa.Table) -> pa.Table:
    """`_t`, but a schema-less collect (every batch filtered empty, so
    iter_batches yields nothing) returns the op's TYPED empty table —
    row-filtering operators must survive the all-rows-filtered corpus."""
    t = _t(ds)
    return empty if not t.column_names else t


# ---------------------------------------------------------------------------
# validation queries (SURVEY §2.2 as table predicates)

DOCS_SCHEMA = {
    "@root": "#Document",
    "Document": {
        "doc_id": "0..",
        "text": "string",
        "lang": "(en|de|fr)",
        "source": "(src[0-9])",
        "n_chars": "0..300",
    },
}

EVENT_PROPS_SCHEMA = {"@root": "#Props", "Props": {"k": "0..50"}}


def q_validate_documents(sf_dir: str):
    """Columnar SJOT validation of the documents table: verdict + first
    failing rule's typepath (first-error-wins, schema order)."""
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])
    out = ds.map_batches(
        make_validate_fn(DOCS_SCHEMA, extras_column=None, normalize=False),
        batch_format="pyarrow", zero_copy_batch=True)
    return _t(out.map_batches(
        lambda t: t.select(["doc_id", "verdict", "v_typepath"]),
        batch_format="pyarrow"))


def q_violations_documents(sf_dir: str):
    """Violation rows for the documents table (reference-format paths)."""
    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "lang", "source", "n_chars"])
    out = ds.map_batches(
        make_validate_fn(DOCS_SCHEMA, extras_column=None, normalize=False),
        batch_format="pyarrow", zero_copy_batch=True)

    def project(t: pa.Table) -> pa.Table:
        bad = t.filter(pc.invert(t["verdict"]))
        return bad.select(["doc_id", "v_datapath", "v_typepath",
                           "v_value_repr"]).rename_columns(
            ["doc_id", "datapath", "typepath", "value_repr"])
    return _t(out.map_batches(project, batch_format="pyarrow"))


def q_validate_events_props(sf_dir: str):
    """Row-engine (full SJOT generality) validation of the events.props
    JSON column — the generic fallback path, distributed."""
    ds = _read(sf_dir, "events", columns=["event_id", "props"])
    out = ds.map_batches(
        make_validate_json_fn(EVENT_PROPS_SCHEMA, "props"),
        batch_format="pyarrow", zero_copy_batch=True)
    return _t(out.map_batches(
        lambda t: t.select(["event_id", "verdict"]),
        batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# wide checks as queries

def q_uniqueness_events_user(sf_dir: str):
    """user_ids with more than one event + multiplicity (exact, partial
    count per batch → groupby-sum over partials)."""
    from .wide_checks import duplicate_keys

    ds = _read(sf_dir, "events", columns=["user_id"])
    return _t(duplicate_keys(ds, "user_id"))


def q_referential_orders_customer(sf_dir: str):
    """Anti-join: orders whose o_custkey is not in customer (broadcast
    Bloom + exact set, no shuffle). Returns summary counts."""
    from .wide_checks import referential_check

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    customer = _read(sf_dir, "customer", columns=["c_custkey"])
    dangling = referential_check(orders, "o_custkey", _t(customer),
                                 "c_custkey")
    n_dangling = dangling.count()
    n_total = orders.count()
    return pa.table({"total_orders": [n_total],
                     "dangling_orders": [n_dangling]})


def q_referential_partitioned(sf_dir: str):
    """Same referential check as q_referential_orders_customer but via
    the LARGE-catalog path: both key sets co-locate through the manual
    hash shuffle and each partition anti-joins with one Arrow is_in —
    for when the catalog is too big to broadcast. Same oracle SQL."""
    from .wide_checks import referential_check_partitioned

    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    customer = _read(sf_dir, "customer", columns=["c_custkey"])
    dangling = referential_check_partitioned(
        orders, "o_custkey", customer, "c_custkey",
        n_rows=_parquet_rows(sf_dir, "orders"))
    t = _t(dangling)
    n_dangling = int(pc.sum(t["n"]).as_py() or 0) if t.num_rows else 0
    return pa.table({"total_orders": [_parquet_rows(sf_dir, "orders")],
                     "dangling_orders": [n_dangling]})


def q_column_stats_lineitem(sf_dir: str):
    """Exact column stats via mergeable per-batch partials."""
    from .wide_checks import column_stats

    ds = _read(sf_dir, "lineitem", columns=["l_quantity", "l_extendedprice"],
               split=False)
    t = column_stats(ds, ["l_quantity", "l_extendedprice"])

    return pa.table({
        "column": t["column"],
        "n": t["n"].cast(pa.int64()),
        "nulls": t["nulls"].cast(pa.int64()),
        "min_v": _round(t["min"], 3),
        "max_v": _round(t["max"], 3),
        "mean_v": _round(t["mean"], 3),
    })


# ---------------------------------------------------------------------------
# relational ops (groupby / join / sort / limit) — Ray-Data-first

def q_q1_lineitem(sf_dir: str):
    """TPC-H Q1 shape: partial aggregate per batch inside map_batches,
    then a tiny keyed groupby over partials."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice"], split=False)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"),
             ([], "count_all")])
        return g.rename_columns(["l_returnflag", "l_linestatus",
                                 "sum_qty", "sum_price", "n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .sum(["sum_qty", "sum_price", "n"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": _round(t["sum(sum_qty)"], 2),
            "avg_price": _round(
                pc.divide(t["sum(sum_price)"],
                          pc.cast(t["sum(n)"], pa.float64())), 2),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })
    return _t(agg.map_batches(final, batch_format="pyarrow"))


def q_segment_revenue(sf_dir: str):
    """orders ⋈ customer on custkey — customer is the small side,
    broadcast once via ray.put; groupby over partials."""
    cust = _t(_read(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"]))
    lookup_ref = ray.put((cust["c_custkey"].combine_chunks(),
                          cust["c_mktsegment"].combine_chunks()))

    def add_segment(t: pa.Table) -> pa.Table:
        # stateless task + broadcast: ray.get on a warm worker is a local
        # object-store lookup (no actor cold-start per query)
        keys, vals = ray.get(lookup_ref)
        # vectorized broadcast probe: index_in + take; a null probe is a
        # non-matching (dangling) order — dropped, INNER-join semantics
        idx = pc.index_in(t["o_custkey"], value_set=keys)
        t = t.append_column("segment", pc.take(vals, idx))
        t = t.filter(pc.is_valid(idx))
        g = t.group_by("segment").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        return g.rename_columns(["segment", "revenue", "n_orders"])

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"],
                   split=False)
    agg = (orders.map_batches(add_segment, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("segment").sum(["revenue", "n_orders"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "segment": t["segment"],
            "revenue": _round(t["sum(revenue)"], 2),
            "n_orders": pc.cast(t["sum(n_orders)"], pa.int64()),
        })
    return _t(agg.map_batches(final, batch_format="pyarrow"))


def q_top_docs_by_chars(sf_dir: str):
    """Top-20 documents by n_chars: per-batch partial top-k, tiny final
    sort (no global shuffle sort)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.select_k_unstable(
            t, k=20, sort_keys=[("n_chars", "descending"),
                                ("doc_id", "ascending")])
        return t.take(idx)

    top = _t_or(ds.map_batches(partial_topk, batch_format="pyarrow",
                               zero_copy_batch=True),
                pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_chars": pa.array([], pa.int64())}))
    if top.num_rows == 0:
        return top
    idx = pc.select_k_unstable(
        top, k=20, sort_keys=[("n_chars", "descending"),
                              ("doc_id", "ascending")])
    return top.take(idx)


def q_events_hourly(sf_dir: str):
    """Streaming-shaped: tumbling 1-hour windows per event_type (events is
    an ordered log; the window key is computed per batch, then a keyed
    aggregate over partials)."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        g = pa.table({
            "event_type": t["event_type"], "hour": hour,
            "value": t["value"],
        }).group_by(["event_type", "hour"]).aggregate(
            [("value", "sum"), ([], "count_all")])
        return g.rename_columns(["event_type", "hour", "sum_value", "n"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "hour"]).sum(["sum_value", "n"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": t["hour"],
            "sum_value": _round(t["sum(sum_value)"], 3),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })
    return _t(agg.map_batches(final, batch_format="pyarrow"))


def q_lang_distribution(sf_dir: str):
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("lang").aggregate([("n_chars", "sum"),
                                          ([], "count_all")])
        return g.rename_columns(["lang", "sum_chars", "n_docs"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("lang").sum(["sum_chars", "n_docs"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_docs": pc.cast(t["sum(n_docs)"], pa.int64()),
            "avg_chars": _round(
                pc.divide(pc.cast(t["sum(sum_chars)"], pa.float64()),
                          pc.cast(t["sum(n_docs)"], pa.float64())), 3),
        })
    return _t(agg.map_batches(final, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# text analysis (training-data ops)



def _np_round_away(x, ndigits: int):
    m = 10.0 ** ndigits
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m

def q_text_clean(sf_dir: str):
    """Text cleaning/normalization stage (training-data prep): collapse
    whitespace runs, trim, lowercase — three Arrow kernels per batch, no
    Python per row. Output carries the cleaned text and its length;
    DuckDB oracle reproduces it with regexp_replace/trim/lower."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def clean(t: pa.Table) -> pa.Table:
        c = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(t["text"], r"\s+", " ")))
        return pa.table({"doc_id": t["doc_id"], "clean_text": c,
                         "clean_chars": pc.cast(pc.utf8_length(c),
                                                pa.int64())})

    return _t(ds.map_batches(clean, batch_format="pyarrow",
                             zero_copy_batch=True))


def q_top_ngrams(sf_dir: str, k: int = 20):
    """Corpus-wide top-k word bigrams by frequency (the classic
    training-data n-gram census). Per batch: regex tokenization, one
    vectorized adjacent-token join (consecutive flat positions in the
    same row), Arrow group-count partial; partials co-locate by
    hash64(ngram) through the manual shuffle, each partition emits its
    local top-k (an ngram's counts live wholly in one partition), and
    the driver merges B×k candidate rows. Ties break on (count DESC,
    ngram ASC) — deterministic and SQL-reproducible."""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    ds = _read(sf_dir, "documents", columns=["text"])
    n_rows = _parquet_rows(sf_dir, "documents")
    B = coarse_buckets(n_rows * 30)  # ~tokens per doc

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = np.nan_to_num(
            pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        flat = toks.flatten()
        # drop empty tokens (regexp_extract_all('\\S+') parity)
        row_of = np.repeat(np.arange(len(lengths)), lengths)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        row_of = row_of[nonempty]
        m = len(flat)
        if m < 2:
            return pa.table({"hkey": pa.array([], pa.int64()),
                             "ngram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        same_row = row_of[1:] == row_of[:-1]
        bigrams = pc.binary_join_element_wise(
            flat.slice(0, m - 1), flat.slice(1), " ")
        bigrams = bigrams.filter(pa.array(same_row))
        g = pa.table({"ngram": bigrams}).group_by("ngram") \
            .aggregate([([], "count_all")])
        g = g.rename_columns(["ngram", "n"])
        from ..state.sketches import hash64

        return g.append_column(
            "hkey", pa.array(hash64(g["ngram"]).astype(np.int64)))

    def topk_part(g: pa.Table) -> pa.Table:
        agg = g.group_by("ngram").aggregate([("n", "sum")])
        agg = agg.rename_columns(["ngram", "n"])
        idx = pc.sort_indices(agg, sort_keys=[("n", "descending"),
                                              ("ngram", "ascending")])
        return agg.take(idx.slice(0, k))

    empty = pa.table({"ngram": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})
    parts = hash_shuffle_apply(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), "hkey", B, topk_part, empty)
    t = _t(parts)  # ≤ B×k candidate rows on the driver
    if t.num_rows:
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("ngram", "ascending")])
        t = t.take(idx.slice(0, k))
    return t


def q_embedding_covariance(sf_dir: str):
    """Population covariance matrix of the embedding columns — the
    distributed-linear-algebra primitive under whitening / PCA /
    drift-of-correlations checks. Per batch: one (n, Σx, ΣxxT) moment
    partial (a single GEMM); the driver merges the tiny d×d partials and
    emits (i, j, cov) rows. Nothing row-proportional ever reaches the
    driver; at 10^12 rows the reduce is still d² floats per block.
    DuckDB oracle: covar_pop over the unnested (vec_id, i, x) pairs."""
    ds = _read(sf_dir, "embeddings", columns=["embedding"])

    def partial(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t["embedding"])
        d = X.shape[1]
        s = X.sum(axis=0)
        xx = X.T @ X
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([s.tolist()], pa.list_(pa.float64())),
            "xx": pa.array([xx.ravel().tolist()], pa.list_(pa.float64())),
            "d": pa.array([d], pa.int64())})

    n_tot, s_tot, xx_tot, d = 0, None, None, None
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for k in range(b.num_rows):
            d = int(b["d"][k].as_py())
            n_tot += int(b["n"][k].as_py())
            s_k = np.asarray(b["s"][k].as_py())
            xx_k = np.asarray(b["xx"][k].as_py()).reshape(d, d)
            s_tot = s_k if s_tot is None else s_tot + s_k
            xx_tot = xx_k if xx_tot is None else xx_tot + xx_k
    if n_tot == 0:
        return pa.table({"i": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "cov": pa.array([], pa.float64())})
    mean = s_tot / n_tot
    cov = xx_tot / n_tot - np.outer(mean, mean)
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, d + 1),
                         indexing="ij")
    return pa.table({
        "i": pa.array(ii.ravel(), pa.int64()),
        "j": pa.array(jj.ravel(), pa.int64()),
        "cov": pa.array(np.round(cov.ravel(), 9))})


def pca_project(ds: "ray.data.Dataset", n_components: int,
                emb_col: str = "embedding", id_col: str = "vec_id"):
    """Distributed PCA projection over an embedding column: the
    covariance comes from the same mergeable (n, Σx, ΣxxT) moment
    partials as :func:`q_embedding_covariance` (one GEMM per batch,
    d×d driver merge — row-count-independent driver work), the
    eigendecomposition is a d×d driver `eigh`, and the projection is
    one broadcast matmul per batch. Components are sign-canonicalized
    (largest-|loading| coordinate made positive) so the output is
    deterministic. Returns a Dataset of (id, components list)."""
    def moments(t: pa.Table) -> pa.Table:
        X = _emb_matrix(t[emb_col])
        return pa.table({
            "n": pa.array([len(X)], pa.int64()),
            "s": pa.array([X.sum(axis=0).tolist()], pa.list_(pa.float64())),
            "xx": pa.array([(X.T @ X).ravel().tolist()],
                           pa.list_(pa.float64()))})

    n_tot, s_tot, xx_tot = 0, None, None
    for b in ds.map_batches(moments, batch_format="pyarrow",
                            zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for k in range(b.num_rows):
            n_tot += int(b["n"][k].as_py())
            s_k = np.asarray(b["s"][k].as_py())
            d = len(s_k)
            xx_k = np.asarray(b["xx"][k].as_py()).reshape(d, d)
            s_tot = s_k if s_tot is None else s_tot + s_k
            xx_tot = xx_k if xx_tot is None else xx_tot + xx_k
    mean = s_tot / max(n_tot, 1)
    cov = xx_tot / max(n_tot, 1) - np.outer(mean, mean)
    w, V = np.linalg.eigh(cov)          # ascending eigenvalues
    comps = V[:, ::-1][:, :n_components]  # top components, columns
    # canonical sign: the largest-|loading| coordinate is positive
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])]
    comps = comps * np.where(flip < 0, -1.0, 1.0)
    state = ray.put((mean, comps))

    def project(t: pa.Table) -> pa.Table:
        mean_w, comps_w = ray.get(state)
        X = _emb_matrix(t[emb_col])
        P = (X - mean_w) @ comps_w
        lst = pa.ListArray.from_arrays(
            pa.array(np.arange(len(X) + 1) * P.shape[1], pa.int32()),
            pa.array(P.ravel()))
        return pa.table({id_col: t[id_col], "components": lst})

    return ds.map_batches(project, batch_format="pyarrow",
                          zero_copy_batch=True)


def q_token_counts(sf_dir: str):
    """Whitespace token counts, vectorized (count_substring_regex)."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        n_tok = pc.count_substring_regex(t["text"], r"\S+")
        return pa.table({"doc_id": t["doc_id"],
                         "n_tokens": pc.cast(n_tok, pa.int64())})
    return _t(ds.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True))


def q_text_quality(sf_dir: str):
    """Quality metrics per doc: token count, mean token length,
    type-token ratio (distinct/total tokens), all vectorized."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], r"\s+")
        n_tok = pc.list_value_length(toks)
        flat = toks.combine_chunks().flatten() \
            if isinstance(toks, pa.ChunkedArray) else toks.flatten()
        tok_len = pc.utf8_length(flat)
        lengths = n_tok.to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.cumsum(lengths) - lengths
        tl = tok_len.to_numpy(zero_copy_only=False).astype(np.float64)
        sums = np.add.reduceat(tl, starts) if len(tl) else np.zeros(0)
        sums = np.where(lengths > 0, sums, 0.0)
        # distinct tokens per row: dictionary-encode once (tokens →
        # int32 codes, bijective) and lexsort integer codes — no Python
        # string materialization (r2 VERDICT minor)
        parent = np.repeat(np.arange(t.num_rows), lengths)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        vals = enc.indices.to_numpy(zero_copy_only=False)
        order = np.lexsort((vals, parent))
        p_s, v_s = parent[order], vals[order]
        newgrp = np.ones(len(p_s), dtype=bool)
        newgrp[1:] = (p_s[1:] != p_s[:-1]) | (v_s[1:] != v_s[:-1])
        distinct = np.bincount(p_s[newgrp], minlength=t.num_rows)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(lengths, pa.int64()),
            "avg_token_len": pa.array(
                _np_round_away(sums / np.maximum(lengths, 1), 3)),
            "ttr": pa.array(_np_round_away(distinct / np.maximum(lengths, 1), 3)),
        })
    return _t(ds.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True))


def q_dedup_exact(sf_dir: str):
    """Exact dedup on a content key (first-3-token prefix): group → keep
    min doc_id. Per-batch Arrow pre-aggregation, then the partial rows
    are co-located by hash64(key) through the manual hash shuffle
    (content-key cardinality ~n, which hits Ray groupby's per-group
    wall — see pipelines/shuffle.py) and merged with one vectorized
    Arrow group_by per partition on the exact string key."""
    from ..state.sketches import hash64
    from .shuffle import hash_shuffle_apply

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    from .shuffle import coarse_buckets

    B = coarse_buckets(_parquet_rows(sf_dir, "documents"))

    def keyed(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], r"\s+")
        key = pc.binary_join(pc.list_slice(toks, 0, 3), " ")
        g = pa.table({"key": key, "doc_id": t["doc_id"]}) \
            .group_by("key").aggregate([("doc_id", "min"),
                                        ([], "count_all")])
        g = g.rename_columns(["key", "keep_id", "n"])
        return g.append_column("hkey",
                               pa.array(hash64(g["key"]).astype(np.int64)))

    def merge_part(g: pa.Table) -> pa.Table:
        out = g.group_by("key").aggregate([("keep_id", "min"), ("n", "sum")])
        return out.rename_columns(["key", "keep_id", "n"])

    empty = pa.table({"key": pa.array([], pa.string()),
                      "keep_id": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    agg = hash_shuffle_apply(
        ds.map_batches(keyed, batch_format="pyarrow", zero_copy_batch=True),
        "hkey", B, merge_part, empty)
    t = _t(agg)
    return pa.table({
        "key": t["key"],
        "keep_id": pc.cast(t["keep_id"], pa.int64()),
        "n": pc.cast(t["n"], pa.int64()),
    })


# ---------------------------------------------------------------------------
# similarity search

def q_ann_cosine_topk(sf_dir: str, n_queries: int = 5, k: int = 10):
    """Brute-force cosine top-k: the query matrix (vec_id < n_queries) is
    broadcast; each batch computes a partial top-k via one float64 matmul;
    a tiny final merge re-ranks. Scale path: IVF/LSH bucketing (see
    dedup.py) — this is the exact baseline."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qt = _t(ds.filter(expr=f"vec_id < {int(n_queries)}"))
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    Q = _emb_matrix(qt["embedding"])
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    q_ref = ray.put((q_ids, Qn))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids_w, Qn_w = ray.get(q_ref)
        X = _emb_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        S = Qn_w @ Xn.T                          # (q, batch)
        out_q, out_n, out_s = [], [], []
        for qi in range(S.shape[0]):
            mask = ids != q_ids_w[qi]            # exclude self
            s = S[qi][mask]
            nb = ids[mask]
            top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([int(q_ids_w[qi])] * len(top))
            out_n.extend(nb[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    parts = _t(ds.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True))
    pdf = parts.to_pandas()
    pdf["score_r"] = pdf["score"].round(5)
    pdf = pdf.sort_values(["query_id", "score_r", "neighbor_id"],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id").head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        pdf[["query_id", "neighbor_id", "rank"]].reset_index(drop=True))


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB) — names match the Ray outputs exactly

ORACLE_SQL: dict[str, str] = {
    "validate_documents": """
        SELECT doc_id,
               (regexp_full_match(lang, '(en|de|fr)')
                AND regexp_full_match(source, '(src[0-9])')
                AND n_chars <= 300 AND n_chars >= 0) AS verdict,
               CASE
                 WHEN NOT regexp_full_match(lang, '(en|de|fr)')
                   THEN '/@root/#Document/lang'
                 WHEN NOT regexp_full_match(source, '(src[0-9])')
                   THEN '/@root/#Document/source'
                 WHEN n_chars > 300 OR n_chars < 0
                   THEN '/@root/#Document/n_chars'
               END AS v_typepath
        FROM documents
    """,
    "violations_documents": """
        SELECT doc_id,
               CASE
                 WHEN NOT regexp_full_match(lang, '(en|de|fr)')
                   THEN '$.lang'
                 WHEN NOT regexp_full_match(source, '(src[0-9])')
                   THEN '$.source'
                 ELSE '$.n_chars' END AS datapath,
               CASE
                 WHEN NOT regexp_full_match(lang, '(en|de|fr)')
                   THEN '/@root/#Document/lang'
                 WHEN NOT regexp_full_match(source, '(src[0-9])')
                   THEN '/@root/#Document/source'
                 ELSE '/@root/#Document/n_chars' END AS typepath,
               CASE
                 WHEN NOT regexp_full_match(lang, '(en|de|fr)') THEN lang
                 WHEN NOT regexp_full_match(source, '(src[0-9])') THEN source
                 ELSE CAST(n_chars AS VARCHAR) END AS value_repr
        FROM documents
        WHERE NOT (regexp_full_match(lang, '(en|de|fr)')
                   AND regexp_full_match(source, '(src[0-9])')
                   AND n_chars <= 300 AND n_chars >= 0)
    """,
    "validate_events_props": """
        SELECT event_id,
               (TRY_CAST(json_extract(props, '$.k') AS DOUBLE) IS NOT NULL
                AND TRY_CAST(json_extract(props, '$.k') AS DOUBLE) >= 0
                AND TRY_CAST(json_extract(props, '$.k') AS DOUBLE) <= 50)
                 AS verdict
        FROM events
    """,
    "uniqueness_events_user": """
        SELECT user_id, COUNT(*) AS n
        FROM events GROUP BY user_id HAVING COUNT(*) > 1
    """,
    "referential_orders_customer": """
        SELECT COUNT(*) AS total_orders,
               COUNT(*) FILTER (o_custkey NOT IN
                   (SELECT c_custkey FROM customer)) AS dangling_orders
        FROM orders
    """,
    "column_stats_lineitem": """
        SELECT 'l_quantity' AS "column", COUNT(*) AS n,
               COUNT(*) - COUNT(l_quantity) AS nulls,
               ROUND(MIN(l_quantity), 3) AS min_v,
               ROUND(MAX(l_quantity), 3) AS max_v,
               ROUND(AVG(l_quantity), 3) AS mean_v
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', COUNT(*),
               COUNT(*) - COUNT(l_extendedprice),
               ROUND(MIN(l_extendedprice), 3),
               ROUND(MAX(l_extendedprice), 3),
               ROUND(AVG(l_extendedprice), 3)
        FROM lineitem
    """,
    "q1_lineitem": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice) / COUNT(*), 2) AS avg_price,
               COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "segment_revenue": """
        SELECT c_mktsegment AS segment,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
    "top_docs_by_chars": """
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 20
    """,
    "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               ROUND(SUM(value), 3) AS sum_value, COUNT(*) AS n
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "lang_distribution": """
        SELECT lang, COUNT(*) AS n_docs,
               ROUND(SUM(n_chars) * 1.0 / COUNT(*), 3) AS avg_chars
        FROM documents GROUP BY lang
    """,
    "token_counts": """
        SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n_tokens
        FROM documents
    """,
    "text_quality": """
        WITH toks AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS tok
          FROM documents)
        SELECT doc_id, len(tok) AS n_tokens,
               ROUND(list_sum(list_transform(tok, t -> length(t))) * 1.0
                     / greatest(len(tok), 1), 3) AS avg_token_len,
               ROUND(len(list_distinct(tok)) * 1.0
                     / greatest(len(tok), 1), 3) AS ttr
        FROM toks
    """,
    "dedup_exact": """
        WITH keyed AS (
          SELECT doc_id,
                 array_to_string(regexp_extract_all(text, '\\S+')[1:3], ' ')
                   AS key
          FROM documents)
        SELECT key, MIN(doc_id) AS keep_id, COUNT(*) AS n
        FROM keyed GROUP BY key
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT vec_id AS query_id,
                          CAST(embedding AS DOUBLE[]) AS qe
                   FROM embeddings WHERE vec_id < 5),
             scored AS (
               SELECT q.query_id, e.vec_id AS neighbor_id,
                      ROUND(list_cosine_similarity(
                          q.qe, CAST(e.embedding AS DOUBLE[])), 5)
                        AS score_r
               FROM q CROSS JOIN embeddings e
               WHERE e.vec_id != q.query_id),
             ranked AS (
               SELECT query_id, neighbor_id,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY score_r DESC, neighbor_id) AS rank
               FROM scored)
        SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 10
    """,
}


# ---------------------------------------------------------------------------
# set ops / explode / multi-join / sessionize (coverage: distinct, unnest,
# broadcast chains, groupby().map_groups ordered windows)

def q_distinct_langs(sf_dir: str):
    """Distinct values of one column (ds.unique — a keyed shuffle)."""
    ds = _read(sf_dir, "documents", columns=["lang"])
    vals = sorted(ds.unique("lang"))
    return pa.table({"lang": pa.array(vals, pa.string())})


def q_embedding_stats(sf_dir: str):
    """Explode/flatten a list column: per-vector min/max/mean of the
    embedding values (vectorized flatten + segment reduce)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def fn(t: pa.Table) -> pa.Table:
        emb = t["embedding"]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        lengths = pc.list_value_length(emb).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        flat = emb.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        starts = np.cumsum(lengths) - lengths
        mins = np.minimum.reduceat(flat, starts)
        maxs = np.maximum.reduceat(flat, starts)
        sums = np.add.reduceat(flat, starts)
        return pa.table({
            "vec_id": t["vec_id"],
            "dim": pa.array(lengths),
            "min_v": _round(pa.array(mins), 5),
            "max_v": _round(pa.array(maxs), 5),
            "mean_v": _round(pa.array(sums / np.maximum(lengths, 1)), 5),
        })
    return _t(ds.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True))


def q_nation_revenue(sf_dir: str):
    """Three-table join (orders⋈customer⋈nation) as a chained broadcast
    lookup — both dimension sides are small, so nothing shuffles."""
    cust = _t(_read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]))
    nation = _t(_read(sf_dir, "nation", columns=["n_nationkey", "n_name"]))
    # pre-join the two dimension tables once on the driver (both tiny),
    # broadcast the composed custkey→nation-name map as Arrow arrays
    nidx = pc.index_in(cust["c_nationkey"],
                       value_set=nation["n_nationkey"].combine_chunks())
    cust_names = pc.take(nation["n_name"].combine_chunks(), nidx)
    lookup_ref = ray.put((cust["c_custkey"].combine_chunks(), cust_names))

    def add_nation(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(lookup_ref)
        # null probe = dangling custkey — dropped (INNER-join semantics)
        idx = pc.index_in(t["o_custkey"], value_set=keys)
        g = t.append_column("n_name", pc.take(vals, idx)) \
            .filter(pc.is_valid(idx)) \
            .group_by("n_name").aggregate([("o_totalprice", "sum"),
                                           ([], "count_all")])
        return g.rename_columns(["n_name", "revenue", "n_orders"])

    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = (orders.map_batches(add_nation, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby("n_name").sum(["revenue", "n_orders"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": t["n_name"],
            "revenue": _round(t["sum(revenue)"], 2),
            "n_orders": pc.cast(t["sum(n_orders)"], pa.int64()),
        })
    return _t(agg.map_batches(final, batch_format="pyarrow"))


def q_user_sessions(sf_dir: str):
    """Session windows: per user, sort events by ts and count sessions
    split at >30-minute gaps (groupby().map_groups over the ordered log).

    SMALL-SCALE BASELINE: per-user pandas groups are exactly the
    Ray-groupby-wall pattern BASELINE.md measures (sort-based groupby
    cost grows with key cardinality); the scale path is
    ``q_user_sessions_salted`` — same oracle, hash-partitioned with
    vectorized per-partition session counting."""
    import pandas as pd

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        gaps = g["ts"].diff() > pd.Timedelta(minutes=30)
        return pd.DataFrame({
            "user_id": [g["user_id"].iloc[0]],
            "n_events": [len(g)],
            "n_sessions": [int(gaps.sum()) + 1],
        })

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    t = _t(out)
    return pa.table({
        "user_id": pc.cast(t["user_id"], pa.int64()),
        "n_events": pc.cast(t["n_events"], pa.int64()),
        "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
    })


def sessionize_salted(ds: "ray.data.Dataset", gap_minutes: int = 30,
                      n_rows: int | None = None):
    """Hot-key-safe sessionization: salt the per-user window by coarse
    time bucket (day), sessionize inside each (user, day) group, then
    merge the per-bucket partials in time order per user — a 100×-skewed
    user becomes ~n_days bounded groups plus a tiny merge instead of one
    straggler task holding every event. Exactly equivalent to the
    single-group sessionization (boundary sessions whose gap across the
    bucket edge is ≤ the threshold are merged back).

    Both phases run through the manual hash shuffle with fully
    vectorized within-partition run detection — (user, day) cardinality
    approaches the event count, which hits Ray groupby's per-group wall
    (see pipelines/shuffle.py)."""
    from ..state.sketches import rehash
    from .shuffle import coarse_buckets, hash_shuffle_apply

    gap_us = np.int64(gap_minutes * 60 * 1_000_000)
    if n_rows is None:
        n_rows = ds.count()
    B = coarse_buckets(n_rows, cap=1024)

    def add_keys(t: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(t["ts"], unit="day"), pa.int64())
        uid = t["user_id"].combine_chunks() \
            if isinstance(t["user_id"], pa.ChunkedArray) else t["user_id"]
        u = uid.to_numpy(zero_copy_only=False).astype(np.int64)
        d = day.to_numpy(zero_copy_only=False) \
            if not isinstance(day, pa.ChunkedArray) \
            else day.combine_chunks().to_numpy(zero_copy_only=False)
        hkey = (rehash(u.view(np.uint64), 17) ^ d.view(np.uint64)) \
            .astype(np.int64)
        return pa.table({"hkey": pa.array(hkey), "user_id": uid,
                         "day": pa.array(d), "ts": t["ts"]})

    def within(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                            ("day", "ascending"),
                                            ("ts", "ascending")])
        g2 = g.take(idx)
        u = g2["user_id"].to_numpy(zero_copy_only=False)
        d = g2["day"].to_numpy(zero_copy_only=False)
        ts = g2["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]") \
            .astype(np.int64)
        n = len(u)
        new = np.ones(n, dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        run = np.cumsum(new) - 1
        counts = np.bincount(run)
        starts = np.cumsum(counts) - counts
        gaps = np.zeros(n, dtype=bool)
        gaps[1:] = (ts[1:] - ts[:-1] > gap_us) & ~new[1:]
        n_sessions = np.bincount(run[gaps], minlength=len(counts)) + 1
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "n_events": pa.array(counts, pa.int64()),
            "n_sessions": pa.array(n_sessions, pa.int64()),
            "first_ts": pa.array(ts[starts], pa.int64()),
            "last_ts": pa.array(ts[starts + counts - 1], pa.int64()),
        })

    empty1 = pa.table({"user_id": pa.array([], pa.int64()),
                       "n_events": pa.array([], pa.int64()),
                       "n_sessions": pa.array([], pa.int64()),
                       "first_ts": pa.array([], pa.int64()),
                       "last_ts": pa.array([], pa.int64())})
    parts = hash_shuffle_apply(
        ds.map_batches(add_keys, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, within, empty1)

    def merge(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("user_id", "ascending"),
                                            ("first_ts", "ascending")])
        g2 = g.take(idx)
        u = g2["user_id"].to_numpy(zero_copy_only=False)
        fts = g2["first_ts"].to_numpy(zero_copy_only=False)
        lts = g2["last_ts"].to_numpy(zero_copy_only=False)
        ne = g2["n_events"].to_numpy(zero_copy_only=False)
        ns = g2["n_sessions"].to_numpy(zero_copy_only=False)
        n = len(u)
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        run = np.cumsum(new) - 1
        counts = np.bincount(run)
        starts = np.cumsum(counts) - counts
        merged = np.zeros(n, dtype=bool)
        merged[1:] = (fts[1:] - lts[:-1] <= gap_us) & ~new[1:]
        return pa.table({
            "user_id": pa.array(u[starts], pa.int64()),
            "n_events": pa.array(
                np.add.reduceat(ne, starts), pa.int64()),
            "n_sessions": pa.array(
                np.add.reduceat(ns, starts)
                - np.bincount(run[merged], minlength=len(counts)),
                pa.int64()),
        })

    empty2 = pa.table({"user_id": pa.array([], pa.int64()),
                       "n_events": pa.array([], pa.int64()),
                       "n_sessions": pa.array([], pa.int64())})
    B2 = coarse_buckets(n_rows, rows_per_part=800_000, cap=1024)
    return hash_shuffle_apply(parts, "user_id", B2, merge, empty2)


def q_user_sessions_salted(sf_dir: str):
    """Same result as q_user_sessions via the salted two-phase plan.
    Row count comes from the parquet footer (saves sessionize_salted's
    ds.count() — one whole Ray execution of the read stage)."""
    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    t = _t(sessionize_salted(ds, n_rows=_parquet_rows(sf_dir, "events")))
    return pa.table({
        "user_id": pc.cast(t["user_id"], pa.int64()),
        "n_events": pc.cast(t["n_events"], pa.int64()),
        "n_sessions": pc.cast(t["n_sessions"], pa.int64()),
    })


def q_dedup_embedding_exact(sf_dir: str, threshold: float = 0.4):
    """EXACT embedding near-dup pairs (cosine ≥ threshold, id_a < id_b):
    the brute-force verify baseline for dedup.embedding_near_dups' LSH
    path. The full normalized matrix is broadcast once via ray.put and
    each batch does one matmul against it — exact all-pairs is inherently
    O(n²) and is kept as the small-side verification tool; the LSH
    variant (dedup_embedding_cosine) is the scale path."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    all_t = _t(ds)
    ids_all = all_t["vec_id"].to_numpy(zero_copy_only=False)
    X = _emb_matrix(all_t["embedding"])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    side = ray.put((ids_all, Xn))

    def pairs_fn(t: pa.Table) -> pa.Table:
        ids_w, Xn_w = ray.get(side)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        Y = _emb_matrix(t["embedding"])
        Yn = Y / np.maximum(np.linalg.norm(Y, axis=1, keepdims=True),
                            1e-12)
        S = Yn @ Xn_w.T                         # (batch, all)
        keep = S >= threshold
        # id_a < id_b keeps each unordered pair once (and drops self)
        keep &= ids[:, None] < ids_w[None, :]
        bi, aj = np.nonzero(keep)
        return pa.table({
            "id_a": pa.array(ids[bi], pa.int64()),
            "id_b": pa.array(ids_w[aj], pa.int64()),
            "cosine": pa.array(
                _np_round_away(S[bi, aj], 4), pa.float64()),
        })

    t = _t(ds.map_batches(pairs_fn, batch_format="pyarrow",
                          zero_copy_batch=True))
    if t.num_columns == 0:
        t = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if t.num_rows:
        idx = pc.sort_indices(t, sort_keys=[("id_a", "ascending"),
                                            ("id_b", "ascending")])
        t = t.take(idx)
    return t


ORACLE_SQL.update({
    "dedup_embedding_exact": """
        -- DOUBLE[] cast: the FLOAT[] overload computes in float32,
        -- which agrees with the engine's float64 kernel only to ~1e-7
        -- and flipped a 4-dp rounding boundary on a random corpus
        -- (sweep seed 9076); in float64 both sides agree to ~1e-15
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_cosine_similarity(
                   CAST(a.embedding AS DOUBLE[]),
                   CAST(b.embedding AS DOUBLE[])), 4) AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[]))
              >= 0.4
    """,
})


def q_distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): distinct users per event type.
    Per-batch Arrow dedupe of (type, user) pairs, global dedupe by
    co-locating pair-hash partitions through the manual hash shuffle
    (pair cardinality ~ users × types — Ray groupby's per-group wall),
    vectorized run-dedupe + per-type partial counts per partition, and a
    tiny driver-side sum of one row per (partition, type)."""
    from ..state.sketches import hash64, rehash
    from .shuffle import hash_shuffle_apply

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    from .shuffle import coarse_buckets

    B = coarse_buckets(_parquet_rows(sf_dir, "events"), cap=1024)

    def pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "user_id"]).aggregate([])
        h = rehash(hash64(g["event_type"])
                   ^ hash64(g["user_id"]), 31).astype(np.int64)
        return pa.table({"hkey": pa.array(h),
                         "event_type": g["event_type"],
                         "user_id": g["user_id"]})

    def count_part(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(g, sort_keys=[("event_type", "ascending"),
                                            ("user_id", "ascending")])
        g2 = g.take(idx)
        et = g2["event_type"].combine_chunks()
        uid = g2["user_id"].to_numpy(zero_copy_only=False)
        n = g2.num_rows
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = pc.not_equal(et.slice(1), et.slice(0, n - 1))                 .to_numpy(zero_copy_only=False).astype(bool)                 | (uid[1:] != uid[:-1])
        # distinct pairs in this partition, counted per type
        firsts = np.flatnonzero(new)
        type_new = np.ones(n, dtype=bool)
        if n > 1:
            type_new[1:] = pc.not_equal(et.slice(1), et.slice(0, n - 1))                 .to_numpy(zero_copy_only=False).astype(bool)
        type_run = np.cumsum(type_new) - 1
        counts = np.bincount(type_run[new])
        starts = np.flatnonzero(type_new)
        return pa.table({"event_type": et.take(pa.array(starts, pa.int64())),
                         "n_users": pa.array(counts, pa.int64())})

    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "n_users": pa.array([], pa.int64())})
    parts = hash_shuffle_apply(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        "hkey", B, count_part, empty)
    t = _t(parts)
    out = t.group_by("event_type").aggregate([("n_users", "sum")])
    return pa.table({"event_type": out["event_type"],
                     "n_users": pc.cast(out["n_users_sum"], pa.int64())})


ORACLE_SQL["distinct_users_per_type"] = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
"""


def q_events_sliding(sf_dir: str):
    """SLIDING windows: 1-hour windows advancing every 15 minutes. Each
    event belongs to exactly 4 windows (starts = its 15-min bucket minus
    0/15/30/45 min), so the per-batch stage emits 4 pre-aggregated
    partial rows per (window, type) and a tiny keyed sum merges —
    never 4× raw rows through the shuffle."""
    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        b15 = pc.floor_temporal(t["ts"], multiple=15, unit="minute")
        parts = []
        for k in range(4):
            ws = pc.subtract(b15, pa.scalar(k * 15 * 60 * 1_000_000,
                                            pa.duration("us")))
            g = pa.table({"event_type": t["event_type"],
                          "window_start": ws,
                          "value": t["value"]})                 .group_by(["event_type", "window_start"]).aggregate(
                    [("value", "sum"), ([], "count_all")])
            parts.append(g.rename_columns(
                ["event_type", "window_start", "sum_value", "n"]))
        return pa.concat_tables(parts)

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["event_type", "window_start"]).sum(["sum_value", "n"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"],
            "sum_value": _round(t["sum(sum_value)"], 3),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })
    return _t(agg.map_batches(final, batch_format="pyarrow"))


def q_top_docs_per_lang(sf_dir: str, k: int = 3):
    """Grouped top-k (windowed rank): top-3 docs by n_chars per lang.
    Per-batch partial top-k per group, tiny final re-rank — no global
    sort."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"],
               split=False)

    def partial_topk(t: pa.Table) -> pa.Table:
        idx = pc.sort_indices(t, sort_keys=[("lang", "ascending"),
                                            ("n_chars", "descending"),
                                            ("doc_id", "ascending")])
        t2 = t.take(idx)
        langs = t2["lang"].to_numpy(zero_copy_only=False)
        new = np.ones(len(langs), dtype=bool)
        new[1:] = langs[1:] != langs[:-1]
        run = np.cumsum(new) - 1
        counts = np.bincount(run)
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(langs)) - np.repeat(starts, counts)
        return t2.filter(pa.array(pos < k))

    top = _t(ds.map_batches(partial_topk, batch_format="pyarrow",
                            zero_copy_batch=True))
    top = partial_topk(top)
    langs = top["lang"].to_numpy(zero_copy_only=False)
    new = np.ones(len(langs), dtype=bool)
    new[1:] = langs[1:] != langs[:-1]
    run = np.cumsum(new) - 1
    counts = np.bincount(run) if len(langs) else np.zeros(0, np.int64)
    starts = np.cumsum(counts) - counts
    ranks = np.arange(len(langs)) - np.repeat(starts, counts) + 1
    return top.append_column("rank", pa.array(ranks, pa.int64()))


ORACLE_SQL.update({
    "events_sliding": """
        WITH buckets AS (
          SELECT event_type, value,
                 time_bucket(INTERVAL '15 minutes', ts) AS b15
          FROM events),
        windows AS (
          SELECT event_type, value,
                 b15 - (k * INTERVAL '15 minutes') AS window_start
          FROM buckets, (SELECT unnest([0, 1, 2, 3]) AS k))
        SELECT event_type, window_start,
               ROUND(SUM(value), 3) AS sum_value, COUNT(*) AS n
        FROM windows GROUP BY event_type, window_start
    """,
    "top_docs_per_lang": """
        WITH ranked AS (
          SELECT doc_id, lang, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY lang
                     ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents)
        SELECT doc_id, lang, n_chars, rank FROM ranked WHERE rank <= 3
    """,
})


def q_sample_documents(sf_dir: str):
    """Deterministic content-keyed 20% sample: keep rows where
    ``(doc_id * 2654435761) mod 2^32 < 0.2 * 2^32`` (Knuth
    multiplicative hash). Unlike ``ds.random_sample`` — whose output
    depends on the physical block layout — a content-keyed sample is
    reproducible across reruns, repartitions and engines; at 100 TB
    reproducibility IS the operator (resumable pipelines re-derive the
    same sample). Exact integer arithmetic ⇒ DuckDB hash oracle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        m = (ids * np.uint64(2654435761)) % np.uint64(1 << 32) \
            < np.uint64(858993459)  # floor(0.2 * 2^32)
        return t.filter(pa.array(m))

    return _t_or(ds.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True),
                 pa.table({"doc_id": pa.array([], pa.int64()),
                           "lang": pa.array([], pa.string())}))


ORACLE_SQL.update({
    "embedding_covariance": """
        WITH u AS (
          SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                 CAST(unnest(embedding) AS DOUBLE) AS x
          FROM embeddings)
        SELECT a.i AS i, b.i AS j, ROUND(covar_pop(a.x, b.x), 9) AS cov
        FROM u a JOIN u b USING (vec_id)
        GROUP BY a.i, b.i
    """,
    "text_clean": """
        SELECT doc_id,
               lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
                 AS clean_text,
               length(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                 AS clean_chars
        FROM documents
    """,
    "top_ngrams": """
        WITH toks AS (
          SELECT regexp_extract_all(text, '\\S+') AS w FROM documents),
        grams AS (
          SELECT unnest(list_transform(range(1, len(w)),
                   i -> array_to_string(list_slice(w, i, i + 1), ' ')))
                 AS ngram
          FROM toks WHERE len(w) >= 2)
        SELECT ngram, count(*) AS n FROM grams
        GROUP BY ngram ORDER BY n DESC, ngram LIMIT 20
    """,
    "sample_documents": """
        SELECT doc_id, lang FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 < 858993459
    """,
    "distinct_langs": "SELECT DISTINCT lang FROM documents",
    "embedding_stats": """
        SELECT vec_id, len(embedding) AS dim,
               ROUND(list_min(embedding), 5) AS min_v,
               ROUND(list_max(embedding), 5) AS max_v,
               ROUND(list_sum(embedding) / len(embedding), 5) AS mean_v
        FROM embeddings
    """,
    "nation_revenue": """
        SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "user_sessions": """
        WITH gaps AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts)
                        > INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events)
        SELECT user_id, COUNT(*) AS n_events,
               CAST(SUM(new_session) + 1 AS BIGINT) AS n_sessions
        FROM gaps GROUP BY user_id
    """,
})
# the salted two-phase plan must produce the identical result
ORACLE_SQL["user_sessions_salted"] = ORACLE_SQL["user_sessions"]
# the partitioned anti-join must match the broadcast one
ORACLE_SQL["referential_partitioned"] = \
    ORACLE_SQL["referential_orders_customer"]


def q_order_lineitem_join(sf_dir: str):
    """Two LARGE sides: explicit partitioned hash join through the manual
    hash shuffle — both sides carry (key, side) rows, ``key % B``
    co-locates matching keys, and each partition aggregates the lineitem
    side with one vectorized Arrow group_by then semi-joins against the
    partition's order keys (o_orderkey is the orders PK, so the inner
    join reduces to an is_in filter). No broadcast; only the keyed rows
    shuffle, and B bounds per-task memory. (Salting a hot key = widening
    its bucket id range; keys here are uniform.)"""
    from .shuffle import hash_shuffle_apply

    # bucket count scales with the big side so per-task memory stays
    # bounded as the input grows (≈500K joined rows per bucket target)
    from .shuffle import coarse_buckets

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir, "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    # split=False: the shuffle's _split tasks are cheap hash/sort work, so
    # post-decode block splitting only adds overhead here (measured 3.1 s
    # → 1.4 s at sf0.1/32 CPUs together with the pre-aggregation below)
    orders = _read(sf_dir, "orders", columns=["o_orderkey"], split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_quantity"], split=False)

    def left_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["o_orderkey"],
                         "sum_qty": pa.nulls(t.num_rows, pa.float64()),
                         "n": pa.nulls(t.num_rows, pa.int64()),
                         "side": pa.array(
                             np.zeros(t.num_rows, dtype=np.int8))})

    def right_rows(t: pa.Table) -> pa.Table:
        # per-batch partial aggregate BEFORE the shuffle: only one
        # (key, sum, count) row per distinct order per batch moves —
        # at ~4 lines/order that's a 4x cut in shuffled rows
        g = t.group_by("l_orderkey").aggregate(
            [("l_quantity", "sum"), ([], "count_all")])
        return pa.table({"key": g["l_orderkey"],
                         "sum_qty": pc.cast(g["l_quantity_sum"],
                                            pa.float64()),
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "side": pa.array(
                             np.ones(g.num_rows, dtype=np.int8))})

    tagged = orders.map_batches(left_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(right_rows, batch_format="pyarrow"))

    empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "n_lines": pa.array([], pa.int64()),
                      "sum_qty": pa.array([], pa.float64())})

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left_keys = g.filter(pa.array(side == 0))["key"].combine_chunks()
        right = g.filter(pa.array(side == 1))
        if len(left_keys) == 0 or right.num_rows == 0:
            return empty
        agg = right.group_by("key").aggregate(
            [("sum_qty", "sum"), ("n", "sum")])
        agg = agg.rename_columns(["o_orderkey", "sum_qty", "n_lines"])
        agg = agg.filter(pc.is_in(agg["o_orderkey"], value_set=left_keys))
        return agg.select(["o_orderkey", "n_lines", "sum_qty"])

    out = hash_shuffle_apply(tagged, "key", B, join_part, empty)
    t = _t(out)
    return pa.table({
        "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
        "n_lines": pc.cast(t["n_lines"], pa.int64()),
        "sum_qty": _round(pc.cast(t["sum_qty"], pa.float64()), 2),
    })


def q_order_lineitem_left(sf_dir: str):
    """LEFT OUTER large-large join: every order row survives; orders
    with no lineitem get n_lines = 0 and a NULL sum (SQL LEFT JOIN +
    GROUP BY semantics). Same partitioned-hash-shuffle plan as the inner
    join above — pre-aggregated lineitem partials and tagged order rows
    co-locate by key, and each partition performs one vectorized Arrow
    left-outer join — so null-extension costs nothing extra over the
    inner plan (the driver never sees unmatched keys specially)."""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderstatus"], split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_quantity"], split=False)

    def left_rows(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["o_orderkey"],
                         "status": t["o_orderstatus"],
                         "sum_qty": pa.nulls(t.num_rows, pa.float64()),
                         "n": pa.nulls(t.num_rows, pa.int64()),
                         "side": pa.array(
                             np.zeros(t.num_rows, dtype=np.int8))})

    def right_rows(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate(
            [("l_quantity", "sum"), ([], "count_all")])
        return pa.table({"key": g["l_orderkey"],
                         "status": pa.nulls(g.num_rows, pa.string()),
                         "sum_qty": pc.cast(g["l_quantity_sum"],
                                            pa.float64()),
                         "n": pc.cast(g["count_all"], pa.int64()),
                         "side": pa.array(
                             np.ones(g.num_rows, dtype=np.int8))})

    tagged = orders.map_batches(left_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(right_rows, batch_format="pyarrow"))

    empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "o_orderstatus": pa.array([], pa.string()),
                      "n_lines": pa.array([], pa.int64()),
                      "sum_qty": pa.array([], pa.float64())})

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)) \
            .select(["key", "status"]) \
            .rename_columns(["o_orderkey", "o_orderstatus"])
        if left.num_rows == 0:
            return empty
        right = g.filter(pa.array(side == 1))
        agg = right.group_by("key").aggregate(
            [("sum_qty", "sum"), ("n", "sum")])
        agg = agg.rename_columns(["o_orderkey", "sum_qty", "n_lines"])
        j = left.join(agg, keys="o_orderkey", join_type="left outer")
        n = pc.coalesce(j["n_lines"], pa.scalar(0, pa.int64()))
        return pa.table({"o_orderkey": j["o_orderkey"],
                         "o_orderstatus": j["o_orderstatus"],
                         "n_lines": pc.cast(n, pa.int64()),
                         "sum_qty": pc.cast(j["sum_qty"], pa.float64())})

    out = hash_shuffle_apply(tagged, "key", B, join_part, empty)
    t = _t(out)
    return pa.table({
        "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
        "o_orderstatus": t["o_orderstatus"],
        "n_lines": pc.cast(t["n_lines"], pa.int64()),
        "sum_qty": _round(pc.cast(t["sum_qty"], pa.float64()), 2),
    })


ORACLE_SQL["order_lineitem_left"] = """
    SELECT o.o_orderkey, o.o_orderstatus,
           CAST(count(l.l_orderkey) AS BIGINT) AS n_lines,
           round(sum(l.l_quantity), 2) AS sum_qty
    FROM orders o LEFT JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderstatus
"""


def q_dedup_ngram_jaccard(sf_dir: str):
    """Oracle-checked alias for dedup.q_ngram_jaccard_pairs (exact word
    3-gram Jaccard over first-2-token-key pair candidates, verified in a
    distributed keyed join)."""
    from .dedup import q_ngram_jaccard_pairs

    return q_ngram_jaccard_pairs(sf_dir)


ORACLE_SQL["dedup_ngram_jaccard"] = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
    keyed AS (
      SELECT doc_id,
             array_to_string(list_slice(w, 1, 2), ' ') AS key,
             CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                  ELSE list_distinct(list_transform(range(1, len(w) - 1),
                           i -> array_to_string(list_slice(w, i, i + 2),
                                                ' '))) END AS s
      FROM toks)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(len(list_intersect(a.s, b.s)) * 1.0 /
                 len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
    FROM keyed a JOIN keyed b ON a.key = b.key AND a.doc_id < b.doc_id
"""


ORACLE_SQL["order_lineitem_join"] = """
    SELECT o_orderkey, COUNT(*) AS n_lines,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey
"""


# ---------------------------------------------------------------------------
# text analysis: language-ID heuristic + rolling-hash fingerprint

# fixed stopword profiles (deterministic heuristic; the operator — not
# classifier accuracy over this synthetic corpus — is what's under test)
_LANG_PROFILES = (
    ("en", ("the", "a", "fast", "slow", "big", "small")),
    ("de", ("hash", "batch", "window", "merge", "filter")),
    ("fr", ("query", "table", "join", "group", "order")),
)

_FP_MOD = np.int64(1_000_000_007)
_FP_BASE = np.int64(31)
_FP_SEED = np.int64(7)


def q_lang_id(sf_dir: str):
    """Language-ID n-gram/stopword heuristic: per-language token-hit
    counts (with multiplicity) + argmax prediction, first-profile wins
    ties. Fully vectorized: one token flatten, one is_in per profile,
    segment sums."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = np.nan_to_num(
            pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        flat = toks.flatten()
        parent = np.repeat(np.arange(t.num_rows), lengths)
        scores = []
        for _lang, words in _LANG_PROFILES:
            hit = pc.is_in(flat, value_set=pa.array(words)) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            scores.append(np.bincount(parent, weights=hit,
                                      minlength=t.num_rows).astype(np.int64))
        S = np.stack(scores)                      # (n_lang, n_rows)
        best = np.argmax(S, axis=0)               # first max wins ties
        langs = np.asarray([l for l, _ in _LANG_PROFILES], dtype=object)
        return pa.table({
            "doc_id": t["doc_id"],
            "s_en": pa.array(S[0], pa.int64()),
            "s_de": pa.array(S[1], pa.int64()),
            "s_fr": pa.array(S[2], pa.int64()),
            "lang_pred": pa.array(langs[best], pa.string()),
        })
    return _t(ds.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True))


ORACLE_SQL["lang_id"] = """
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS w FROM documents),
    scored AS (
      SELECT doc_id,
        len(list_filter(w, t -> list_contains(
            ['the','a','fast','slow','big','small'], t))) AS s_en,
        len(list_filter(w, t -> list_contains(
            ['hash','batch','window','merge','filter'], t))) AS s_de,
        len(list_filter(w, t -> list_contains(
            ['query','table','join','group','order'], t))) AS s_fr
      FROM toks)
    SELECT doc_id, s_en, s_de, s_fr,
           CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
                WHEN s_de >= s_fr THEN 'de'
                ELSE 'fr' END AS lang_pred
    FROM scored
"""


def q_doc_fingerprint(sf_dir: str):
    """Per-document rolling-hash fingerprint over the text's code
    points: acc = (acc*31 + cp) mod 1e9+7, seeded 7 — the polynomial
    fingerprint a shard-level dedup/lineage manifest would carry.
    Vectorized via the closed form fp = 7·31^L + Σ cp_i·31^(L-1-i)
    (mod p) over the UTF-8 byte buffer for all-ASCII rows (byte ==
    code point); rows with non-ASCII bytes take a per-row fallback —
    same definition, code points via Python ord."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        col = t["text"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")  # null-text robustness (absent here)
        n = len(col)
        lengths_b = pc.binary_length(col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # raw UTF-8 bytes + per-row offsets from the Arrow buffers
        arr = col.cast(pa.large_binary())
        buf = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + n + 1]
        maxlen = int(lengths_b.max()) if n else 0
        # pow31[k] = 31^k mod p
        pow31 = np.empty(maxlen + 1, dtype=np.int64)
        if maxlen >= 0:
            pow31[0] = 1
            for k in range(1, maxlen + 1):
                pow31[k] = (pow31[k - 1] * _FP_BASE) % _FP_MOD
        parent = np.repeat(np.arange(n), lengths_b)
        starts = offs[:-1]
        pos = np.arange(len(parent)) - np.repeat(
            np.cumsum(lengths_b) - lengths_b, lengths_b)
        flat = buf[np.repeat(starts, lengths_b) + pos].astype(np.int64)
        exp = np.repeat(lengths_b, lengths_b) - 1 - pos
        contrib = (flat % _FP_MOD) * pow31[exp] % _FP_MOD
        row_starts = np.cumsum(lengths_b) - lengths_b
        sums = np.zeros(n, dtype=np.int64)
        if len(contrib):
            nonempty = lengths_b > 0
            sums_ne = np.add.reduceat(contrib % _FP_MOD,
                                      row_starts[nonempty]) % _FP_MOD
            sums[nonempty] = sums_ne
        fp = (sums + _FP_SEED * pow31[lengths_b]) % _FP_MOD
        # non-ASCII rows: recompute over CODE POINTS (oracle semantics)
        ascii_ok = np.ones(n, dtype=bool)
        if len(flat):
            high = np.bincount(parent[flat >= 128], minlength=n)
            ascii_ok = high == 0
        if not ascii_ok.all():
            texts = col.to_pylist()
            for i in np.nonzero(~ascii_ok)[0]:
                acc = int(_FP_SEED)
                for ch in texts[i] or "":
                    acc = (acc * 31 + ord(ch)) % int(_FP_MOD)
                fp[i] = acc
        return pa.table({"doc_id": t["doc_id"],
                         "fingerprint": pa.array(fp, pa.int64())})
    return _t(ds.map_batches(fn, batch_format="pyarrow",
                             zero_copy_batch=True))


ORACLE_SQL["doc_fingerprint"] = """
    SELECT doc_id,
           list_reduce(list_prepend(7::BIGINT,
               list_transform(range(1, len(text) + 1),
                              i -> ascii(text[i]))),
               (acc, b) -> (acc * 31 + b) % 1000000007) AS fingerprint
    FROM documents
"""


def _kmeans_cosine(X: np.ndarray, n_clusters: int, seed: int = 42,
                   iters: int = 10) -> np.ndarray:
    """Seeded spherical k-means (Lloyd on normalized vectors, cosine =
    dot). Deterministic; empty clusters re-seeded from the farthest
    points. Returns (n_clusters, dim) normalized centroids."""
    rng = np.random.default_rng(seed)
    n = len(X)
    C = X[rng.choice(n, size=min(n_clusters, n), replace=False)].copy()
    if len(C) < n_clusters:
        C = np.vstack([C, rng.normal(size=(n_clusters - len(C),
                                           X.shape[1]))])
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        sim = X @ C.T
        assign = np.argmax(sim, axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, X)
        sizes = np.bincount(assign, minlength=n_clusters)
        empty = sizes == 0
        if empty.any():
            # farthest points from their centroid re-seed empty clusters
            far = np.argsort(sim[np.arange(n), assign])[:int(empty.sum())]
            newC[empty] = X[far]
        C = newC / np.maximum(np.linalg.norm(newC, axis=1, keepdims=True),
                              1e-12)
    return C


def q_ann_ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
                   n_clusters: int | None = None,
                   nprobe: int | None = None):
    """IVF cosine top-k — the similarity-search SCALE path next to the
    brute-force baseline (q_ann_cosine_topk): spherical-k-means coarse
    centroids (trained once on a driver-side sample, broadcast); each
    batch assigns its vectors to centroids with one matmul and scores each
    query ONLY against rows in that query's ``nprobe`` nearest clusters
    — at scale this prunes (1 - nprobe/n_clusters) of the scoring work
    and, with cluster-partitioned storage, the read itself. With
    ``nprobe == n_clusters`` the result equals the exact baseline
    (tested); the approximate default trades recall for the pruning.
    Rows-only oracle (approximate by design)."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n_rows = _parquet_rows(sf_dir, "embeddings")
    if n_clusters is None:
        n_clusters = int(min(1024, max(8, np.sqrt(n_rows))))
    if nprobe is None:
        nprobe = max(2, n_clusters // 4)
    nprobe = min(nprobe, n_clusters)

    # train on a bounded sample (first blocks — deterministic), driver-side
    sample = _t(ds.limit(20_000))
    Xs = _emb_matrix(sample["embedding"])
    Xs = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
    C = _kmeans_cosine(Xs, n_clusters)

    qt = _t(ds.filter(expr=f"vec_id < {int(n_queries)}"))
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    Q = _emb_matrix(qt["embedding"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # per-query probed clusters + the union set
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    probed_union = np.unique(probe)
    state_ref = ray.put((q_ids, Qn, C, probe, probed_union))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids_w, Qn_w, C_w, probe_w, union_w = ray.get(state_ref)
        X = _emb_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-12)
        assign = np.argmax(Xn @ C_w.T, axis=1)
        keep = np.isin(assign, union_w)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        Xn, ids, assign = Xn[keep], ids[keep], assign[keep]
        S = Qn_w @ Xn.T
        out_q, out_n, out_s = [], [], []
        for qi in range(S.shape[0]):
            in_probe = np.isin(assign, probe_w[qi]) \
                & (ids != q_ids_w[qi])
            s = S[qi][in_probe]
            nb = ids[in_probe]
            top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([int(q_ids_w[qi])] * len(top))
            out_n.extend(nb[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    parts = _t(ds.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True))
    pdf = parts.to_pandas()
    if len(pdf) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "neighbor_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    pdf["score_r"] = pdf["score"].round(5)
    pdf = pdf.sort_values(["query_id", "score_r", "neighbor_id"],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id").head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(
        pdf[["query_id", "neighbor_id", "rank"]].reset_index(drop=True))


def q_components_order_part(sf_dir: str, max_order: int = 500):
    """Connected components of the bipartite order↔part graph (lineitem
    rows as edges, orders capped for a tractable recursive-CTE oracle):
    the distributed min-label-propagation engine
    (:mod:`.components`) under the HARD oracle gate — node ids encode
    side (2·order, 2·part+1), label = component min. Duplicate edges
    (several lines of one order touching one part) need no dedup; the
    propagation is idempotent over them."""
    from .components import connected_components

    ds = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"],
               split=False).filter(expr=f"l_orderkey < {int(max_order)}")

    def edges(t: pa.Table) -> pa.Table:
        o = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"id_a": pa.array(2 * o),
                         "id_b": pa.array(2 * p + 1)})

    labels = connected_components(
        ds.map_batches(edges, batch_format="pyarrow", zero_copy_batch=True))
    t = _t(labels)
    if t.num_rows:
        idx = pc.sort_indices(t, sort_keys=[("node", "ascending")])
        t = t.take(idx)
    return t


ORACLE_SQL["components_order_part"] = """
    WITH RECURSIVE
    edges AS (
      SELECT DISTINCT 2*l_orderkey AS u, 2*l_partkey+1 AS v
      FROM lineitem WHERE l_orderkey < 500),
    und AS (SELECT u, v FROM edges UNION SELECT v, u FROM edges),
    lbl AS (
      SELECT u AS node, MIN(LEAST(u, v)) AS label FROM und GROUP BY u
      UNION
      SELECT und.u AS node, lbl.label
      FROM und JOIN lbl ON lbl.node = und.v
      WHERE lbl.label < und.u
    )
    SELECT node, MIN(label) AS label FROM lbl GROUP BY node ORDER BY node
"""


# ---------------------------------------------------------------------------
# relational breadth: pivot / rollup (conditional aggregation, grouping sets)

def q_pivot_doc_length(sf_dir: str):
    """Pivot: per-lang document counts across fixed n_chars buckets
    (<100 / 100-199 / >=200) as COLUMNS — the conditional-aggregation
    pivot shape. Per batch: three vectorized indicator columns summed
    per lang (an Arrow group-count partial), then a tiny keyed groupby;
    the shuffle moves ≤ langs×3 ints per block regardless of input
    size."""
    ds = _read(sf_dir, "documents", columns=["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        nc = t["n_chars"]
        i64 = pa.int64()
        ind = pa.table({
            "lang": t["lang"],
            "n_short": pc.cast(pc.less(nc, 100), i64),
            "n_mid": pc.cast(pc.and_(pc.greater_equal(nc, 100),
                                     pc.less(nc, 200)), i64),
            "n_long": pc.cast(pc.greater_equal(nc, 200), i64),
        })
        g = ind.group_by("lang").aggregate([("n_short", "sum"),
                                            ("n_mid", "sum"),
                                            ("n_long", "sum")])
        return g.rename_columns(["lang", "n_short", "n_mid", "n_long"])

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("lang").sum(["n_short", "n_mid", "n_long"]))

    def final(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"],
            "n_short": pc.cast(t["sum(n_short)"], pa.int64()),
            "n_mid": pc.cast(t["sum(n_mid)"], pa.int64()),
            "n_long": pc.cast(t["sum(n_long)"], pa.int64()),
        })

    return _t(agg.map_batches(final, batch_format="pyarrow"))


def q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP(o_orderpriority, o_orderstatus): revenue + count
    at the finest level, per-priority subtotals, and a grand total.
    Distributed plan: ONE finest-level keyed aggregate (the only
    shuffle; its result is |priorities×statuses| rows), then the coarser
    grouping-set levels are derived from that small table on the driver
    — sums are additive, so no second pass over the data. Rounding
    happens per OUTPUT row after each level's raw-sum fold (matching
    SQL's ROUND(SUM(..)) per rollup row)."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
               split=False)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderpriority", "o_orderstatus",
                                 "rev", "cnt"])

    fine = _t(ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["o_orderpriority", "o_orderstatus"])
              .sum(["rev", "cnt"]))
    pdf = fine.to_pandas().rename(columns={"sum(rev)": "rev",
                                           "sum(cnt)": "cnt"})
    lvl1 = (pdf.groupby("o_orderpriority", as_index=False)
            [["rev", "cnt"]].sum())
    lvl1["o_orderstatus"] = "ALL"
    lvl0 = pd.DataFrame({"o_orderpriority": ["ALL"],
                         "o_orderstatus": ["ALL"],
                         "rev": [pdf["rev"].sum()],
                         "cnt": [pdf["cnt"].sum()]})
    out = pd.concat([pdf, lvl1, lvl0], ignore_index=True)
    out = out.sort_values(["o_orderpriority", "o_orderstatus"])
    # _np_round_away (x*10^d + 0.5 → floor → /10^d) reproduces DuckDB's
    # ROUND bit-for-bit; pc.round lands on a 1-ULP-different double here
    return pa.table({
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "revenue": pa.array(
            _np_round_away(out["rev"].to_numpy(), 2), pa.float64()),
        "n_orders": pa.array(out["cnt"].astype("int64"), pa.int64()),
    })


ORACLE_SQL.update({
    "pivot_doc_length": """
        SELECT lang,
               count(*) FILTER (WHERE n_chars < 100) AS n_short,
               count(*) FILTER (WHERE n_chars >= 100 AND n_chars < 200)
                 AS n_mid,
               count(*) FILTER (WHERE n_chars >= 200) AS n_long
        FROM documents GROUP BY lang
    """,
    "rollup_orders": """
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               ROUND(SUM(o_totalprice), 2) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
    """,
})


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE(o_orderpriority, o_orderstatus): the full
    grouping-set lattice (fine level, both one-dimension marginals, and
    the grand total). Same distributed plan as the ROLLUP above — ONE
    finest-level keyed aggregate is the only shuffle, and every coarser
    grouping set folds from that |priorities×statuses|-row table on the
    driver (sums are additive), so CUBE costs exactly one extra tiny
    driver fold over ROLLUP, not a second data pass."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
               split=False)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderpriority", "o_orderstatus"]).aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        return g.rename_columns(["o_orderpriority", "o_orderstatus",
                                 "rev", "cnt"])

    fine = _t(ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["o_orderpriority", "o_orderstatus"])
              .sum(["rev", "cnt"]))
    pdf = fine.to_pandas().rename(columns={"sum(rev)": "rev",
                                           "sum(cnt)": "cnt"})
    by_prio = (pdf.groupby("o_orderpriority", as_index=False)
               [["rev", "cnt"]].sum())
    by_prio["o_orderstatus"] = "ALL"
    by_stat = (pdf.groupby("o_orderstatus", as_index=False)
               [["rev", "cnt"]].sum())
    by_stat["o_orderpriority"] = "ALL"
    total = pd.DataFrame({"o_orderpriority": ["ALL"],
                          "o_orderstatus": ["ALL"],
                          "rev": [pdf["rev"].sum()],
                          "cnt": [pdf["cnt"].sum()]})
    out = pd.concat([pdf, by_prio, by_stat, total], ignore_index=True)
    out = out.sort_values(["o_orderpriority", "o_orderstatus"])
    return pa.table({
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "revenue": pa.array(
            _np_round_away(out["rev"].to_numpy(), 2), pa.float64()),
        "n_orders": pa.array(out["cnt"].astype("int64"), pa.int64()),
    })


ORACLE_SQL["cube_orders"] = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
           COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
           ROUND(SUM(o_totalprice), 2) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""



# ---------------------------------------------------------------------------
# training-data prep: stratified sampling, contamination, blocklist scrub

#: Per-stratum sample rates as EXACT 32-bit thresholds
#: (floor(rate * 2^32)); unknown strata fall back to "default".
STRATIFIED_RATES: dict[str, float] = {
    "en": 0.10, "de": 0.50, "es": 0.25, "fr": 0.75, "zh": 0.40,
}
_STRATIFIED_DEFAULT = 0.20


def _rate_threshold(rate: float) -> np.uint64:
    return np.uint64(int(rate * (1 << 32)))


def q_stratified_sample(sf_dir: str):
    """Stratified content-keyed sample: per-lang keep rates applied via
    the Knuth multiplicative hash on doc_id (exact integer arithmetic ⇒
    reproducible across reruns / block layouts / engines, and
    DuckDB-expressible). The training-data use: down-sample dominant
    languages while keeping rare ones — the keep decision is pure
    per-row math, no shuffle."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang"])

    def keep(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        thr = np.full(len(ids), _rate_threshold(_STRATIFIED_DEFAULT))
        lang = t["lang"]
        for lg, rate in STRATIFIED_RATES.items():
            m = pc.equal(lang, lg).to_numpy(zero_copy_only=False)
            thr[m] = _rate_threshold(rate)
        return t.filter(pa.array(h < thr))

    return _t_or(ds.map_batches(keep, batch_format="pyarrow",
                                zero_copy_batch=True),
                 pa.table({"doc_id": pa.array([], pa.int64()),
                           "lang": pa.array([], pa.string())}))


def q_contamination_check(sf_dir: str):
    """Benchmark-contamination scan: the 'benchmark' is the 3-token
    prefix of every doc_id < 20 document; any OTHER document whose raw
    text contains one of those snippets is flagged with its hit count.
    Plan: the snippet list is tiny ⇒ built once on the driver from a
    pruned filtered read and BROADCAST (ray.put); each batch runs one
    vectorized substring scan per snippet (kernels, not row loops) and
    sums the boolean masks — the 100 TB shape for screening a corpus
    against a fixed eval set."""
    bench = _t(_read(sf_dir, "documents", columns=["doc_id", "text"])
               .filter(expr="doc_id < 20"))
    toks = pc.split_pattern_regex(bench["text"], r"\s+")
    snippets = []
    for row in toks.to_pylist():
        row = [w for w in row if w]
        if len(row) >= 3:
            snippets.append(" ".join(row[:3]))
    snip_ref = ray.put(snippets)

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scan(t: pa.Table) -> pa.Table:
        snips = ray.get(snip_ref)
        n = t.num_rows
        hits = np.zeros(n, np.int64)
        for s in snips:
            hits += pc.cast(pc.match_substring(t["text"], s),
                            pa.int64()).to_numpy(zero_copy_only=False)
        keep = (hits > 0) & (t["doc_id"].to_numpy(
            zero_copy_only=False) >= 20)
        out = pa.table({"doc_id": t["doc_id"],
                        "n_hits": pa.array(hits, pa.int64())})
        return out.filter(pa.array(keep))

    return _t_or(ds.map_batches(scan, batch_format="pyarrow",
                                zero_copy_batch=True),
                 pa.table({"doc_id": pa.array([], pa.int64()),
                           "n_hits": pa.array([], pa.int64())}))


#: Blocklist for the scrub op (word-boundary alternation, RE2 in both
#: engines).
SCRUB_BLOCKLIST = ("spark", "hash", "merge")
_SCRUB_PATTERN = r"\b(" + "|".join(SCRUB_BLOCKLIST) + r")\b"


def q_blocklist_scrub(sf_dir: str):
    """Blocklist redaction (PII-scrub shape): replace word-boundary
    blocklist hits with '[MASKED]' and count them — two RE2 kernels per
    batch (count + replace), no Python per row. The real PII pass swaps
    the pattern for email/phone/SSN alternations; the plumbing
    (compiled pattern, vectorized count+replace, streamed output) is
    identical."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], _SCRUB_PATTERN),
                    pa.int64())
        red = pc.replace_substring_regex(t["text"], _SCRUB_PATTERN,
                                         "[MASKED]")
        return pa.table({"doc_id": t["doc_id"], "scrubbed": red,
                         "n_masked": n})

    return _t(ds.map_batches(scrub, batch_format="pyarrow",
                             zero_copy_batch=True))


ORACLE_SQL.update({
    "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 <
              CAST(floor(CASE lang
                     WHEN 'en' THEN 0.10 WHEN 'de' THEN 0.50
                     WHEN 'es' THEN 0.25 WHEN 'fr' THEN 0.75
                     WHEN 'zh' THEN 0.40 ELSE 0.20 END * 4294967296.0)
                   AS BIGINT)
    """,
    "contamination_check": """
        WITH bench AS (
          SELECT array_to_string(
                   regexp_extract_all(text, '\\S+')[1:3], ' ') AS snip
          FROM documents
          WHERE doc_id < 20
            AND len(regexp_extract_all(text, '\\S+')) >= 3)
        SELECT d.doc_id, count(*) AS n_hits
        FROM documents d JOIN bench ON contains(d.text, bench.snip)
        WHERE d.doc_id >= 20
        GROUP BY d.doc_id
    """,
    "blocklist_scrub": """
        SELECT doc_id,
               regexp_replace(text, '\\b(spark|hash|merge)\\b',
                              '[MASKED]', 'g') AS scrubbed,
               len(regexp_extract_all(text, '\\b(spark|hash|merge)\\b'))
                 AS n_masked
        FROM documents
    """,
})

# ---------------------------------------------------------------------------
# repetition-quality + cross-document duplicated-n-gram operators
# (training-data curation: Gopher-style repetition filters and the
# substring-level duplication signal of Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better")


def _flat_tokens(t: pa.Table):
    """Vectorized whitespace tokenization of ``t["text"]`` → (flat token
    Array with empties dropped, int64 row index per token). Shared by the
    n-gram family; regexp_extract_all('\\S+') parity."""
    toks = pc.split_pattern_regex(t["text"], r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = np.nan_to_num(
        pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ).astype(np.int64)
    flat = toks.flatten()
    row_of = np.repeat(np.arange(len(lengths)), lengths)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.filter(pa.array(keep)), row_of[keep]


def q_doc_repetition(sf_dir: str):
    """Gopher-style per-document repetition metrics (Rae et al. 2021 §A1
    quality filters): token count, distinct-token count, duplicate-token
    fraction, most-common-token fraction and most-common-bigram fraction.
    All metrics are per-row ⇒ ONE streaming map_batches pass, no shuffle;
    the per-(row, token) counting is two Arrow group_by kernels per batch
    (no Python per row). Documents with zero tokens are dropped (no
    denominator), matching the oracle's unnest semantics."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "n_distinct": pa.array([], pa.int64()),
        "dup_frac": pa.array([], pa.float64()),
        "top_tok_frac": pa.array([], pa.float64()),
        "top_bigram_frac": pa.array([], pa.float64())})

    def metrics(t: pa.Table) -> pa.Table:
        flat, row_of = _flat_tokens(t)
        m = len(flat)
        if m == 0:
            return empty
        tc = pa.table({"r": pa.array(row_of, pa.int64()), "tok": flat}) \
            .group_by(["r", "tok"]).aggregate([([], "count_all")])
        per = tc.group_by("r").aggregate([
            ("count_all", "sum"), ("count_all", "count"),
            ("count_all", "max")])
        r = per["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = per["count_all_sum"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        distinct = per["count_all_count"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        top = per["count_all_max"].to_numpy(
            zero_copy_only=False).astype(np.float64)
        # most-common-bigram count per ROW (adjacent same-row pairs)
        top_bg = np.zeros(t.num_rows, np.float64)
        if m >= 2:
            same = row_of[1:] == row_of[:-1]
            bigrams = pc.binary_join_element_wise(
                flat.slice(0, m - 1), flat.slice(1), " ")
            bigrams = bigrams.filter(pa.array(same))
            if len(bigrams):
                bc = pa.table({
                    "r": pa.array(row_of[:-1][same], pa.int64()),
                    "bg": bigrams,
                }).group_by(["r", "bg"]).aggregate([([], "count_all")])
                bm = bc.group_by("r").aggregate([("count_all", "max")])
                top_bg[bm["r"].to_numpy(zero_copy_only=False)] = \
                    bm["count_all_max"].to_numpy(zero_copy_only=False)
        # single-token docs have no bigram: 0.0 (oracle: coalesce(., 0.0))
        denom = total - 1.0
        tbf = np.where(denom > 0, top_bg[r] / np.maximum(denom, 1.0), 0.0)
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(r)),
            "n_tokens": pa.array(total.astype(np.int64)),
            "n_distinct": pa.array(distinct.astype(np.int64)),
            "dup_frac": pa.array(1.0 - distinct / total),
            "top_tok_frac": pa.array(top / total),
            "top_bigram_frac": pa.array(tbf)})

    return _t(ds.map_batches(metrics, batch_format="pyarrow",
                             zero_copy_batch=True))


#: word-n-gram width for the cross-document duplication scan
DUP_NGRAM_N = 5


def q_dup_ngram_frac(sf_dir: str):
    """Cross-document duplicated-n-gram fraction — per document, the
    share of its word 5-gram positions whose 5-gram also occurs in at
    least one OTHER document (the detection half of substring-level
    dedup; Lee et al. 2022). Two keyed shuffles, no all-pairs work and
    no text re-shipping:

    1. gram postings: per batch, vectorized 5-gram construction (N
       shifted slices of the flat token array joined element-wise) and a
       per-(gram, doc) position pre-count, keyed by ``hash64(gram)`` —
       a gram's postings land wholly in one partition, where grams with
       ≥2 distinct docs emit per-doc duplicated-position partials;
    2. the partials union a cheap per-doc total-positions pass and
       co-locate by ``doc_id`` for the final per-doc fold (two ints per
       doc per partition — the only data crossing the second exchange).

    At 100 TB the posting shuffle carries (gram, doc, count) rows —
    bounded by token count, pre-deduplicated per batch — and partition
    counts scale with ``coarse_buckets``. Documents shorter than 5
    tokens have no 5-gram and are absent, matching the oracle."""
    from ..state.sketches import hash64
    from .shuffle import coarse_buckets, hash_shuffle_apply

    N = DUP_NGRAM_N
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_rows = _parquet_rows(sf_dir, "documents")

    post_empty = pa.table({"gram": pa.array([], pa.string()),
                           "doc_id": pa.array([], pa.int64()),
                           "n_pos": pa.array([], pa.int64()),
                           "hkey": pa.array([], pa.int64())})

    def postings(t: pa.Table) -> pa.Table:
        flat, row_of = _flat_tokens(t)
        m = len(flat)
        if m < N:
            return post_empty
        k = m - N + 1
        same = row_of[N - 1:] == row_of[:k]
        grams = pc.binary_join_element_wise(
            *[flat.slice(i, k) for i in range(N)], " ").filter(
            pa.array(same))
        docs = t["doc_id"].to_numpy(
            zero_copy_only=False)[row_of[:k][same]]
        g = pa.table({"gram": grams, "doc_id": pa.array(docs, pa.int64())}) \
            .group_by(["gram", "doc_id"]).aggregate([([], "count_all")])
        g = g.rename_columns(["gram", "doc_id", "n_pos"])
        return g.append_column(
            "hkey", pa.array(hash64(g["gram"]).astype(np.int64)))

    part_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                           "v": pa.array([], pa.int64()),
                           "is_dup": pa.array([], pa.int64())})

    def dup_partials(g: pa.Table) -> pa.Table:
        agg = g.group_by(["gram", "doc_id"]).aggregate([("n_pos", "sum")])
        docs_per = agg.group_by("gram").aggregate([([], "count_all")])
        shared = docs_per.filter(
            pc.greater_equal(docs_per["count_all"], 2)).select(["gram"])
        dup = agg.join(shared, keys="gram", join_type="inner")
        out = dup.group_by("doc_id").aggregate([("n_pos_sum", "sum")])
        out = out.rename_columns(["doc_id", "v"])
        return out.append_column(
            "is_dup", pa.array(np.ones(out.num_rows, np.int64)))

    B = coarse_buckets(n_rows * 30)  # ~gram postings per doc
    dup_ds = hash_shuffle_apply(
        ds.map_batches(postings, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, dup_partials, part_empty)

    def totals(t: pa.Table) -> pa.Table:
        _, row_of = _flat_tokens(t)
        n_tok = np.bincount(row_of, minlength=t.num_rows).astype(np.int64)
        n_grams = np.maximum(n_tok - (N - 1), 0)
        keep = n_grams > 0
        return pa.table({
            "doc_id": t["doc_id"].filter(pa.array(keep)),
            "v": pa.array(n_grams[keep], pa.int64()),
            "is_dup": pa.array(np.zeros(int(keep.sum()), np.int64))})

    tot_ds = ds.map_batches(totals, batch_format="pyarrow",
                            zero_copy_batch=True)

    out_empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_grams": pa.array([], pa.int64()),
                          "n_dup": pa.array([], pa.int64()),
                          "dup_frac": pa.array([], pa.float64())})

    def fold(t: pa.Table) -> pa.Table:
        tot = t.filter(pc.equal(t["is_dup"], 0)).group_by("doc_id") \
            .aggregate([("v", "sum")]).rename_columns(
            ["doc_id", "n_grams"])
        dup = t.filter(pc.equal(t["is_dup"], 1)).group_by("doc_id") \
            .aggregate([("v", "sum")]).rename_columns(["doc_id", "n_dup"])
        j = tot.join(dup, keys="doc_id", join_type="left outer")
        ng = j["n_grams"].to_numpy(zero_copy_only=False).astype(np.float64)
        nd = np.nan_to_num(j["n_dup"].to_numpy(zero_copy_only=False)
                           .astype(np.float64))
        return pa.table({"doc_id": j["doc_id"], "n_grams": j["n_grams"],
                         "n_dup": pa.array(nd.astype(np.int64)),
                         "dup_frac": pa.array(nd / ng)})

    B2 = coarse_buckets(n_rows)
    return _t(hash_shuffle_apply(dup_ds.union(tot_ds), "doc_id", B2,
                                 fold, out_empty))


ORACLE_SQL.update({
    "doc_repetition": """
        WITH toks AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
          FROM documents),
        tc AS (
          SELECT doc_id, tok, count(*) AS n
          FROM toks GROUP BY doc_id, tok),
        per AS (
          SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
                 CAST(count(*) AS BIGINT) AS n_distinct,
                 CAST(max(n) AS BIGINT) AS top_n
          FROM tc GROUP BY doc_id),
        lists AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
          FROM documents),
        bg AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ts) - 1),
                                       i -> ts[i] || ' ' || ts[i + 1]))
                   AS b
          FROM lists WHERE len(ts) >= 2),
        bgc AS (
          SELECT doc_id, b, count(*) AS n FROM bg GROUP BY doc_id, b),
        bgm AS (SELECT doc_id, max(n) AS top_bg FROM bgc GROUP BY doc_id)
        SELECT per.doc_id, n_tokens, n_distinct,
               1.0 - n_distinct / n_tokens AS dup_frac,
               top_n / n_tokens AS top_tok_frac,
               coalesce(top_bg / (n_tokens - 1), 0.0) AS top_bigram_frac
        FROM per LEFT JOIN bgm ON per.doc_id = bgm.doc_id
    """,
    "dup_ngram_frac": """
        WITH lists AS (
          SELECT doc_id, regexp_extract_all(text, '\\S+') AS ts
          FROM documents),
        grams AS (
          SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ts) - 4),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' '
                        || ts[i+3] || ' ' || ts[i+4])) AS g
          FROM lists WHERE len(ts) >= 5),
        shared AS (
          SELECT g FROM grams GROUP BY g
          HAVING count(DISTINCT doc_id) >= 2),
        per AS (
          SELECT doc_id, count(*) AS n_grams,
                 CAST(sum(CASE WHEN g IN (SELECT g FROM shared)
                               THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
          FROM grams GROUP BY doc_id)
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, n_dup,
               n_dup / n_grams AS dup_frac
        FROM per
    """,
})


def q_distinctive_terms(sf_dir: str):
    """Most distinctive term per document — the max-idf term (argmin
    document frequency, ties broken lexicographically), reported with
    its in-doc term frequency and tf·idf score. Two passes:

    1. corpus document frequency: documents never span batches, so a
       per-batch (doc, token) dedup makes per-batch DF partials globally
       correct; a tiny keyed groupby sums them and the vocab-sized DF
       table broadcasts via ``ray.put`` (documented bound: the vocab
       must fit a worker's heap — for open-ended vocabularies swap the
       broadcast for a token-keyed join, same pass structure);
    2. per batch: vectorized per-(doc, token) tf, a searchsorted DF
       lookup against the broadcast vocab, and a per-doc argmin by
       (df, token) via one Arrow sort + first-occurrence mask.

    Term SELECTION is integer-exact (df, token) — reproducible across
    engines bit for bit; the tf·ln(N/df) score column is informational
    (numpy and DuckDB ln differ in the last ulp, so ordering by the
    float would not be oracle-stable; ordering by df is idf-maximal and
    is)."""
    n_docs = _parquet_rows(sf_dir, "documents")
    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        flat, row_of = _flat_tokens(t)
        if len(flat) == 0:
            return pa.table({"tok": pa.array([], pa.string()),
                             "df": pa.array([], pa.int64())})
        dt = pa.table({"r": pa.array(row_of, pa.int64()), "tok": flat}) \
            .group_by(["r", "tok"]).aggregate([])
        g = dt.group_by("tok").aggregate([([], "count_all")])
        return g.rename_columns(["tok", "df"])

    df_rows = ds.map_batches(df_partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("tok").sum("df")
    dft = _t(df_rows)  # vocab-sized
    vocab = dft["tok"].to_numpy(zero_copy_only=False).astype(object)
    dfs = dft["sum(df)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vocab)
    df_ref = ray.put((vocab[order], dfs[order]))

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "term": pa.array([], pa.string()),
                      "tf": pa.array([], pa.int64()),
                      "df": pa.array([], pa.int64()),
                      "tfidf": pa.array([], pa.float64())})

    def top_term(t: pa.Table) -> pa.Table:
        svocab, sdf = ray.get(df_ref)
        flat, row_of = _flat_tokens(t)
        if len(flat) == 0:
            return empty
        tf = pa.table({"r": pa.array(row_of, pa.int64()), "tok": flat}) \
            .group_by(["r", "tok"]).aggregate([([], "count_all")])
        toks = tf["tok"].to_numpy(zero_copy_only=False).astype(object)
        pos = np.searchsorted(svocab, toks)
        dfv = sdf[pos]
        scored = pa.table({
            "r": tf["r"], "tok": tf["tok"],
            "tf": pc.cast(tf["count_all"], pa.int64()),
            "df": pa.array(dfv, pa.int64())})
        idx = pc.sort_indices(scored, sort_keys=[
            ("r", "ascending"), ("df", "ascending"),
            ("tok", "ascending")])
        s = scored.take(idx)
        r = s["r"].to_numpy(zero_copy_only=False)
        first = np.concatenate([[True], r[1:] != r[:-1]])
        s = s.filter(pa.array(first))
        tfv = s["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dvv = s["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = _round(pa.array(tfv * np.log(float(n_docs) / dvv)), 6)
        return pa.table({
            "doc_id": t["doc_id"].take(pa.array(
                s["r"].to_numpy(zero_copy_only=False))),
            "term": s["tok"], "tf": s["tf"], "df": s["df"],
            "tfidf": score})

    return _t(ds.map_batches(top_term, batch_format="pyarrow",
                             zero_copy_batch=True))


ORACLE_SQL["distinctive_terms"] = """
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
      FROM documents),
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (
      SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
    ranked AS (
      SELECT tf.doc_id, tf.tok, tf.tf, df.df,
             row_number() OVER (PARTITION BY tf.doc_id
                                ORDER BY df.df ASC, tf.tok ASC) AS rk
      FROM tf JOIN df USING (tok))
    SELECT doc_id, tok AS term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df,
           round(tf * ln(CAST((SELECT count(*) FROM documents) AS DOUBLE)
                         / df), 6) AS tfidf
    FROM ranked WHERE rk = 1
"""


def q_histogram_doc_length(sf_dir: str):
    """Equi-width histogram of document lengths (the distribution-report
    primitive behind length/quality-filter tuning): 16 fixed-width
    buckets over [min, max] computed from footer-free aggregates, one
    bincount partial per batch, ≤16 rows to the driver. Bucket edges use
    the same integer-exact arithmetic as the SQL oracle (width as a
    rational, floor on BIGINT math) so bucket membership cannot drift on
    float rounding."""
    ds = _read(sf_dir, "documents", columns=["n_chars"])
    from ray.data.aggregate import Max, Min

    mm = ds.aggregate(Min("n_chars"), Max("n_chars"))
    lo, hi = int(mm["min(n_chars)"]), int(mm["max(n_chars)"])
    K = 16
    span = max(hi - lo + 1, 1)  # integer width: bucket = (v-lo)*K//span

    def part(t: pa.Table) -> pa.Table:
        v = t["n_chars"]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        if v.null_count:
            v = v.drop_null()
        x = v.to_numpy(zero_copy_only=False).astype(np.int64)
        b = (x - lo) * K // span
        cnt = np.bincount(b, minlength=K)
        nz = np.nonzero(cnt)[0]
        return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                         "n": pa.array(cnt[nz].astype(np.int64))})

    agg = ds.map_batches(part, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("bucket").sum("n")
    t = _t(agg)
    b = t["bucket"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(b)
    b, n = b[order], n[order]
    return pa.table({
        "bucket": pa.array(b),
        "lo_edge": pa.array(lo + b * span // K, pa.int64()),
        "n": pa.array(n)})


ORACLE_SQL["histogram_doc_length"] = """
    WITH mm AS (SELECT min(n_chars) AS lo,
                       greatest(max(n_chars) - min(n_chars) + 1, 1)
                         AS span
                FROM documents),
    b AS (SELECT ((n_chars - mm.lo) * 16) // mm.span AS bucket
          FROM documents, mm WHERE n_chars IS NOT NULL)
    SELECT bucket, mm.lo + (bucket * mm.span) // 16 AS lo_edge,
           count(*) AS n
    FROM b, mm GROUP BY bucket, mm.lo, mm.span
"""


#: EXCEPT-op purchase-size threshold (chosen to split users
#: non-trivially at every sf: 8/83/795 qualifying users at
#: sf0.001/0.01/0.1)
BIG_PURCHASE_VALUE = 150.0


def q_users_no_big_purchase(sf_dir: str):
    """Set-difference (EXCEPT) as a distributed aggregate: users who
    have events but never a purchase above ``BIG_PURCHASE_VALUE``. Per
    batch: one group_by emitting (user_id, any_big_purchase) partials —
    an EXCEPT between two subsets of one table needs no second read and
    no distinct-shuffle of either side, just max() over a boolean
    through the tiny keyed groupby. The same fold shape handles any
    A∖B where both sides are predicates over one scan."""
    ds = _read(sf_dir, "events",
               columns=["user_id", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        big = pc.and_(pc.equal(t["event_type"], "purchase"),
                      pc.greater(t["value"], BIG_PURCHASE_VALUE))
        ind = pa.table({"user_id": t["user_id"],
                        "p": pc.cast(big, pa.int64())})
        g = ind.group_by("user_id").aggregate([("p", "max")])
        return g.rename_columns(["user_id", "p"])

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True).groupby("user_id").max("p")
    t = _t(agg)
    t = t.filter(pc.equal(t["max(p)"], 0))
    return pa.table({"user_id": pc.cast(t["user_id"], pa.int64())})


ORACLE_SQL["users_no_big_purchase"] = """
    SELECT DISTINCT user_id FROM events
    EXCEPT
    SELECT DISTINCT user_id FROM events
    WHERE event_type = 'purchase' AND value > 150.0
"""


def q_corr_price_qty_by_flag(sf_dir: str):
    """Grouped Pearson correlation of (l_extendedprice, l_quantity) per
    l_returnflag via mergeable moment partials — the same shape every
    distributed second-order statistic reduces to: each batch emits one
    (n, Σx, Σy, Σxx, Σyy, Σxy) row per group (vectorized kernels), a
    tiny keyed groupby sums them, and the driver finishes the ≤|groups|
    rows. Correlation is scale-free, so the raw-moment formula matches
    DuckDB's streaming corr() to ~1e-12 relative — far inside the
    6-decimal rounding both sides apply."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_extendedprice", "l_quantity"],
               split=False)

    def partial(t: pa.Table) -> pa.Table:
        x = pc.cast(t["l_extendedprice"], pa.float64())
        y = pc.cast(t["l_quantity"], pa.float64())
        m = pa.table({
            "l_returnflag": t["l_returnflag"],
            "n": pa.array(np.ones(t.num_rows, np.int64)),
            "sx": x, "sy": y,
            "sxx": pc.multiply(x, x), "syy": pc.multiply(y, y),
            "sxy": pc.multiply(x, y)})
        g = m.group_by("l_returnflag").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")])
        return g.rename_columns(["l_returnflag", "n", "sx", "sy",
                                 "sxx", "syy", "sxy"])

    agg = _t(ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("l_returnflag")
             .sum(["n", "sx", "sy", "sxx", "syy", "sxy"]))
    n = agg["sum(n)"].to_numpy(zero_copy_only=False).astype(np.float64)
    sx = agg["sum(sx)"].to_numpy(zero_copy_only=False)
    sy = agg["sum(sy)"].to_numpy(zero_copy_only=False)
    sxx = agg["sum(sxx)"].to_numpy(zero_copy_only=False)
    syy = agg["sum(syy)"].to_numpy(zero_copy_only=False)
    sxy = agg["sum(sxy)"].to_numpy(zero_copy_only=False)
    corr = (n * sxy - sx * sy) / np.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    t = pa.table({"l_returnflag": agg["l_returnflag"],
                  "n": pa.array(n.astype(np.int64)),
                  "corr_xy": _round(pa.array(corr), 6)})
    return t.take(pc.sort_indices(t, sort_keys=[("l_returnflag",
                                                 "ascending")]))


ORACLE_SQL["corr_price_qty_by_flag"] = """
    SELECT l_returnflag, count(*) AS n,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_xy
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_intersect_click_purchase(sf_dir: str):
    """Set-intersection (INTERSECT) as a distributed indicator fold:
    users who have BOTH a click and a purchase event. Per batch one
    Arrow group_by emits (user_id, saw_click, saw_purchase) indicator
    partials; the tiny keyed groupby maxes them; the driver keeps rows
    where both indicators fired. Like the EXCEPT fold above, an
    INTERSECT of two predicate-defined subsets of one table costs one
    scan and one small keyed shuffle — never two distinct-shuffles plus
    a join."""
    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        ind = pa.table({
            "user_id": t["user_id"],
            "c": pc.cast(pc.equal(t["event_type"], "click"), pa.int64()),
            "p": pc.cast(pc.equal(t["event_type"], "purchase"),
                         pa.int64())})
        g = ind.group_by("user_id").aggregate([("c", "max"), ("p", "max")])
        return g.rename_columns(["user_id", "c", "p"])

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("user_id").max(["c", "p"])
    t = _t(agg)
    both = pc.and_(pc.equal(t["max(c)"], 1), pc.equal(t["max(p)"], 1))
    t = t.filter(both)
    return pa.table({"user_id": pc.cast(t["user_id"], pa.int64())})


ORACLE_SQL["intersect_click_purchase"] = """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
"""


#: EXISTS semi-join discount threshold (≥0.08 qualifies ~63% of orders
#: at every sf — non-trivial both ways)
SEMI_DISCOUNT = 0.08


def q_orders_discounted_semi(sf_dir: str):
    """EXISTS semi-join between two LARGE sides: orders that have at
    least one lineitem with ``l_discount >= SEMI_DISCOUNT``. The probe
    side ships full payload rows; the build side pre-reduces to
    DISTINCT qualifying keys per batch (a semi-join never needs the
    build payload, so only keys move); ``key % B`` co-locates them and
    each partition keeps probe rows via one Arrow ``is_in``. Same
    bounded-partition contract as the partitioned inner/left joins."""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_totalprice"], split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_discount"], split=False)

    def probe_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": t["o_orderkey"],
            "price": pc.cast(t["o_totalprice"], pa.float64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8))})

    def build_keys(t: pa.Table) -> pa.Table:
        k = t.filter(pc.greater_equal(t["l_discount"],
                                      SEMI_DISCOUNT))["l_orderkey"]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        k = pc.unique(k)
        return pa.table({
            "key": k, "price": pa.nulls(len(k), pa.float64()),
            "side": pa.array(np.ones(len(k), dtype=np.int8))})

    tagged = orders.map_batches(probe_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(build_keys, batch_format="pyarrow"))

    empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "o_totalprice": pa.array([], pa.float64())})

    def semi_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        probe = g.filter(pa.array(side == 0))
        keys = g.filter(pa.array(side == 1))["key"].combine_chunks()
        if probe.num_rows == 0 or len(keys) == 0:
            return empty
        hit = probe.filter(pc.is_in(probe["key"], value_set=keys))
        return pa.table({"o_orderkey": pc.cast(hit["key"], pa.int64()),
                         "o_totalprice": hit["price"]})

    out = hash_shuffle_apply(tagged, "key", B, semi_part, empty)
    return _t(out).sort_by("o_orderkey")


ORACLE_SQL["orders_discounted_semi"] = """
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_discount >= 0.08)
    ORDER BY o_orderkey
"""


def q_mode_priority_per_status(sf_dir: str):
    """Grouped MODE (most frequent value per key): per batch one Arrow
    group_by emits (status, priority, n) count partials, the keyed
    groupby sums them, and the driver argmaxes the ≤|status|·|priority|
    rows with a deterministic tie order (count DESC, value ASC) — the
    categorical companion to the moment-partial statistics: any
    "top value per key" over bounded-cardinality pairs reduces to this
    fold with no row shuffle."""
    ds = _read(sf_dir, "orders",
               columns=["o_orderstatus", "o_orderpriority"], split=False)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["o_orderstatus", "o_orderpriority"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["o_orderstatus", "o_orderpriority", "n"])

    agg = _t(ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["o_orderstatus", "o_orderpriority"]).sum("n"))
    idx = pc.sort_indices(agg, sort_keys=[
        ("o_orderstatus", "ascending"), ("sum(n)", "descending"),
        ("o_orderpriority", "ascending")])
    agg = agg.take(idx)
    st = agg["o_orderstatus"].to_numpy(zero_copy_only=False)
    first = np.ones(len(st), dtype=bool)
    first[1:] = st[1:] != st[:-1]
    top = agg.filter(pa.array(first))
    return pa.table({
        "o_orderstatus": top["o_orderstatus"],
        "mode_priority": top["o_orderpriority"],
        "n": pc.cast(top["sum(n)"], pa.int64())})


ORACLE_SQL["mode_priority_per_status"] = """
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n
    FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                 row_number() OVER (PARTITION BY o_orderstatus
                                    ORDER BY count(*) DESC,
                                             o_orderpriority ASC) AS rn
          FROM orders GROUP BY o_orderstatus, o_orderpriority)
    WHERE rn = 1 ORDER BY o_orderstatus
"""


def q_zscore_doc_length(sf_dir: str):
    """Feature normalization (z-score of n_chars per document): pass 1
    folds exact INTEGER moment partials (n, Σx, Σxx — n_chars is an
    int, so the sums are order-independent and bit-identical to SQL's),
    pass 2 broadcasts the two derived doubles and maps every row. The
    shared mean = Σx/n and var = Σxx/n − mean² expressions make both
    engines compute z from the SAME doubles — no stddev-implementation
    drift under the 6-decimal hash."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def moments(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.int64())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "sx": pa.array([pc.sum(x).as_py() or 0], pa.int64()),
            "sxx": pa.array([pc.sum(pc.multiply(x, x)).as_py() or 0],
                            pa.int64())})

    m = _t(ds.map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True))
    n = int(pc.sum(m["n"]).as_py() or 0)
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "z": pa.array([], pa.float64())})
    sx = int(pc.sum(m["sx"]).as_py())
    sxx = int(pc.sum(m["sxx"]).as_py())
    mean = sx / n
    sd = float(np.sqrt(sxx / n - mean * mean))

    def zmap(t: pa.Table) -> pa.Table:
        x = pc.cast(t["n_chars"], pa.float64())
        z = pc.divide(pc.subtract(x, mean), sd)
        return pa.table({"doc_id": t["doc_id"], "z": _round(z, 6)})

    return _t(ds.map_batches(zmap, batch_format="pyarrow",
                             zero_copy_batch=True)).sort_by("doc_id")


ORACLE_SQL["zscore_doc_length"] = """
    WITH m AS (SELECT count(*) AS n, sum(n_chars) AS sx,
                      sum(n_chars * n_chars) AS sxx
               FROM documents),
    s AS (SELECT CAST(sx AS DOUBLE) / n AS mean,
                 sqrt(CAST(sxx AS DOUBLE) / n -
                      (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n))
                   AS sd
          FROM m)
    SELECT doc_id, round((n_chars - s.mean) / s.sd, 6) AS z
    FROM documents, s ORDER BY doc_id
"""


def q_gapfill_daily_events(sf_dir: str):
    """Gap-filled daily event counts (the regular-time-series primitive
    behind rate dashboards and drift windows): one streaming pass folds
    (day, n) partials, and the driver left-extends the ≤(span-in-days)
    result over the full [min, max] day range with zero fill — the
    dense range lives only on the driver, never as a shuffled join
    side."""
    ds = _read(sf_dir, "events", columns=["ts"])

    def partial(t: pa.Table) -> pa.Table:
        day = pc.cast(t["ts"], pa.date32())
        g = pa.table({"day": day}).group_by("day").aggregate(
            [([], "count_all")])
        return g.rename_columns(["day", "n"])

    agg = _t(ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).groupby("day").sum("n"))
    if agg.num_rows == 0:
        return pa.table({"day": pa.array([], pa.date32()),
                         "n": pa.array([], pa.int64())})
    days = agg["day"].to_numpy(zero_copy_only=False).astype(
        "datetime64[D]").astype(np.int64)
    counts = agg["sum(n)"].to_numpy(zero_copy_only=False).astype(np.int64)
    full = np.arange(days.min(), days.max() + 1, dtype=np.int64)
    dense = np.zeros(len(full), dtype=np.int64)
    dense[days - days.min()] = counts
    return pa.table({
        "day": pa.array(full.astype("datetime64[D]")),
        "n": pa.array(dense)})


ORACLE_SQL["gapfill_daily_events"] = """
    -- DuckDB's generate_series takes only constant bounds, so the dense
    -- day axis comes from a constant range() cross-joined to the min/max
    -- CTE and clamped by date_diff (100000 days ≈ 273 years of headroom)
    WITH d AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n
               FROM events GROUP BY 1),
    mm AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
    g AS (SELECT CAST(mm.lo + k * INTERVAL 1 DAY AS DATE) AS day
          FROM mm, range(0, 100000) t(k)
          WHERE k <= date_diff('day', mm.lo, mm.hi))
    SELECT g.day, coalesce(d.n, 0) AS n
    FROM g LEFT JOIN d ON d.day = g.day
    ORDER BY g.day
"""


#: TPC-H Q3 shape parameters (mid-range date splits both tables
#: non-trivially at every sf)
Q3_SEGMENT = "BUILDING"
Q3_DATE = __import__("datetime").datetime(1998, 6, 1)


def q_q3_top_unshipped(sf_dir: str):
    """TPC-H Q3 shape — top-10 unshipped-revenue orders for one market
    segment: the composite that exercises broadcast + partitioned join +
    grouped aggregate + top-k in ONE plan. The customer dimension
    filters to a custkey set broadcast via ray.put; orders prune on
    (date, custkey) AT THE SCAN so only qualifying (orderkey, date,
    priority) rows enter the shuffle; lineitem pre-aggregates revenue
    per order per batch before shuffling; each co-located partition
    joins + emits its local top-10, and the driver merges ≤10·B rows.
    (Float caveat shared with every revenue query: the top-10 CUT is on
    an order-of-summation-sensitive double — last-ulp ties could in
    principle flip ranks, measured harmless at these scales.)"""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    cust = _t(_read(sf_dir, "customer",
                    columns=["c_custkey", "c_mktsegment"]))
    keys = cust.filter(pc.equal(cust["c_mktsegment"],
                                Q3_SEGMENT))["c_custkey"]
    keys_ref = ray.put(keys.combine_chunks()
                       if isinstance(keys, pa.ChunkedArray) else keys)

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    D = pa.scalar(Q3_DATE, pa.timestamp("us"))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_orderpriority"], split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_extendedprice",
                              "l_discount", "l_shipdate"], split=False)

    def order_rows(t: pa.Table) -> pa.Table:
        ck = ray.get(keys_ref)
        t = t.filter(pc.and_(pc.less(t["o_orderdate"], D),
                             pc.is_in(t["o_custkey"], value_set=ck)))
        return pa.table({
            "key": t["o_orderkey"], "odate": t["o_orderdate"],
            "prio": t["o_orderpriority"],
            "rev": pa.nulls(t.num_rows, pa.float64()),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8))})

    def line_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], D))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"key": t["l_orderkey"], "rev": rev}) \
            .group_by("key").aggregate([("rev", "sum")])
        return pa.table({
            "key": g["key"],
            "odate": pa.nulls(g.num_rows, pa.timestamp("us")),
            "prio": pa.nulls(g.num_rows, pa.string()),
            "rev": pc.cast(g["rev_sum"], pa.float64()),
            "side": pa.array(np.ones(g.num_rows, dtype=np.int8))})

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(line_rows, batch_format="pyarrow"))

    empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                      "revenue": pa.array([], pa.float64()),
                      "o_orderdate": pa.array([], pa.timestamp("us")),
                      "o_orderpriority": pa.array([], pa.string())})

    def topk(t: pa.Table, k: int = 10) -> pa.Table:
        if t.num_rows == 0:    # select_k chokes on zero-chunk columns
            return empty
        idx = pc.select_k_unstable(
            t, k=k, sort_keys=[("revenue", "descending"),
                               ("o_orderdate", "ascending"),
                               ("o_orderkey", "ascending")])
        return t.take(idx)

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)) \
            .select(["key", "odate", "prio"])
        right = g.filter(pa.array(side == 1)).select(["key", "rev"])
        if left.num_rows == 0 or right.num_rows == 0:
            return empty
        agg = right.group_by("key").aggregate([("rev", "sum")])
        j = left.join(agg, keys="key", join_type="inner")
        out = pa.table({
            "o_orderkey": pc.cast(j["key"], pa.int64()),
            "revenue": pc.cast(j["rev_sum"], pa.float64()),
            "o_orderdate": j["odate"],
            "o_orderpriority": j["prio"]})
        return topk(out)

    out = _t(hash_shuffle_apply(tagged, "key", B, join_part, empty))
    final = topk(out)
    return final.set_column(1, "revenue", _round(final["revenue"], 2))


ORACLE_SQL["q3_top_unshipped"] = """
    SELECT l_orderkey AS o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC,
             o_orderdate, l_orderkey
    LIMIT 10
"""


Q5_REGION = "ASIA"


def q_q5_nation_volume(sf_dir: str):
    """TPC-H Q5 shape — revenue per nation where the ordering customer
    and the supplier share the nation, restricted to one region: ONE
    partitioned lineitem⋈orders join (the only large-large edge) plus
    dimension broadcasts for customer→nation, supplier→nation and
    nation/region names. The c_nationkey = s_nationkey condition is a
    post-join vectorized mask (dense int-indexed lookup arrays), and
    each partition pre-reduces to ≤|nations| rows, so the final keyed
    shuffle is tiny regardless of scale."""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    cust = _t(_read(sf_dir, "customer",
                    columns=["c_custkey", "c_nationkey"]))
    supp = _t(_read(sf_dir, "supplier",
                    columns=["s_suppkey", "s_nationkey"]))
    nat = _t(_read(sf_dir, "nation",
                   columns=["n_nationkey", "n_name", "n_regionkey"]))
    reg = _t(_read(sf_dir, "region", columns=["r_regionkey", "r_name"]))

    # dense nationkey-indexed name / in-region arrays (≤25 entries)
    nk = nat["n_nationkey"].to_numpy(zero_copy_only=False)
    names = np.empty(nk.max() + 1, dtype=object)
    names[nk] = np.asarray(nat["n_name"].to_pylist(), dtype=object)
    region_of = np.full(nk.max() + 1, -1, dtype=np.int64)
    region_of[nk] = nat["n_regionkey"].to_numpy(zero_copy_only=False)
    asia = {int(k) for k, n in zip(
        reg["r_regionkey"].to_pylist(), reg["r_name"].to_pylist())
        if n == Q5_REGION}
    in_region = np.isin(region_of, list(asia))
    lookups_ref = ray.put((
        cust["c_custkey"].combine_chunks(),
        cust["c_nationkey"].combine_chunks(),
        supp["s_suppkey"].combine_chunks(),
        supp["s_nationkey"].combine_chunks(),
        names, in_region))

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"],
                   split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_suppkey",
                              "l_extendedprice", "l_discount"],
                     split=False)

    def order_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["o_orderkey"],
            "ck": pc.cast(t["o_custkey"], pa.int64()),
            "sk": pa.nulls(n, pa.int64()),
            "rev": pa.nulls(n, pa.float64()),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def line_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table({
            "key": t["l_orderkey"], "ck": pa.nulls(n, pa.int64()),
            "sk": pc.cast(t["l_suppkey"], pa.int64()),
            "rev": pc.cast(rev, pa.float64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(line_rows, batch_format="pyarrow"))

    empty = pa.table({"n_name": pa.array([], pa.string()),
                      "revenue": pa.array([], pa.float64())})

    def join_part(g: pa.Table) -> pa.Table:
        ckeys, cnat, skeys, snat, names_, in_region_ = ray.get(lookups_ref)
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)).select(["key", "ck"])
        right = g.filter(pa.array(side == 1)).select(["key", "sk", "rev"])
        if left.num_rows == 0 or right.num_rows == 0:
            return empty
        j = right.join(left, keys="key", join_type="inner")
        # dangling keys (testdata plants some) → null lookups → -1, which
        # the cn >= 0 mask drops before the equality test
        cn = pc.fill_null(
            pc.take(cnat, pc.index_in(j["ck"], value_set=ckeys)),
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        sn = pc.fill_null(
            pc.take(snat, pc.index_in(j["sk"], value_set=skeys)),
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        m = (cn >= 0) & (cn == sn) \
            & in_region_[np.clip(cn, 0, len(in_region_) - 1)]
        if not m.any():
            return empty
        sub = pa.table({
            "n_name": pa.array(names_[cn[m]].tolist(), pa.string()),
            "rev": j["rev"].combine_chunks().take(
                pa.array(np.nonzero(m)[0], pa.int64()))})
        agg = sub.group_by("n_name").aggregate([("rev", "sum")])
        return agg.rename_columns(["n_name", "revenue"])

    out = hash_shuffle_apply(tagged, "key", B, join_part, empty)
    agg = _t(out)
    if agg.num_rows == 0:
        return empty
    final = agg.group_by("n_name").aggregate([("revenue", "sum")])
    final = final.rename_columns(["n_name", "revenue"]).sort_by("n_name")
    return final.set_column(1, "revenue", _round(final["revenue"], 2))


ORACLE_SQL["q5_nation_volume"] = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
    GROUP BY n_name ORDER BY n_name
"""


# ---------------------------------------------------------------------------
# TPC-H closure batch 2: Q6 / Q4 / Q14 / Q18 / Q10 shapes
# (reference has no SQL engine; these exercise the same Ray-Data-first
# building blocks — pruned scan-aggregate, EXISTS semi-join, broadcast
# dimension ratio, HAVING over a partitioned aggregate, and a two-stage
# keyed shuffle with per-partition top-k — against DuckDB oracles.)

Q6_LO = __import__("datetime").datetime(1996, 1, 1)
Q6_HI = __import__("datetime").datetime(1997, 1, 1)


def q_q6_revenue_forecast(sf_dir: str):
    """TPC-H Q6 shape — the canonical pruned scan-aggregate: read ONLY
    the four needed columns, apply the (date, discount, quantity)
    filter per batch, pre-reduce each batch to ONE (sum, count) partial
    row, and fold the ≤n_blocks partials on the driver. Nothing
    shuffles; at 100 TB the wall-time is the column scan."""
    ds = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"], split=False)
    lo = pa.scalar(Q6_LO, pa.timestamp("us"))
    hi = pa.scalar(Q6_HI, pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                            pc.less(t["l_shipdate"], hi)),
                    pc.and_(pc.and_(
                        pc.greater_equal(t["l_discount"], pa.scalar(0.04)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.06))),
                        pc.less(t["l_quantity"], pa.scalar(24.0))))
        t = t.filter(m)
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"]))
        return pa.table({"rev": pa.array([rev.as_py() or 0.0],
                                         pa.float64()),
                         "n": pa.array([t.num_rows], pa.int64())})

    parts = _t(ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True))
    return pa.table({
        "revenue": _round(pa.array([pc.sum(parts["rev"]).as_py() or 0.0],
                                   pa.float64()), 2),
        "n_lines": pa.array([pc.sum(parts["n"]).as_py() or 0],
                            pa.int64())})


ORACLE_SQL["q6_revenue_forecast"] = """
    SELECT round(coalesce(sum(l_extendedprice * l_discount), 0), 2)
               AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24
"""


def q_q4_late_orders(sf_dir: str):
    """TPC-H Q4 shape — EXISTS(correlated predicate) as a partitioned
    semi-join: lineitem pre-reduces to ONE (orderkey, max shipdate)
    partial per batch (max is the exact witness for 'any line shipped
    after the order date'), both sides co-locate by orderkey, and each
    partition joins + tests the predicate + reduces to ≤|priorities|
    rows. The driver folds ≤5·B partial rows."""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"], split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_shipdate"], split=False)

    def order_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["o_orderkey"], "odate": t["o_orderdate"],
            "prio": t["o_orderpriority"],
            "maxship": pa.nulls(n, pa.timestamp("us")),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def line_rows(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("l_shipdate", "max")])
        n = g.num_rows
        return pa.table({
            "key": g["l_orderkey"],
            "odate": pa.nulls(n, pa.timestamp("us")),
            "prio": pa.nulls(n, pa.string()),
            "maxship": g["l_shipdate_max"],
            "side": pa.array(np.ones(n, dtype=np.int8))})

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(line_rows, batch_format="pyarrow"))

    empty = pa.table({"o_orderpriority": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)) \
            .select(["key", "odate", "prio"])
        right = g.filter(pa.array(side == 1)).select(["key", "maxship"])
        if left.num_rows == 0 or right.num_rows == 0:
            return empty
        agg = right.group_by("key").aggregate([("maxship", "max")])
        j = left.join(agg, keys="key", join_type="inner")
        j = j.filter(pc.greater(j["maxship_max"], j["odate"]))
        g2 = j.group_by("prio").aggregate([([], "count_all")])
        return pa.table({"o_orderpriority": g2["prio"],
                         "n": pc.cast(g2["count_all"], pa.int64())})

    out = _t(hash_shuffle_apply(tagged, "key", B, join_part, empty))
    if out.num_rows == 0:
        return empty
    final = out.group_by("o_orderpriority").aggregate([("n", "sum")])
    final = final.rename_columns(["o_orderpriority", "n"]) \
        .sort_by("o_orderpriority")
    return final.set_column(1, "n", pc.cast(final["n"], pa.int64()))


ORACLE_SQL["q4_late_orders"] = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


Q14_LO = __import__("datetime").datetime(1996, 3, 1)
Q14_HI = __import__("datetime").datetime(1996, 4, 1)


def q_q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape — broadcast dimension ratio: part's
    (partkey → is-PROMO) map ships once via ray.put, every lineitem
    batch probes it vectorized (index_in + take), pre-reduces to one
    (promo_rev, total_rev) partial row, and the driver folds partials.
    Inner-join semantics: lineitem rows whose partkey misses the part
    table drop (the testdata plants dangling keys)."""
    partt = _t(_read(sf_dir, "part", columns=["p_partkey", "p_type"]))
    lookup_ref = ray.put((
        partt["p_partkey"].combine_chunks(),
        pc.equal(partt["p_type"], pa.scalar("PROMO")).combine_chunks()))
    lo = pa.scalar(Q14_LO, pa.timestamp("us"))
    hi = pa.scalar(Q14_HI, pa.timestamp("us"))

    ds = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_shipdate", "l_extendedprice",
                        "l_discount"], split=False)

    def partial(t: pa.Table) -> pa.Table:
        keys, is_promo = ray.get(lookup_ref)
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                             pc.less(t["l_shipdate"], hi)))
        idx = pc.index_in(t["l_partkey"], value_set=keys)
        valid = pc.is_valid(idx)
        t = t.filter(valid)
        promo = pc.take(is_promo, idx.filter(valid))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        prev = pc.sum(pc.if_else(promo, rev, pa.scalar(0.0)))
        return pa.table({
            "promo": pa.array([prev.as_py() or 0.0], pa.float64()),
            "total": pa.array([pc.sum(rev).as_py() or 0.0],
                              pa.float64())})

    parts = _t(ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True))
    promo = pc.sum(parts["promo"]).as_py() or 0.0
    total = pc.sum(parts["total"]).as_py() or 0.0
    pct = 100.0 * promo / total if total else 0.0
    return pa.table({
        "promo_revenue": _round(pa.array([promo], pa.float64()), 2),
        "total_revenue": _round(pa.array([total], pa.float64()), 2),
        "promo_pct": _round(pa.array([pct], pa.float64()), 4)})


ORACLE_SQL["q14_promo_revenue"] = """
    SELECT round(coalesce(sum(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0 END), 0), 2) AS promo_revenue,
           round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0), 2)
               AS total_revenue,
           round(coalesce(100.0 *
                 sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount)
                     ELSE 0 END) / sum(l_extendedprice * (1 - l_discount)),
                 0), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
"""


Q18_MIN_QTY = 300.0


def q_q18_large_orders(sf_dir: str):
    """TPC-H Q18 shape — HAVING over a partitioned aggregate: lineitem
    pre-reduces per batch, co-locates with its order row by orderkey,
    each partition finalizes the per-order quantity sum, applies the
    HAVING cut (> 300), inner-joins the surviving handful to the
    partition's order rows and resolves c_name from the broadcast
    customer map. Only rows past the cut leave the partition, so the
    driver's final top-100 sort sees a few hundred rows at any scale.
    (Orders with a dangling custkey drop — inner-join semantics.)"""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    cust = _t(_read(sf_dir, "customer", columns=["c_custkey", "c_name"]))
    cust_ref = ray.put((cust["c_custkey"].combine_chunks(),
                        cust["c_name"].combine_chunks()))

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_totalprice"],
                   split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_quantity"], split=False)

    def order_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["o_orderkey"],
            "ck": pc.cast(t["o_custkey"], pa.int64()),
            "tp": pc.cast(t["o_totalprice"], pa.float64()),
            "qty": pa.nulls(n, pa.float64()),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def line_rows(t: pa.Table) -> pa.Table:
        g = t.group_by("l_orderkey").aggregate([("l_quantity", "sum")])
        n = g.num_rows
        return pa.table({
            "key": g["l_orderkey"], "ck": pa.nulls(n, pa.int64()),
            "tp": pa.nulls(n, pa.float64()),
            "qty": pc.cast(g["l_quantity_sum"], pa.float64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(line_rows, batch_format="pyarrow"))

    empty = pa.table({"c_name": pa.array([], pa.string()),
                      "o_custkey": pa.array([], pa.int64()),
                      "o_orderkey": pa.array([], pa.int64()),
                      "o_totalprice": pa.array([], pa.float64()),
                      "sum_qty": pa.array([], pa.float64())})

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)).select(["key", "ck", "tp"])
        right = g.filter(pa.array(side == 1)).select(["key", "qty"])
        if left.num_rows == 0 or right.num_rows == 0:
            return empty
        agg = right.group_by("key").aggregate([("qty", "sum")])
        agg = agg.filter(pc.greater(agg["qty_sum"],
                                    pa.scalar(Q18_MIN_QTY)))
        if agg.num_rows == 0:
            return empty
        j = left.join(agg, keys="key", join_type="inner")
        if j.num_rows == 0:
            return empty
        ckeys, cnames = ray.get(cust_ref)
        idx = pc.index_in(j["ck"], value_set=ckeys)
        valid = pc.is_valid(idx)
        j = j.filter(valid)
        name = pc.take(cnames, idx.filter(valid))
        return pa.table({
            "c_name": name,
            "o_custkey": pc.cast(j["ck"], pa.int64()),
            "o_orderkey": pc.cast(j["key"], pa.int64()),
            "o_totalprice": j["tp"],
            "sum_qty": pc.cast(j["qty_sum"], pa.float64())})

    out = _t(hash_shuffle_apply(tagged, "key", B, join_part, empty))
    if out.num_rows == 0:
        return empty
    idx = pc.select_k_unstable(
        out, k=100, sort_keys=[("o_totalprice", "descending"),
                               ("o_orderkey", "ascending")])
    final = out.take(idx)
    final = final.set_column(3, "o_totalprice",
                             _round(final["o_totalprice"], 2))
    return final.set_column(4, "sum_qty", _round(final["sum_qty"], 2))


ORACLE_SQL["q18_large_orders"] = """
    SELECT c_name, o_custkey, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           round(sum_qty, 2) AS sum_qty
    FROM (SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 300) q
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


Q10_LO = __import__("datetime").datetime(1996, 1, 1)
Q10_HI = __import__("datetime").datetime(1996, 4, 1)


def q_q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape — top-20 customers by returned-item revenue in a
    quarter: stage 1 co-locates date-filtered orders with
    returnflag-filtered lineitem revenue partials by ORDERKEY and emits
    per-partition (custkey, rev) partials; stage 2 re-keys by CUSTKEY,
    finalizes each customer's sum, resolves the broadcast customer
    attributes, and emits its partition's top-20; the driver merges
    ≤20·B rows. Two bounded keyed shuffles, no broadcast of either
    large side. (Top-20 cut ranks an order-of-summation-sensitive
    double — same documented caveat as q3.)"""
    from .shuffle import coarse_buckets, hash_shuffle_apply

    cust = _t(_read(sf_dir, "customer",
                    columns=["c_custkey", "c_name", "c_acctbal"]))
    cust_ref = ray.put((cust["c_custkey"].combine_chunks(),
                        cust["c_name"].combine_chunks(),
                        cust["c_acctbal"].combine_chunks()))

    total = _parquet_rows(sf_dir, "lineitem") + _parquet_rows(sf_dir,
                                                              "orders")
    B = coarse_buckets(total, rows_per_part=500_000)
    lo = pa.scalar(Q10_LO, pa.timestamp("us"))
    hi = pa.scalar(Q10_HI, pa.timestamp("us"))
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"],
                   split=False)
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_returnflag",
                              "l_extendedprice", "l_discount"],
                     split=False)

    def order_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["o_orderdate"], lo),
                             pc.less(t["o_orderdate"], hi)))
        n = t.num_rows
        return pa.table({
            "key": t["o_orderkey"],
            "ck": pc.cast(t["o_custkey"], pa.int64()),
            "rev": pa.nulls(n, pa.float64()),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def line_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        rev = pc.multiply(t["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), t["l_discount"]))
        g = pa.table({"key": t["l_orderkey"], "rev": rev}) \
            .group_by("key").aggregate([("rev", "sum")])
        n = g.num_rows
        return pa.table({
            "key": g["key"], "ck": pa.nulls(n, pa.int64()),
            "rev": pc.cast(g["rev_sum"], pa.float64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    tagged = orders.map_batches(order_rows, batch_format="pyarrow") \
        .union(lineitem.map_batches(line_rows, batch_format="pyarrow"))

    empty1 = pa.table({"ck": pa.array([], pa.int64()),
                       "rev": pa.array([], pa.float64())})

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)).select(["key", "ck"])
        right = g.filter(pa.array(side == 1)).select(["key", "rev"])
        if left.num_rows == 0 or right.num_rows == 0:
            return empty1
        agg = right.group_by("key").aggregate([("rev", "sum")])
        j = left.join(agg, keys="key", join_type="inner")
        g2 = pa.table({"ck": j["ck"], "rev": j["rev_sum"]}) \
            .group_by("ck").aggregate([("rev", "sum")])
        return g2.rename_columns(["ck", "rev"])

    parts = hash_shuffle_apply(tagged, "key", B, join_part, empty1)

    def rekey(t: pa.Table) -> pa.Table:
        from ..state.sketches import rehash
        ck = t["ck"].combine_chunks().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return t.append_column("hkey", pa.array(
            rehash(ck.view(np.uint64), 17).astype(np.int64)))

    empty2 = pa.table({"c_custkey": pa.array([], pa.int64()),
                       "c_name": pa.array([], pa.string()),
                       "revenue": pa.array([], pa.float64()),
                       "c_acctbal": pa.array([], pa.float64())})

    def topk_part(g: pa.Table) -> pa.Table:
        agg = g.group_by("ck").aggregate([("rev", "sum")])
        ckeys, cnames, cbal = ray.get(cust_ref)
        idx = pc.index_in(agg["ck"], value_set=ckeys)
        valid = pc.is_valid(idx)
        agg = agg.filter(valid)
        idx = idx.filter(valid)
        t = pa.table({
            "c_custkey": pc.cast(agg["ck"], pa.int64()),
            "c_name": pc.take(cnames, idx),
            "revenue": pc.cast(agg["rev_sum"], pa.float64()),
            "c_acctbal": pc.take(cbal, idx)})
        if t.num_rows == 0:   # all-dangling partition: select_k chokes
            return empty2     # on zero-chunk columns
        take = pc.select_k_unstable(
            t, k=20, sort_keys=[("revenue", "descending"),
                                ("c_custkey", "ascending")])
        return t.take(take)

    B2 = coarse_buckets(_parquet_rows(sf_dir, "customer"),
                        rows_per_part=800_000, cap=256)
    out = _t(hash_shuffle_apply(
        parts.map_batches(rekey, batch_format="pyarrow",
                          zero_copy_batch=True),
        "hkey", B2, topk_part, empty2))
    if out.num_rows == 0:
        return empty2
    idx = pc.select_k_unstable(
        out, k=20, sort_keys=[("revenue", "descending"),
                              ("c_custkey", "ascending")])
    final = out.take(idx)
    final = final.set_column(2, "revenue", _round(final["revenue"], 2))
    return final.set_column(3, "c_acctbal", _round(final["c_acctbal"], 2))


ORACLE_SQL["q10_returned_revenue"] = """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal
    FROM customer, orders, lineitem
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
    LIMIT 20
"""


# ---------------------------------------------------------------------------
# grouped ordered string-agg + partitioned FULL OUTER join

def q_user_event_paths(sf_dir: str):
    """Per-user ordered event-type path (SQL ``string_agg(... ORDER BY
    ts, event_id)``): one keyed shuffle co-locates each user's rows,
    then the partition kernel is three vectorized Arrow calls — sort by
    (user, ts, id), ``hash_list`` group_by (which preserves within-group
    encounter order), and ``binary_join`` to collapse each list to one
    delimited string. No per-group Python. Partitioning contract: one
    user's events fit one reduce task (same as sessionization)."""
    from .shuffle import coarse_buckets, hash_shuffle_apply
    from ..state.sketches import rehash

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])
    B = coarse_buckets(_parquet_rows(sf_dir, "events"), cap=1024)

    def add_key(t: pa.Table) -> pa.Table:
        uid = t["user_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("hkey", pa.array(
            rehash(uid.view(np.uint64), 17).astype(np.int64)))

    empty = pa.table({"user_id": pa.array([], pa.int64()),
                      "path": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())})

    def paths(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        idx = pc.sort_indices(
            g, sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                          ("event_id", "ascending")])
        g = g.take(idx)
        agg = g.group_by("user_id", use_threads=False).aggregate(
            [("event_type", "list"), ([], "count_all")])
        path = pc.binary_join(agg["event_type_list"], pa.scalar(">"))
        return pa.table({
            "user_id": pc.cast(agg["user_id"], pa.int64()),
            "path": path,
            "n": pc.cast(agg["count_all"], pa.int64())})

    out = hash_shuffle_apply(
        ds.map_batches(add_key, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, paths, empty)
    return _t(out).sort_by("user_id")


ORACLE_SQL["user_event_paths"] = """
    SELECT user_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id ORDER BY user_id
"""


def q_customer_order_full(sf_dir: str):
    """Partitioned FULL OUTER join — customers with no orders keep NULL
    order aggregates, order rows with a dangling custkey (the testdata
    plants some) keep NULL customer attributes. Same tagged-union keyed
    shuffle as the left join; each partition pre-finalizes the order
    aggregate and runs ONE Arrow full-outer join, so null extension on
    BOTH sides costs nothing beyond the inner plan and no side
    broadcasts."""
    from .shuffle import coarse_buckets, hash_shuffle_apply
    from ..state.sketches import rehash

    total = _parquet_rows(sf_dir, "orders") + _parquet_rows(sf_dir,
                                                            "customer")
    B = coarse_buckets(total, rows_per_part=500_000)
    customer = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_acctbal"], split=False)
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_totalprice"], split=False)

    def cust_rows(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": pc.cast(t["c_custkey"], pa.int64()),
            "bal": pc.cast(t["c_acctbal"], pa.float64()),
            "n_ord": pa.nulls(n, pa.int64()),
            "price": pa.nulls(n, pa.float64()),
            "side": pa.array(np.zeros(n, dtype=np.int8))})

    def order_rows(t: pa.Table) -> pa.Table:
        g = t.group_by("o_custkey").aggregate(
            [("o_totalprice", "sum"), ([], "count_all")])
        n = g.num_rows
        return pa.table({
            "key": pc.cast(g["o_custkey"], pa.int64()),
            "bal": pa.nulls(n, pa.float64()),
            "n_ord": pc.cast(g["count_all"], pa.int64()),
            "price": pc.cast(g["o_totalprice_sum"], pa.float64()),
            "side": pa.array(np.ones(n, dtype=np.int8))})

    def add_key(t: pa.Table) -> pa.Table:
        k = t["key"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("hkey", pa.array(
            rehash(k.view(np.uint64), 17).astype(np.int64)))

    tagged = customer.map_batches(cust_rows, batch_format="pyarrow") \
        .union(orders.map_batches(order_rows, batch_format="pyarrow")) \
        .map_batches(add_key, batch_format="pyarrow",
                     zero_copy_batch=True)

    empty = pa.table({"custkey": pa.array([], pa.int64()),
                      "acctbal": pa.array([], pa.float64()),
                      "n_orders": pa.array([], pa.int64()),
                      "sum_price": pa.array([], pa.float64())})

    def join_part(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        left = g.filter(pa.array(side == 0)).select(["key", "bal"])
        right = g.filter(pa.array(side == 1)) \
            .select(["key", "n_ord", "price"])
        agg = right.group_by("key").aggregate(
            [("n_ord", "sum"), ("price", "sum")])
        j = left.join(agg, keys="key", join_type="full outer")
        return pa.table({
            "custkey": pc.cast(j["key"], pa.int64()),
            "acctbal": j["bal"],
            "n_orders": pc.cast(
                pc.coalesce(j["n_ord_sum"], pa.scalar(0, pa.int64())),
                pa.int64()),
            "sum_price": pc.cast(j["price_sum"], pa.float64())})

    out = _t(hash_shuffle_apply(tagged, "hkey", B, join_part, empty))
    if out.num_rows == 0:
        return empty
    out = out.sort_by("custkey")
    out = out.set_column(1, "acctbal", _round(out["acctbal"], 2))
    return out.set_column(3, "sum_price", _round(out["sum_price"], 2))


ORACLE_SQL["customer_order_full"] = """
    WITH og AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                       sum(o_totalprice) AS sum_price
                FROM orders GROUP BY o_custkey)
    SELECT coalesce(c_custkey, o_custkey) AS custkey,
           round(c_acctbal, 2) AS acctbal,
           CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders,
           round(sum_price, 2) AS sum_price
    FROM customer c FULL JOIN og ON c_custkey = o_custkey
    ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# similarity RANGE search (all neighbors above a cosine threshold)

ANN_RANGE_TAU = 0.25
ANN_RANGE_NQ = 3


def q_ann_range_search(sf_dir: str):
    """Cosine RANGE search — every vector within cosine ≥ τ of each
    probe (top-k's sibling: fixed radius, unbounded result count). The
    probe matrix broadcasts once via ray.put; each batch computes one
    normalized (batch × probes) GEMM and emits only threshold-passing
    rows, so the scan streams with no shuffle at any scale. The
    selection compares the 5-decimal ROUNDED score (same convention as
    the oracle) — raw doubles differ from DuckDB's in the last ulp
    (summation order), rounded scores don't."""
    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                split=False)
    probes = _t(emb.filter(
        lambda r: r["vec_id"] < ANN_RANGE_NQ))
    pm = _emb_matrix(probes["embedding"])
    pm = pm / np.linalg.norm(pm, axis=1, keepdims=True)
    pids = probes["vec_id"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    probes_ref = ray.put((pids, pm))

    def scan(t: pa.Table) -> pa.Table:
        pids_, pm_ = ray.get(probes_ref)
        m = _emb_matrix(t["embedding"])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(m @ pm_.T, 5)           # (batch, n_probes)
        vid = t["vec_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        hit = (sims >= ANN_RANGE_TAU) & (vid[:, None] != pids_[None, :])
        rows, cols = np.nonzero(hit)
        return pa.table({
            "query_id": pa.array(pids_[cols]),
            "neighbor_id": pa.array(vid[rows]),
            "score_r": pa.array(sims[rows, cols])})

    out = _t_or(emb.map_batches(scan, batch_format="pyarrow",
                                zero_copy_batch=True),
                pa.table({"query_id": pa.array([], pa.int64()),
                          "neighbor_id": pa.array([], pa.int64()),
                          "score_r": pa.array([], pa.float64())}))
    return out.sort_by([("query_id", "ascending"),
                        ("neighbor_id", "ascending")])


ORACLE_SQL["ann_range_search"] = f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) qe
               FROM embeddings WHERE vec_id < {ANN_RANGE_NQ})
    SELECT query_id, e.vec_id AS neighbor_id,
           ROUND(list_cosine_similarity(
               q.qe, CAST(e.embedding AS DOUBLE[])), 5) AS score_r
    FROM q CROSS JOIN embeddings e
    WHERE e.vec_id != q.query_id
      AND ROUND(list_cosine_similarity(
              q.qe, CAST(e.embedding AS DOUBLE[])), 5) >= {ANN_RANGE_TAU}
    ORDER BY query_id, neighbor_id
"""
