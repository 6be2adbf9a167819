"""Text-similarity operators beyond hashing dedup: edit-distance
near-dup pairs (bucketed, fully vectorized Levenshtein DP — the fuzzy
family MinHash/SimHash can't express because it needs the exact
distance, not a collision) and EXACT corpus heavy-hitter tokens via a
mergeable Misra-Gries sketch plus a broadcast recount second pass (the
scalable alternative to a full token shuffle when only the head of the
distribution matters).

Both are Ray-Data-first: per-batch Arrow/numpy kernels, partials on the
wire, bounded driver state.

Scale notes
* ``edit_distance_pairs``: candidate pairs come from exact
  (n_chars // NCHAR_BUCKET) length blocking, so the all-pairs work is
  confined to one block; a block's rows co-locate through ONE keyed
  shuffle and the DP is O(pairs · PREFIX²) with numpy vectorized over
  the pair axis (the two DP loops run PREFIX² times regardless of pair
  count). A pathological block (everything one length and language)
  would need block-splitting + cross-block pair tasks — documented, not
  needed on this corpus shape.
* ``heavy_hitter_tokens``: pass 1 ships ≤ MG_K (token, count) partial
  rows per batch — no token shuffle at all; the driver folds partials
  (union ≤ MG_K · n_batches candidates, far below the vocabulary) and
  certifies exactness with the Misra-Gries bound: a token absent from
  every batch summary has true count ≤ Σ_b d_b (d_b = the count mass
  batch b discarded). If the certificate fails (k-th candidate's exact
  count ≤ that bound), it falls back to the exact keyed-shuffle census
  (top_ngrams machinery) — the result is exact either way.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

PREFIX = 24          # compared characters (ASCII corpus: bytes == chars)
MAX_DIST = 12
NCHAR_BUCKET = 4
MG_K = 64

# telemetry for tests: how the last heavy-hitter run certified
HH_STATS: dict = {}


def _prefix_matrix(col: pa.Array, prefix: int) -> tuple[np.ndarray,
                                                        np.ndarray]:
    """(n, prefix) uint8 byte matrix (zero-padded) + true lengths, built
    from the Arrow string buffers with one fancy-index scatter — no
    per-row Python."""
    s = pc.utf8_slice_codeunits(col, 0, prefix)
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    s = pc.cast(s, pa.binary())
    n = len(s)
    offs = np.frombuffer(s.buffers()[1], dtype=np.int32)[
        s.offset: s.offset + n + 1].astype(np.int64)
    vals = np.frombuffer(s.buffers()[2], dtype=np.uint8)[
        offs[0]: offs[-1]]
    offs = offs - offs[0]
    lens = np.diff(offs)
    mat = np.zeros((n, prefix), dtype=np.uint8)
    if offs[-1]:
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        cols = np.arange(offs[-1], dtype=np.int64) - np.repeat(offs[:-1],
                                                               lens)
        mat[rows, cols] = vals
    return mat, lens.astype(np.int64)


def levenshtein_pairs(a_mat: np.ndarray, a_len: np.ndarray,
                      b_mat: np.ndarray, b_len: np.ndarray) -> np.ndarray:
    """Levenshtein distance for each row pair (a_mat[i], b_mat[i]) over
    their true lengths — the classic DP with BOTH loops over the fixed
    PREFIX grid and every cell update vectorized across the pair axis
    (P² small numpy ops, never O(pairs) Python)."""
    npairs, P = a_mat.shape
    if npairs == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.where(a_len == 0, b_len, 0).astype(np.int64)
    prev = np.broadcast_to(np.arange(P + 1, dtype=np.int32),
                           (npairs, P + 1)).copy()
    for i in range(1, P + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = a_mat[:, i - 1]
        for j in range(1, P + 1):
            sub = prev[:, j - 1] + (ai != b_mat[:, j - 1])
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], sub, out=cur[:, j])
        hit = a_len == i
        if hit.any():
            out[hit] = cur[hit, b_len[hit]]
        prev = cur
    return out


def edit_distance_pairs(ds: "ray.data.Dataset",
                        n_rows: int) -> "ray.data.Dataset":
    """All document pairs in the same (n_chars // NCHAR_BUCKET) length
    block whose first-PREFIX-chars Levenshtein distance is ≤ MAX_DIST.
    One keyed shuffle co-locates each block; per partition, pair
    indices are generated per block (a loop over BLOCKS, not rows) and
    one vectorized DP scores every pair at once."""
    from ..state.sketches import rehash
    from .shuffle import coarse_buckets, hash_shuffle_apply

    B = coarse_buckets(n_rows, rows_per_part=100_000, cap=512)

    def add_key(t: pa.Table) -> pa.Table:
        block = t["n_chars"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64) \
            // NCHAR_BUCKET
        return pa.table({
            "doc_id": t["doc_id"], "text": t["text"], "block": block,
            "hkey": pa.array(rehash(block.view(np.uint64), 17)
                             .astype(np.int64))})

    empty = pa.table({"id_a": pa.array([], pa.int64()),
                      "id_b": pa.array([], pa.int64()),
                      "dist": pa.array([], pa.int64())})

    def pairs_part(g: pa.Table) -> pa.Table:
        if g.num_rows < 2:
            return empty
        idx = pc.sort_indices(g, sort_keys=[("block", "ascending"),
                                            ("doc_id", "ascending")])
        g = g.take(idx)
        block = g["block"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ids = g["doc_id"].combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        mat, lens = _prefix_matrix(g["text"].combine_chunks(), PREFIX)
        starts = np.r_[0, np.nonzero(block[1:] != block[:-1])[0] + 1,
                       len(block)]
        ii_parts, jj_parts = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            if e - s < 2:
                continue
            li, lj = np.triu_indices(e - s, k=1)
            ii_parts.append(li + s)
            jj_parts.append(lj + s)
        if not ii_parts:
            return empty
        ii = np.concatenate(ii_parts)
        jj = np.concatenate(jj_parts)
        dist = levenshtein_pairs(mat[ii], lens[ii], mat[jj], lens[jj])
        keep = dist <= MAX_DIST
        return pa.table({
            "id_a": pa.array(ids[ii[keep]]),
            "id_b": pa.array(ids[jj[keep]]),
            "dist": pa.array(dist[keep])})

    return hash_shuffle_apply(
        ds.map_batches(add_key, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, pairs_part, empty)


def q_edit_distance_pairs(sf_dir: str):
    from .queries import _parquet_rows, _read, _t

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "text", "n_chars"])
    out = edit_distance_pairs(ds, _parquet_rows(sf_dir, "documents"))
    t = _t(out)
    if t.num_rows == 0:        # _t loses the schema on an all-empty stream
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "dist": pa.array([], pa.int64())})
    return t.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


# ---------------------------------------------------------------------------
# exact heavy hitters: Misra-Gries candidates + broadcast recount


def _flat_tokens(t: pa.Table) -> pa.Array:
    """Non-empty whitespace tokens of the batch, flattened
    (regexp_extract_all('\\S+') parity)."""
    toks = pc.split_pattern_regex(t["text"], r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    return flat.filter(pc.not_equal(flat, ""))


def _mg_partial(t: pa.Table) -> pa.Table:
    """Misra-Gries summary of one batch: exact batch counts, keep the
    top MG_K after subtracting the (MG_K+1)-th count d — every emitted
    count is an underestimate by ≤ d, every omitted token has batch
    count ≤ d. One SENTINEL row (token='', which the tokenizer can
    never emit) carries the batch's discarded-mass bound d, so the
    driver can form Σ_b d_b without any block-boundary assumption."""
    flat = _flat_tokens(t)
    if len(flat) == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "d": pa.array([], pa.int64())})
    g = pa.table({"token": flat}).group_by("token") \
        .aggregate([([], "count_all")]).rename_columns(["token", "cnt"])
    cnt = g["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(cnt) <= MG_K:
        d = 0
        keep = np.arange(len(cnt))
    else:
        order = np.argsort(-cnt, kind="stable")
        d = int(cnt[order[MG_K]])
        keep = order[:MG_K]
        keep = keep[cnt[keep] > d]
    kept = g.take(pa.array(keep, pa.int64()))
    n = kept.num_rows
    return pa.table({
        "token": pa.concat_arrays([
            kept["token"].combine_chunks().cast(pa.string()),
            pa.array([""], pa.string())]),
        "cnt": pa.concat_arrays([
            pc.subtract(kept["cnt"], pa.scalar(d, pa.int64()))
            .combine_chunks().cast(pa.int64()),
            pa.array([0], pa.int64())]),
        "d": pa.array(np.r_[np.zeros(n, np.int64), d])})


def heavy_hitter_tokens(ds: "ray.data.Dataset", k: int = 10,
                        census_fallback=None) -> pa.Table:
    """Exact top-k tokens with NO token shuffle: MG summaries per batch
    (≤ MG_K rows each) fold on the driver into a candidate set +
    miss bound; one broadcast recount pass makes candidate counts
    exact; the top-k is certified exact when the k-th exact count
    exceeds the miss bound (else: exact census fallback)."""
    parts_ds = ds.map_batches(_mg_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    from .queries import _t

    parts = _t(parts_ds)
    if parts.num_rows == 0:
        return pa.table({"token": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    # Σ_b d_b lives on the per-batch sentinel rows (token='')
    miss_bound = int(pc.sum(
        parts.filter(pc.equal(parts["token"], ""))["d"]).as_py() or 0)
    cand = parts.filter(pc.not_equal(parts["token"], "")) \
        .group_by("token").aggregate([("cnt", "sum")])
    cand_tokens = cand["token"].combine_chunks()
    cand_ref = ray.put(cand_tokens)

    def recount(t: pa.Table) -> pa.Table:
        cands = ray.get(cand_ref)
        flat = _flat_tokens(t)
        flat = flat.filter(pc.is_in(flat, value_set=cands))
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"token": flat}).group_by("token") \
            .aggregate([([], "count_all")])
        return g.rename_columns(["token", "n"])

    exact = _t(ds.map_batches(recount, batch_format="pyarrow",
                              zero_copy_batch=True)) \
        .group_by("token").aggregate([("n", "sum")]) \
        .rename_columns(["token", "n"])
    idx = pc.sort_indices(exact, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
    top = exact.take(idx.slice(0, k))
    kth = top.column("n").to_pylist()[-1] if top.num_rows >= k else 0
    certified = top.num_rows >= k and kth > miss_bound
    HH_STATS.clear()
    HH_STATS.update({"candidates": cand.num_rows,
                     "miss_bound": miss_bound, "kth": kth,
                     "certified": bool(certified)})
    if certified or census_fallback is None:
        if not certified and census_fallback is None:
            raise RuntimeError(
                f"heavy-hitter certificate failed (kth={kth} <= "
                f"bound={miss_bound}) and no census fallback given")
        return top.set_column(1, "n", pc.cast(top["n"], pa.int64()))
    return census_fallback()


def q_heavy_hitter_tokens(sf_dir: str):
    from .queries import _read

    ds = _read(sf_dir, "documents", columns=["text"])

    def census():
        # exact fallback: full unigram keyed-shuffle census (top_ngrams
        # machinery at unigram granularity) — unconditionally exact
        from .queries import _t
        from ..state.sketches import hash64
        from .shuffle import coarse_buckets, hash_shuffle_apply

        def partial(t: pa.Table) -> pa.Table:
            flat = _flat_tokens(t)
            g = pa.table({"token": flat}).group_by("token") \
                .aggregate([([], "count_all")]) \
                .rename_columns(["token", "n"])
            return g.append_column(
                "hkey", pa.array(hash64(g["token"]).astype(np.int64)))

        def topk_part(g: pa.Table) -> pa.Table:
            agg = g.group_by("token").aggregate([("n", "sum")]) \
                .rename_columns(["token", "n"])
            idx = pc.sort_indices(agg, sort_keys=[("n", "descending"),
                                                  ("token", "ascending")])
            return agg.take(idx.slice(0, 10))

        empty = pa.table({"token": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        from .queries import _parquet_rows

        B = coarse_buckets(_parquet_rows(sf_dir, "documents") * 30)
        t = _t(hash_shuffle_apply(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True),
            "hkey", B, topk_part, empty))
        idx = pc.sort_indices(t, sort_keys=[("n", "descending"),
                                            ("token", "ascending")])
        return t.take(idx.slice(0, 10))

    return heavy_hitter_tokens(ds, k=10, census_fallback=census)


TEXTSIM_ORACLE_SQL: dict[str, str] = {
    "edit_distance_pairs": f"""
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(levenshtein(substr(a.text, 1, {PREFIX}),
                                substr(b.text, 1, {PREFIX})) AS BIGINT)
                   AS dist
        FROM documents a JOIN documents b
          ON a.n_chars // {NCHAR_BUCKET} = b.n_chars // {NCHAR_BUCKET}
         AND a.doc_id < b.doc_id
        WHERE levenshtein(substr(a.text, 1, {PREFIX}),
                          substr(b.text, 1, {PREFIX})) <= {MAX_DIST}
        ORDER BY id_a, id_b
    """,
    "heavy_hitter_tokens": r"""
        SELECT t AS token, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS t
              FROM documents)
        GROUP BY t ORDER BY n DESC, token LIMIT 10
    """,
}
