"""Deduplication family over document text / embeddings — the
training-data-pipeline ops, each shaped for scale:

* exact: content-hash → hash-keyed groupby over per-batch partials.
* MinHash + LSH: per-batch shingle→minhash signatures (vectorized
  reduceat), explode to (band, band_hash) keys, groupby bands → candidate
  pairs → Jaccard verify. Only signatures shuffle, never text.
* SimHash: 64-bit fingerprints per batch; near-dup = same fingerprint
  bucket (or small Hamming radius within buckets).
* n-gram Jaccard verify: exact similarity on candidate pairs only.
* embedding cosine: LSH-style random-hyperplane bucketing, exact cosine
  within buckets (the brute-force exact path lives in
  queries.q_ann_cosine_topk).

All stages are deterministic (fixed seeds) so reruns reproduce byte-equal
outputs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..state.sketches import hash64, minhash_signatures, rehash, simhash

NUM_PERM = 64
BANDS = 16  # 16 bands × 4 rows: catches J≳0.5 pairs with high recall


def _shingle_hashes(texts: pa.ChunkedArray | pa.Array, k: int = 5):
    """Word-k-shingle hashes per row, flattened + offsets (vectorized)."""
    toks = pc.split_pattern_regex(texts, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lengths = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lengths = np.nan_to_num(lengths).astype(np.int64)
    flat = toks.flatten()
    th = hash64(flat)
    # rolling combine of k consecutive token hashes within each row
    n_sh = np.maximum(lengths - k + 1, 1)
    row_of = np.repeat(np.arange(len(lengths)), lengths)
    sh_list = []
    acc = th.copy()
    for j in range(1, k):
        shifted = np.roll(th, -j)
        acc = rehash(acc ^ shifted, j)
    # valid shingle start positions: those with k tokens in the same row
    starts_all = np.arange(len(th))
    row_end = np.cumsum(lengths)
    row_start = row_end - lengths
    pos_in_row = starts_all - np.repeat(row_start, lengths)
    valid = pos_in_row <= np.repeat(lengths, lengths) - k
    # rows shorter than k: use the single whole-row hash (position 0)
    short_rows = lengths < k
    first_pos = np.repeat(row_start, lengths) == starts_all
    valid |= first_pos & np.repeat(short_rows, lengths)
    sh = acc[valid]
    sh_rows = row_of[valid]
    counts = np.bincount(sh_rows, minlength=len(lengths))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return sh, offsets


class MinHashStage:
    """Per-batch: text → minhash signature → LSH band keys."""

    def __init__(self, text_col="text", id_col="doc_id",
                 num_perm=NUM_PERM, bands=BANDS, shingle_k=5):
        self.text_col, self.id_col = text_col, id_col
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.rows_per_band = num_perm // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        sh, offsets = _shingle_hashes(t[self.text_col], self.k)
        sig = minhash_signatures(sh, offsets, self.num_perm)
        # band hashes: combine the band's rows into one uint64 key
        n = t.num_rows
        band_ids, band_hashes, ids = [], [], []
        id_vals = t[self.id_col]
        for b in range(self.bands):
            cols = sig[:, b * self.rows_per_band:(b + 1) * self.rows_per_band]
            key = cols[:, 0]
            for j in range(1, self.rows_per_band):
                key = rehash(key ^ cols[:, j], j + 101)
            band_ids.append(np.full(n, b, dtype=np.int32))
            band_hashes.append(key)
            ids.append(id_vals)
        return pa.table({
            "band": pa.array(np.concatenate(band_ids)),
            "band_hash": pa.array(np.concatenate(band_hashes).astype(np.int64)),
            self.id_col: pa.concat_arrays(
                [i.combine_chunks() if isinstance(i, pa.ChunkedArray) else i
                 for i in ids]),
        })


def minhash_candidates(ds: "ray.data.Dataset", text_col="text",
                       id_col="doc_id") -> "ray.data.Dataset":
    """(band, band_hash) buckets with >1 member → candidate groups."""
    bands = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group[id_col].to_pylist()))
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        a, b = [], []
        anchor = ids[0]
        for other in ids[1:]:
            a.append(anchor)
            b.append(other)
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(b, pa.int64())})

    pairs = bands.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pyarrow")
    return pairs


def verify_jaccard(pairs: pa.Table, docs: pa.Table, text_col="text",
                   id_col="doc_id", k: int = 5,
                   threshold: float = 0.5) -> pa.Table:
    """Exact n-gram Jaccard on candidate pairs (small side — candidates
    only). Deterministic output sorted by (id_a, id_b)."""
    if pairs.num_rows == 0:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    import pandas as pd

    uniq = pd.DataFrame({"id_a": pairs["id_a"].to_pandas(),
                         "id_b": pairs["id_b"].to_pandas()}) \
        .drop_duplicates().reset_index(drop=True)
    id_to_text = dict(zip(docs[id_col].to_pylist(),
                          docs[text_col].to_pylist()))

    def shingles(s):
        ws = s.split()
        if len(ws) < k:
            return {tuple(ws)}
        return {tuple(ws[i:i + k]) for i in range(len(ws) - k + 1)}

    ja = []
    for a, b in zip(uniq["id_a"], uniq["id_b"]):
        sa, sb = shingles(id_to_text[a]), shingles(id_to_text[b])
        inter = len(sa & sb)
        ja.append(inter / max(1, len(sa | sb)))
    uniq["jaccard"] = np.round(ja, 4)
    uniq = uniq[uniq["jaccard"] >= threshold]
    uniq = uniq.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(uniq, preserve_index=False)


class SimHashStage:
    def __init__(self, text_col="text", id_col="doc_id"):
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t[self.text_col], r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lengths = np.nan_to_num(
            pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        flat = toks.flatten()
        offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int64)
        fp = simhash(hash64(flat), offsets)
        return pa.table({
            self.id_col: t[self.id_col],
            "simhash": pa.array(fp.astype(np.int64)),
        })


def simhash_fingerprints(ds: "ray.data.Dataset", text_col="text",
                         id_col="doc_id") -> "ray.data.Dataset":
    return ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 8))


# -- embedding near-dup ------------------------------------------------------

def embedding_near_dups(ds: "ray.data.Dataset", threshold: float = 0.95,
                        n_planes: int = 12, seed: int = 42,
                        id_col="vec_id", emb_col="embedding"):
    """Random-hyperplane LSH bucketing + exact cosine within buckets.

    Scale path: only (bucket, id, normalized vector) shuffles; buckets are
    ~n/2^planes rows. At 10^12 scale you'd re-bucket with multiple plane
    sets for recall; one set here (deterministic)."""
    first = ds.take(1)[0]
    dim = len(first[emb_col])
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_planes))
    planes_ref = ray.put(planes)

    class Bucket:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            X = np.asarray(t[emb_col].to_pylist(), dtype=np.float64)
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                                1e-12)
            bits = (Xn @ self.planes) > 0
            bucket = np.zeros(len(X), dtype=np.int64)
            for j in range(bits.shape[1]):
                bucket |= bits[:, j].astype(np.int64) << j
            return pa.table({
                "bucket": pa.array(bucket),
                id_col: t[id_col],
                "vec": pa.array(list(Xn), pa.list_(pa.float64())),
            })

    bucketed = ds.map_batches(Bucket, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))

    def within(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist())
        X = np.asarray(group["vec"].to_pylist(), dtype=np.float64)
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        S = X @ X.T
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = S[iu, ju] >= threshold
        order = np.argsort(ids)
        a, b = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table({"id_a": pa.array(lo, type=pa.int64()),
                         "id_b": pa.array(hi, type=pa.int64()),
                         "cosine": pa.array(
                             np.round(S[iu, ju][keep], 4))})

    return bucketed.groupby("bucket").map_groups(within,
                                                 batch_format="pyarrow")


# -- queries()-facing wrappers ----------------------------------------------

def q_minhash_near_dups(sf_dir: str):
    """MinHash-LSH near-dup pairs over documents, Jaccard-verified.
    Deterministic; rows-only oracle (LSH is not SQL-expressible)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    pairs_ds = minhash_candidates(ds)
    batches = list(pairs_ds.iter_batches(batch_format="pyarrow",
                                         batch_size=None))
    pairs = pa.concat_tables(batches) if batches else pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    docs = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))
    return verify_jaccard(pairs, docs, threshold=0.4)


def q_simhash_near_dups(sf_dir: str):
    """SimHash fingerprints; groups of docs sharing a fingerprint."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    fps = simhash_fingerprints(ds)

    def dup_groups(t: pa.Table) -> pa.Table:
        g = t.group_by("simhash").aggregate([("doc_id", "count"),
                                             ("doc_id", "min")])
        g = g.rename_columns(["simhash", "n", "min_doc_id"])
        return g.filter(pc.greater(g["n"], 1))

    out = fps.groupby("simhash").map_groups(
        lambda g: dup_groups(g), batch_format="pyarrow")
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    t = pa.concat_tables(batches) if batches else pa.table(
        {"simhash": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
         "min_doc_id": pa.array([], pa.int64())})
    return t


def q_embedding_near_dups(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    out = embedding_near_dups(ds, threshold=0.9)
    batches = list(out.iter_batches(batch_format="pyarrow", batch_size=None))
    t = pa.concat_tables(batches) if batches else pa.table({})
    if t.num_rows:
        idx = pc.sort_indices(t, sort_keys=[("id_a", "ascending"),
                                            ("id_b", "ascending")])
        t = t.take(idx)
    return t


def q_ngram_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard on doc pairs that share an exact-dedup prefix
    key (the verify half of the dedup pipeline, standalone)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    docs = pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))

    def keyed(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(t["text"], r"\s+")
        key = pc.binary_join(pc.list_slice(toks, 0, 2), " ")
        return pa.table({"key": key, "doc_id": t["doc_id"]})

    def pairs_of(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        if len(ids) < 2:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        return pa.table({
            "id_a": pa.array([ids[0]] * (len(ids) - 1), pa.int64()),
            "id_b": pa.array(ids[1:], pa.int64())})

    pairs = pa.concat_tables(list(
        ds.map_batches(keyed, batch_format="pyarrow")
          .groupby("key").map_groups(pairs_of, batch_format="pyarrow")
          .iter_batches(batch_format="pyarrow", batch_size=None)))
    return verify_jaccard(pairs, docs, k=3, threshold=0.0)
