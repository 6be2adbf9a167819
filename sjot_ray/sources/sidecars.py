"""Oracle sidecars: engine-independent ground-truth tables written to
/tmp/sjot_ray_corpus so DuckDB can join them in ``oracle_sql()``.

Pattern (established by ``gen.expected_violations_parquet``): the
generator — which KNOWS what it planted — renders the expected result as
a parquet the driver's oracle SQL reads with ``read_parquet``. Each
sidecar carries a discriminator column (``num_docs`` / ``n_docs``) so all
sizes share one glob and the SQL selects its corpus with a WHERE over a
registered view's row count.

Two sidecars here:

* ``expected_media_meta`` — per-media-span planted metadata
  (width/height/duration_s/n_frames from ``multimodal.media_params``,
  fixed BEFORE any encode) for VALID flagship docs; the oracle aggregates
  it with plain SQL, certifying the real encode→decode→aggregate path.
* ``expected_simhash_pairs`` — brute-force all-pairs Hamming scan over
  the documents table's SimHash fingerprints, with the fingerprint
  majority vote and popcount REIMPLEMENTED independently of the
  pipeline's kernels; only the token-hash definition (``hash64``) is
  shared, as it defines the operator. Certifies the pigeonhole
  bucketing, equal-fp star collapse, hot-chunk second-level split and
  manual hash shuffle against a 20-line quadratic spec.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

CACHE_DIR = "/tmp/sjot_ray_corpus"


# -- multimodal media-meta sidecar -------------------------------------------

def expected_media_meta(num_docs: int, seed: int = 42) -> pa.Table:
    """Ground-truth (media_ref, kind, width, height, duration_s, n_frames)
    rows for every media span of every VALID doc in the flagship corpus —
    derived from the planted parameter draws, no encode/decode involved."""
    from ..pipelines.multimodal import media_params
    from ..state.sketches import hash64
    from .gen import generate_interleaved

    tbl = generate_interleaved(num_docs, seed)
    valid = pc.equal(tbl["violation_class"], "")
    tbl = tbl.filter(valid)

    spans = tbl["spans"].combine_chunks()
    lengths = pc.fill_null(pc.list_value_length(spans), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    doc_rep = tbl["doc_id"].combine_chunks().take(
        pa.array(np.repeat(np.arange(tbl.num_rows), lengths)))
    flat = spans.flatten()
    media_ref = flat.field("media_ref")
    kind = flat.field("kind")
    keep = pc.is_valid(media_ref)
    media_ref, kind = media_ref.filter(keep), kind.filter(keep)
    doc_rep = doc_rep.filter(keep)

    h = hash64(media_ref)
    kinds = kind.to_pylist()
    n = len(kinds)
    width = np.empty(n, np.int64)
    height = np.empty(n, np.int64)
    duration = np.empty(n, np.float64)
    n_frames = np.empty(n, np.int64)
    memo: dict[tuple, tuple] = {}
    for i, (hi, k) in enumerate(zip(h, kinds)):
        key = (int(hi), k)
        m = memo.get(key)
        if m is None:
            meta, _ = media_params(int(hi), k)
            m = (meta["width"], meta["height"], meta["duration_s"],
                 meta["n_frames"])
            memo[key] = m
        width[i], height[i], duration[i], n_frames[i] = m
    return pa.table({
        "doc_id": doc_rep,
        "media_ref": media_ref,
        "kind": kind,
        "width": pa.array(width),
        "height": pa.array(height),
        "duration_s": pa.array(duration),
        "n_frames": pa.array(n_frames),
    })


def expected_media_meta_parquet(num_docs: int, seed: int = 42,
                                cache_dir: str = CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"expected_media_meta_n{num_docs}_s{seed}.parquet")
    if not os.path.exists(path):
        t = expected_media_meta(num_docs, seed)
        t = t.append_column(
            "num_docs", pa.array(np.full(t.num_rows, num_docs), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


# -- simhash near-pair sidecar -----------------------------------------------

def _simhash_independent(texts: list, token_hash) -> np.ndarray:
    """Per-doc 64-bit SimHash fingerprints, reimplemented from the
    definition: tokenize on \\s+ (regex-split semantics identical to
    pyarrow's split_pattern_regex, empties preserved at the edges), hash
    each token with the shared ``hash64`` definition, set bit b iff a
    strict majority of token hashes has bit b set."""
    n = len(texts)
    fps = np.zeros(n, np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    for i, s in enumerate(texts):
        if s is None:
            continue
        toks = re.split(r"\s+", s)
        h = token_hash(np.asarray(toks, dtype=object))
        ones = ((h[:, None] >> shifts) & np.uint64(1)).sum(axis=0)
        bits = (2 * ones > len(h))
        fps[i] = np.sum(np.where(bits, np.uint64(1) << shifts, np.uint64(0)),
                        dtype=np.uint64)
    return fps


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Independent popcount: sum of unpacked bytes (no bit tricks)."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1).astype(np.int64)


def expected_simhash_pairs(documents_path: str, radius: int = 3) -> pa.Table:
    """Brute-force spec of :func:`..pipelines.dedup.simhash_near_pairs`'s
    output contract over a documents parquet: equal-fingerprint groups
    emit star edges (min-id → others, distance 0); one representative
    (min id) per distinct fingerprint enters an ALL-PAIRS O(n²) Hamming
    scan; representative pairs with 0 < distance ≤ radius are emitted as
    (min, max, distance)."""
    from ..state.sketches import hash64

    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    fps = _simhash_independent(t["text"].to_pylist(), hash64)

    order = np.lexsort((ids, fps))
    ids_s, fps_s = ids[order], fps[order]
    new = np.ones(len(ids_s), dtype=bool)
    new[1:] = fps_s[1:] != fps_s[:-1]
    counts = np.bincount(np.cumsum(new) - 1)
    starts = np.cumsum(counts) - counts

    out_a, out_b, out_d = [], [], []
    for st, c in zip(starts[counts >= 2], counts[counts >= 2]):
        out_a.append(np.full(c - 1, ids_s[st]))
        out_b.append(ids_s[st + 1:st + c])
        out_d.append(np.zeros(c - 1, np.int64))

    rep_ids, rep_fps = ids_s[starts], fps_s[starts]
    m = len(rep_ids)
    for i in range(m):                       # O(m²) by design: the oracle
        d = _popcount64(rep_fps[i + 1:] ^ rep_fps[i])
        hit = np.nonzero((d > 0) & (d <= radius))[0]
        if len(hit):
            a = np.full(len(hit), rep_ids[i])
            b = rep_ids[i + 1 + hit]
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
            out_d.append(d[hit])
    if not out_a:
        return pa.table({"id_a": pa.array([], pa.int64()),
                         "id_b": pa.array([], pa.int64()),
                         "hamming": pa.array([], pa.int64())})
    return pa.table({"id_a": pa.array(np.concatenate(out_a), pa.int64()),
                     "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                     "hamming": pa.array(np.concatenate(out_d), pa.int64())})


def corpus_key(documents_path: str) -> int:
    """Content discriminator for a documents table, computable identically
    in SQL (``SELECT sum(doc_id * 1000003 + n_chars) FROM documents``) —
    two sf dirs can share a row count (sf0.001 and sf0.01 both have 500
    docs), so the sidecar keys on content, not size."""
    t = pq.read_table(documents_path, columns=["doc_id", "n_chars"])
    di = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
    return int(np.sum(di * 1000003 + nc))


def expected_simhash_parquet(documents_path: str, radius: int = 3,
                             cache_dir: str = CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    key = corpus_key(documents_path)
    path = os.path.join(cache_dir,
                        f"expected_simhash_k{key}_r{radius}.parquet")
    if not os.path.exists(path):
        t = expected_simhash_pairs(documents_path, radius)
        t = t.append_column(
            "corpus_key", pa.array(np.full(t.num_rows, key), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path
