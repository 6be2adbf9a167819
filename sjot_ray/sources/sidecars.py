"""Oracle sidecars: engine-independent ground-truth tables written to
/tmp/sjot_ray_corpus so DuckDB can join them in ``oracle_sql()``.

Pattern (established by ``gen.expected_violations_parquet``): the
generator — which KNOWS what it planted — renders the expected result as
a parquet the driver's oracle SQL reads with ``read_parquet``. Each
sidecar carries a discriminator column (``num_docs`` / ``n_docs``) so all
sizes share one glob and the SQL selects its corpus with a WHERE over a
registered view's row count.

Sidecars here:

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
* ``expected_minhash_pairs`` — dict-bucketed brute-force spec of the
  MinHash-LSH candidate contract + exact-Jaccard verify: per-doc shingle
  sets and band keys recomputed with scalar loops (sharing only the
  hash/signature DEFINITIONS ``hash64``/``rehash``, which define the
  operator), buckets grouped in a plain Python dict, the mass-duplicate
  star collapse replayed per bucket, and Jaccard computed from Python
  ``set`` intersections — certifying the vectorized reduceat signatures,
  the manual hash shuffle and the two-round keyed verify join.
* ``expected_dedup_groups`` — driver union-find over the expected
  verified pair set → (doc_id, group_id, keep); certifies the
  distributed min-label-propagation components + decision table.
* ``expected_embedding_pairs`` — brute-force spec of the
  random-hyperplane LSH near-dup contract: plane bucketing recomputed
  per set with a scalar bit loop, candidates from a dict of buckets,
  equal-raw-vector star collapse replayed, cosine from einsum on
  normalized rows — certifies the bucketed shuffle + within-bucket
  verify.
* ``expected_dangling_media`` — the generator's OWN dangling-ref
  decisions (gen.py plants refs under the ``s3://bucket/missing``
  stem that the media catalog never contains) aggregated to
  (media_ref, n) — certifies the Bloom + exact broadcast anti-join.
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


# -- minhash-LSH near-pair + dedup-group sidecars ----------------------------

def _shingle_sets_independent(texts: list, k: int = 5):
    """Per-doc word-k-shingle hash SETS, reimplemented from the operator
    definition with per-row scalar loops (vs the pipeline's masked-roll
    vectorization): tokenize on \\s+, hash tokens with the shared
    ``hash64`` definition, combine k consecutive token hashes with the
    shared order-sensitive ``rehash``-fold (positions past the row's end
    contribute 0); rows shorter than k contribute their single
    position-0 fold. Returns a list of uint64 ndarrays (unique values)."""
    from ..state.sketches import hash64, rehash

    out = []
    for s in texts:
        if s is None:
            out.append(np.zeros(0, np.uint64))
            continue
        toks = re.split(r"\s+", s)
        th = hash64(np.asarray(toks, dtype=object))
        L = len(th)
        n_pos = max(1, L - k + 1) if L < k else L - k + 1
        sh = np.empty(n_pos, np.uint64)
        for i in range(n_pos):
            acc = th[i:i + 1].copy()
            for j in range(1, k):
                nxt = th[i + j:i + j + 1] if i + j < L \
                    else np.zeros(1, np.uint64)
                acc = rehash(acc, j) ^ nxt
            sh[i] = acc[0]
        out.append(np.unique(sh))
    return out


def _minhash_band_keys(shingle_sets: list, num_perm: int = 64,
                       bands: int = 16, seed: int = 42) -> np.ndarray:
    """Per-doc LSH band keys (n_docs, bands) int64, recomputed per doc
    from the signature/band-key DEFINITIONS (min of ``rehash(sh, seed+p)``
    per permutation; band key = the band's rows folded with
    ``rehash(·, j+101)`` then salted with ``rehash(·, 7919+b)``)."""
    from ..state.sketches import rehash

    rpb = num_perm // bands
    n = len(shingle_sets)
    keys = np.empty((n, bands), np.int64)
    mask = np.uint64(0xFFFFFFFFFFFFFFFF)
    for i, sh in enumerate(shingle_sets):
        if len(sh):
            sig = np.array([rehash(sh, seed + p).min()
                            for p in range(num_perm)], np.uint64)
        else:
            sig = np.full(num_perm, mask, np.uint64)
        for b in range(bands):
            key = sig[b * rpb:b * rpb + 1].copy()
            for j in range(1, rpb):
                key = rehash(key, j + 101) ^ sig[b * rpb + j:b * rpb + j + 1]
            keys[i, b] = int(rehash(key, 7919 + b).view(np.int64)[0])
    return keys


def _star_collapse_pairs(buckets: dict) -> set:
    """Replay the mass-duplicate star collapse over a {bucket_key:
    [(content_key, id), ...]} dict: per bucket, equal-content groups emit
    (min-id → others) star edges and one min-id representative per
    distinct content enters the within-bucket all-pairs. Returns the
    deduplicated unordered candidate-pair set {(lo, hi), ...}."""
    pairs: set = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(members)
        by_content: dict = {}
        for ck, did in members:
            by_content.setdefault(ck, []).append(did)
        reps = []
        for ids in by_content.values():
            reps.append(ids[0])
            for other in ids[1:]:
                pairs.add((ids[0], other))
        reps.sort()
        for x in range(len(reps)):
            for y in range(x + 1, len(reps)):
                a, b = reps[x], reps[y]
                pairs.add((min(a, b), max(a, b)))
    return pairs


def expected_minhash_pairs(documents_path: str, k: int = 5,
                           threshold: float = 0.4) -> pa.Table:
    """Brute-force spec of :func:`..pipelines.dedup.q_minhash_near_dups`'s
    output contract: candidate pairs are doc pairs sharing an LSH band
    key bucket (with the star collapse replayed per bucket), and the
    output is every candidate pair whose exact shingle-set Jaccard —
    rounded half-towards-infinity to 4 digits BEFORE thresholding, the
    operator's documented admission rule — is ≥ ``threshold``."""
    from ..state.sketches import hash64

    t = pq.read_table(documents_path, columns=["doc_id", "text"])
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t["text"].to_pylist()
    sets = _shingle_sets_independent(texts, k)
    keys = _minhash_band_keys(sets)
    chash = hash64(t["text"]).view(np.int64)

    buckets: dict = {}
    for i in range(len(ids)):
        for b in range(keys.shape[1]):
            buckets.setdefault(int(keys[i, b]), []).append(
                (int(chash[i]), int(ids[i])))
    cand = _star_collapse_pairs(buckets)

    by_id = {int(d): s for d, s in zip(ids, sets)}
    out_a, out_b, out_j = [], [], []
    for a, b in sorted(cand):
        A, B = by_id[a], by_id[b]
        inter = len(np.intersect1d(A, B))
        union = len(A) + len(B) - inter
        j = inter / max(union, 1)
        j_r = pc.round(pa.array([j], pa.float64()), 4,
                       round_mode="half_towards_infinity")[0].as_py()
        if j_r >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_j.append(j_r)
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "jaccard": pa.array(out_j, pa.float64())})


def expected_minhash_parquet(documents_path: str,
                             cache_dir: str = CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    key = corpus_key(documents_path)
    path = os.path.join(cache_dir, f"expected_minhash_k{key}.parquet")
    if not os.path.exists(path):
        t = expected_minhash_pairs(documents_path)
        t = t.append_column(
            "corpus_key", pa.array(np.full(t.num_rows, key), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


def expected_dedup_groups(documents_path: str) -> pa.Table:
    """Driver union-find over :func:`expected_minhash_pairs`'s verified
    edge set → the expected decision table (doc_id, group_id = component
    min, keep = doc_id == group_id), independent of the distributed
    min-label-propagation engine."""
    pairs = expected_minhash_pairs(documents_path)
    a = pairs["id_a"].to_numpy(zero_copy_only=False)
    b = pairs["id_b"].to_numpy(zero_copy_only=False)
    parent: dict = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    members = np.unique(np.concatenate([a, b])) if len(a) \
        else np.zeros(0, np.int64)
    groups = np.asarray([find(int(m)) for m in members], np.int64)
    return pa.table({
        "doc_id": pa.array(members, pa.int64()),
        "group_id": pa.array(groups, pa.int64()),
        "keep": pa.array(members == groups)})


def expected_groups_parquet(documents_path: str,
                            cache_dir: str = CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    key = corpus_key(documents_path)
    path = os.path.join(cache_dir, f"expected_groups_k{key}.parquet")
    if not os.path.exists(path):
        t = expected_dedup_groups(documents_path)
        t = t.append_column(
            "corpus_key", pa.array(np.full(t.num_rows, key), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


# -- embedding near-dup sidecar ----------------------------------------------

def embeddings_key(embeddings_path: str) -> int:
    """Content discriminator for an embeddings table, computable
    identically in SQL (``SELECT sum(vec_id * 1000003 + label * 7919)
    FROM embeddings``) — sf0.001 and sf0.01 share a row count."""
    t = pq.read_table(embeddings_path, columns=["vec_id", "label"])
    vi = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lb = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    return int(np.sum(vi * 1000003 + lb * 7919))


def expected_embedding_pairs(embeddings_path: str, threshold: float = 0.9,
                             n_sets: int = 2, seed: int = 42,
                             target_bucket: int = 128) -> pa.Table:
    """Brute-force spec of
    :func:`..pipelines.dedup.q_embedding_near_dups`'s contract: candidate
    pairs share a random-hyperplane bucket in ≥1 plane set (planes drawn
    from the operator's seeded RNG — the plane draw defines the
    operator); equal-raw-vector groups are star-collapsed per bucket
    (star cosine = the representative's normalized self-dot); admission
    is raw cosine ≥ ``threshold``; output cosine is np.round(·, 4)."""
    from ..state.sketches import rehash

    t = pq.read_table(embeddings_path, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    emb = t["embedding"].combine_chunks()
    n = len(ids)
    X = emb.flatten().to_numpy(zero_copy_only=False).astype(np.float64) \
        .reshape(n, -1)
    dim = X.shape[1]
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n_planes = max(12, int(np.ceil(np.log2(max(n, 1) / target_bucket + 1))))
    planes = np.random.default_rng(seed).normal(size=(n_sets, dim, n_planes))

    # raw-vector content hash (the star-collapse key), scalar fold
    Xu = np.ascontiguousarray(X).view(np.uint64)
    vhash = np.empty(n, np.int64)
    for i in range(n):
        vh = Xu[i, 0:1].copy()
        for j in range(1, dim):
            vh = rehash(vh, j) ^ Xu[i, j:j + 1]
        vhash[i] = int(vh.view(np.int64)[0])

    buckets: dict = {}
    for s in range(n_sets):
        bits = (Xn @ planes[s]) > 0
        for i in range(n):
            bucket = 0
            for j in range(n_planes):
                if bits[i, j]:
                    bucket |= 1 << j
            bkey = int(rehash(np.array([bucket], np.uint64), 5077 + s)
                       .view(np.int64)[0])
            buckets.setdefault(bkey, []).append((int(vhash[i]), int(ids[i])))
    cand = _star_collapse_pairs(buckets)

    pos_of = {int(d): i for i, d in enumerate(ids)}
    out_a, out_b, out_c = [], [], []
    for a, b in sorted(cand):
        ia, ib = pos_of[a], pos_of[b]
        cos = float(np.einsum("i,i->", Xn[ia], Xn[ib]))
        if cos >= threshold:
            out_a.append(a)
            out_b.append(b)
            out_c.append(float(np.round(cos, 4)))
    return pa.table({"id_a": pa.array(out_a, pa.int64()),
                     "id_b": pa.array(out_b, pa.int64()),
                     "cosine": pa.array(out_c, pa.float64())})


def expected_embedding_parquet(embeddings_path: str,
                               cache_dir: str = CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    key = embeddings_key(embeddings_path)
    path = os.path.join(cache_dir, f"expected_embcos_k{key}.parquet")
    if not os.path.exists(path):
        t = expected_embedding_pairs(embeddings_path)
        t = t.append_column(
            "corpus_key", pa.array(np.full(t.num_rows, key), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


# -- dangling-media sidecar ---------------------------------------------------

def expected_dangling_media(num_docs: int, seed: int = 42) -> pa.Table:
    """Ground-truth (media_ref, n) rows for the flagship corpus's
    referential check, derived from the GENERATOR's dangling decisions:
    gen.py plants ~1% of media refs under the ``s3://bucket/missing``
    stem, which :func:`..sources.gen.media_catalog` never contains, so
    the expected dangling set is exactly the spans whose ref carries
    that stem — no anti-join engine involved."""
    from .gen import generate_interleaved

    tbl = generate_interleaved(num_docs, seed)
    spans = tbl["spans"].combine_chunks()
    flat = spans.flatten()
    mr = flat.field("media_ref")
    keep = pc.and_(pc.is_valid(mr),
                   pc.starts_with(mr, pattern="s3://bucket/missing"))
    mr = mr.filter(keep)
    g = pa.table({"media_ref": mr}).group_by("media_ref") \
        .aggregate([([], "count_all")])
    return g.rename_columns(["media_ref", "n"])


def expected_dangling_parquet(num_docs: int, seed: int = 42,
                              cache_dir: str = CACHE_DIR) -> str:
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"expected_dangling_n{num_docs}_s{seed}.parquet")
    if not os.path.exists(path):
        t = expected_dangling_media(num_docs, seed)
        t = t.append_column(
            "num_docs", pa.array(np.full(t.num_rows, num_docs), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path


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
