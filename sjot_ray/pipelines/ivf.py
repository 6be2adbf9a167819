"""IVF similarity index with CLUSTER-PARTITIONED parquet storage.

The r3 IVF query (queries.q_ann_ivf_topk) prunes SCORING to the probed
clusters but still scans every embedding row to discard most of them —
at 100 TB that read dominates. This module closes the loop: a one-time
index build writes the embeddings CLUSTER-PARTITIONED (⌈rows /
``ROWS_PER_FILE``⌉ parquet files per cluster, so a hot cluster spans
files instead of outgrowing one task), and the query path reads ONLY
the probed clusters' files, so bytes read scale with nprobe/n_clusters
(measured by the manifest's file sizes; see tests/test_ivf.py and
BASELINE.md).

Build (``build_ivf_index``): train spherical k-means centroids on a
deterministic distributed sample (mini-batch k-means past the
full-Lloyd flop budget), broadcast them, assign every vector to its
centroid with one matmul per batch, co-locate clusters through the
manual hash shuffle (cluster id is the key — each cluster lands wholly
in one reduce task), and write the per-cluster files plus a
``centroids.npy`` + ``manifest.parquet`` sidecar. Deployment note: the
reduce tasks write directly to the index directory — on a multi-node
cluster that directory is shared storage (S3/NFS), exactly like every
other ``write_parquet`` sink; the file-per-(cluster, chunk) layout
keeps the build resumable (a re-run skips the finished index via the
_DONE marker).

Query (``ivf_topk``): nearest-``nprobe`` centroids per query → the
probed clusters' files via the manifest → ``ray.data.read_parquet`` on
ONLY those paths → per-batch matmul scoring with per-query cluster
masks → driver-side merge of the tiny per-block top-k partials.

Full probe (``nprobe == n_clusters``) reads everything and reproduces
the exact brute-force baseline bit-for-bit (tested).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from .queries import _emb_matrix, _kmeans_cosine, _parquet_rows, _read, _t

IVF_ROOT = "/tmp/sjot_ray_ivf"


def _index_key(sf_dir: str, n_clusters: int, seed: int) -> str:
    md = pq.read_metadata(f"{sf_dir}/embeddings.parquet")
    base = os.path.basename(os.path.normpath(sf_dir))
    return f"{base}_n{md.num_rows}_c{n_clusters}_s{seed}"


def default_n_clusters(n_rows: int) -> int:
    """√n clustering (the IVF rule of thumb: probe cost ≈ index-scan
    cost at √n). Capped at 65,536 — at 10^10+ vectors the per-cluster
    file count, not the cluster count, is the scaling axis (clusters
    span multiple files, see ``rows_per_file``), and a larger manifest
    buys nothing."""
    return int(min(65_536, max(8, np.sqrt(n_rows))))


#: Max rows per cluster parquet file: a hot cluster larger than this is
#: written as MULTIPLE files (cluster-00042-00.parquet, -01, …), so one
#: file never exceeds a read task's comfortable memory and a skewed
#: cluster still parallelizes at query time.
ROWS_PER_FILE = 262_144


def _sample_for_training(ds, n_rows: int, n_clusters: int,
                         seed: int) -> np.ndarray:
    """Deterministic DISTRIBUTED training sample: every block keeps rows
    with ``hash64(vec_id ^ seed-salt) % stride == 0`` (uniform over the
    whole table, unlike ``limit()`` which reads only the first blocks —
    at 10^9+ rows a head sample under-fits the tail's distribution).
    The driver only ever receives the ~target-sized sample."""
    from ..state.sketches import rehash

    target = int(min(200_000, max(20_000, 30 * n_clusters)))
    stride = max(1, n_rows // target)

    def keep(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = (rehash(ids.view(np.uint64), seed + 77)
             % np.uint64(stride)) == 0
        return t.filter(pa.array(m)).select(["embedding"])

    sample = _t(ds.map_batches(keep, batch_format="pyarrow",
                               zero_copy_batch=True))
    Xs = _emb_matrix(sample["embedding"])
    return Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)


def _kmeans_minibatch(X: np.ndarray, n_clusters: int, seed: int = 42,
                      batch: int = 8192, steps: int = 60,
                      reseed_every: int = 20) -> np.ndarray:
    """Seeded spherical MINI-BATCH k-means (Sculley 2010, normalized to
    the sphere after each step) for the regime where full Lloyd's
    sample×clusters×dim flops per iteration stop being driver-feasible
    (≥ ~2×10^8 sample-cluster products). Deterministic.

    Random init can seed two centroids inside one cluster and leave
    another cluster uncovered (the uncovered cluster then drags a
    neighbor centroid to a bad midpoint that mini-batch's shrinking
    learning rate never splits). Every ``reseed_every`` steps a
    NEAR-DUPLICATE centroid (cosine > 0.9 to a lower-index one) is
    reseeded to the worst-covered batch point of the worst-covered
    centroid. The duplicate scan is exact O(k²·dim) and only runs while
    that stays ≤ ~2×10^9 flops (k ≲ 4000 at dim 128); at larger k random
    init's per-centroid collision odds are proportionally lower and IVF
    recall tolerates residual imbalance — documented trade, not a
    silent one."""
    rng = np.random.default_rng(seed)
    n = len(X)
    C = X[rng.choice(n, size=min(n_clusters, n), replace=False)].copy()
    if len(C) < n_clusters:
        C = np.vstack([C, rng.normal(size=(n_clusters - len(C),
                                           X.shape[1]))])
    C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    counts = np.zeros(n_clusters, np.int64)
    scan_dups = n_clusters * n_clusters * X.shape[1] <= 2 * 10**9
    for step in range(steps):
        idx = rng.integers(0, n, size=min(batch, n))
        Xb = X[idx]
        sim = Xb @ C.T
        assign = np.argmax(sim, axis=1)
        best = sim[np.arange(len(Xb)), assign]
        np.add.at(counts, assign, 1)
        lr = 1.0 / np.maximum(counts[assign], 1)
        # per-sample convex pull of the assigned centroid toward the point
        np.add.at(C, assign, lr[:, None] * (Xb - C[assign]))
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        if scan_dups and (step + 1) % reseed_every == 0 \
                and step + 1 < steps:
            S = C @ C.T
            dup = np.triu(S, k=1).max(axis=0)  # vs lower-index centroids
            spare = int(np.argmax(dup))
            if dup[spare] > 0.9:
                # worst-covered centroid's farthest batch member
                msum = np.bincount(assign, weights=best,
                                   minlength=n_clusters)
                mcnt = np.bincount(assign, minlength=n_clusters)
                present = mcnt > 0
                mean_sim = np.where(present, msum / np.maximum(mcnt, 1),
                                    np.inf)
                w = int(np.argmin(mean_sim))
                members = np.nonzero(assign == w)[0]
                p = members[np.argmin(best[members])]
                C[spare] = Xb[p]
                counts[spare] = 1
                C[spare] /= max(np.linalg.norm(C[spare]), 1e-12)
    return C


def build_ivf_index(sf_dir: str, n_clusters: int | None = None,
                    seed: int = 42, out_root: str = IVF_ROOT,
                    rows_per_file: int = ROWS_PER_FILE) -> str:
    """Build (once) the cluster-partitioned index for an sf dir's
    embeddings table; returns the index directory."""
    from .shuffle import hash_shuffle_apply

    n_rows = _parquet_rows(sf_dir, "embeddings")
    if n_clusters is None:
        n_clusters = default_n_clusters(n_rows)
    key = _index_key(sf_dir, n_clusters, seed)
    index_dir = os.path.join(out_root, key)
    done = os.path.join(index_dir, "_DONE")
    if os.path.exists(done):
        return index_dir
    os.makedirs(os.path.join(index_dir, "clusters"), exist_ok=True)

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    # centroid training on a deterministic DISTRIBUTED sample (uniform
    # over all blocks — ``limit()`` would head-sample and under-fit the
    # tail); mini-batch k-means past the full-Lloyd flop budget
    Xs = _sample_for_training(ds, n_rows, n_clusters, seed)
    if len(Xs) * n_clusters > 2 * 10**8:
        C = _kmeans_minibatch(Xs, n_clusters, seed=seed)
    else:
        C = _kmeans_cosine(Xs, n_clusters, seed=seed)
    c_ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        Cw = ray.get(c_ref)
        X = _emb_matrix(t["embedding"])
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-12)
        cl = np.argmax(Xn @ Cw.T, axis=1).astype(np.int64)
        return pa.table({"cluster": pa.array(cl),
                         "vec_id": t["vec_id"],
                         "embedding": t["embedding"]})

    assigned = ds.map_batches(assign, batch_format="pyarrow",
                              zero_copy_batch=True)

    cluster_dir = os.path.join(index_dir, "clusters")
    empty_manifest = pa.table({
        "cluster": pa.array([], pa.int64()),
        "path": pa.array([], pa.string()),
        "rows": pa.array([], pa.int64()),
        "bytes": pa.array([], pa.int64()),
    })

    def write_partition(g: pa.Table) -> pa.Table:
        """One reduce task owns a set of whole clusters: write each
        cluster as ⌈rows/rows_per_file⌉ files (a HOT cluster spans
        multiple files so no single file outgrows a read task's memory
        and a skewed cluster still parallelizes at query time), return
        one manifest row per file."""
        if g.num_rows == 0:
            return empty_manifest
        idx = pc.sort_indices(g, sort_keys=[("cluster", "ascending"),
                                            ("vec_id", "ascending")])
        g = g.take(idx)
        cl = g["cluster"].to_numpy(zero_copy_only=False)
        new = np.ones(len(cl), dtype=bool)
        new[1:] = cl[1:] != cl[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(cl))
        out = {"cluster": [], "path": [], "rows": [], "bytes": []}
        for s, e in zip(starts, ends):
            c = int(cl[s])
            for j, fs in enumerate(range(int(s), int(e), rows_per_file)):
                n = min(rows_per_file, int(e) - fs)
                part = g.slice(fs, n).select(["vec_id", "embedding",
                                              "cluster"])
                path = os.path.join(cluster_dir,
                                    f"cluster-{c:05d}-{j:03d}.parquet")
                tmp = path + ".tmp"
                pq.write_table(part, tmp)
                os.replace(tmp, path)
                out["cluster"].append(c)
                out["path"].append(path)
                out["rows"].append(part.num_rows)
                out["bytes"].append(os.path.getsize(path))
        return pa.table({k: pa.array(v) for k, v in out.items()})

    B = max(8, min(4096, n_clusters // 4))
    manifest = _t(hash_shuffle_apply(assigned, "cluster", B,
                                     write_partition, empty_manifest))
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    pq.write_table(manifest, os.path.join(index_dir, "manifest.parquet"))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_clusters": n_clusters, "n_rows": n_rows,
                   "seed": seed, "rows_per_file": rows_per_file}, f)
    with open(done, "w") as f:
        f.write("ok")
    return index_dir


def probed_paths(index_dir: str, Qn: np.ndarray, nprobe: int):
    """Per-query probe lists + the union's file paths and byte count."""
    C = np.load(os.path.join(index_dir, "centroids.npy"))
    manifest = pq.read_table(os.path.join(index_dir, "manifest.parquet"))
    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]
    union = np.unique(probe)
    m_cl = manifest["cluster"].to_numpy(zero_copy_only=False)
    sel = np.isin(m_cl, union)
    paths = [p for p, s in zip(manifest["path"].to_pylist(), sel) if s]
    bytes_read = int(manifest["bytes"].to_numpy(
        zero_copy_only=False)[sel].sum())
    total_bytes = int(manifest["bytes"].to_numpy(
        zero_copy_only=False).sum())
    return probe, paths, bytes_read, total_bytes


def ivf_topk(sf_dir: str, n_queries: int = 5, k: int = 10,
             n_clusters: int | None = None, nprobe: int | None = None,
             return_stats: bool = False, out_root: str = IVF_ROOT,
             rows_per_file: int = ROWS_PER_FILE):
    """Cluster-partitioned IVF cosine top-k: the read itself is pruned
    to the probed clusters' files."""
    n_rows = _parquet_rows(sf_dir, "embeddings")
    if n_clusters is None:
        n_clusters = default_n_clusters(n_rows)
    if nprobe is None:
        nprobe = max(2, n_clusters // 4)
    nprobe = min(nprobe, n_clusters)
    index_dir = build_ivf_index(sf_dir, n_clusters, out_root=out_root,
                                rows_per_file=rows_per_file)

    qt = _t(_read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
            .filter(expr=f"vec_id < {int(n_queries)}"))
    q_ids = qt["vec_id"].to_numpy(zero_copy_only=False)
    Q = _emb_matrix(qt["embedding"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    probe, paths, bytes_read, total_bytes = probed_paths(
        index_dir, Qn, nprobe)
    stats = {"bytes_read": bytes_read, "total_bytes": total_bytes,
             "files_read": len(paths), "nprobe": nprobe,
             "n_clusters": n_clusters}

    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "neighbor_id": pa.array([], pa.int64()),
                      "rank": pa.array([], pa.int64())})
    if not paths:
        return (empty, stats) if return_stats else empty
    state_ref = ray.put((q_ids, Qn, probe))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids_w, Qn_w, probe_w = ray.get(state_ref)
        X = _emb_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True),
                            1e-12)
        S = Qn_w @ Xn.T
        out_q, out_n, out_s = [], [], []
        for qi in range(S.shape[0]):
            in_probe = np.isin(cl, probe_w[qi]) & (ids != q_ids_w[qi])
            s = S[qi][in_probe]
            nb = ids[in_probe]
            top = np.argsort(-s, kind="stable")[:k]
            out_q.extend([int(q_ids_w[qi])] * len(top))
            out_n.extend(nb[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "neighbor_id": pa.array(out_n, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})

    nb = max(1, min(64, len(paths)))
    ds = ray.data.read_parquet(paths, override_num_blocks=nb)
    parts = _t(ds.map_batches(partial_topk, batch_format="pyarrow",
                              zero_copy_batch=True))
    pdf = parts.to_pandas()
    if len(pdf) == 0:
        return (empty, stats) if return_stats else empty
    pdf["score_r"] = pdf["score"].round(5)
    pdf = pdf.sort_values(["query_id", "score_r", "neighbor_id"],
                          ascending=[True, False, True])
    pdf = pdf.groupby("query_id").head(k)
    pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
    out = pa.Table.from_pandas(
        pdf[["query_id", "neighbor_id", "rank"]].reset_index(drop=True))
    return (out, stats) if return_stats else out


def q_ann_ivf_partitioned(sf_dir: str):
    """queries() entry: IVF top-k over cluster-partitioned storage (the
    read prunes to probed clusters). Rows-only oracle (approximate by
    design; full probe ≡ exact baseline is the correctness evidence,
    tests/test_ivf.py)."""
    return ivf_topk(sf_dir)


def q_ann_ivf_fullprobe(sf_dir: str):
    """queries() entry: the SAME cluster-partitioned index queried at
    nprobe = n_clusters — reads every partition file and must reproduce
    the exact brute-force ranking, so it carries a HARD hash oracle (the
    ann_cosine_topk SQL): the full-probe ≡ exact property the unit tests
    assert, enforced by the driver gate on the real corpus too."""
    n_clusters = default_n_clusters(_parquet_rows(sf_dir, "embeddings"))
    return ivf_topk(sf_dir, n_clusters=n_clusters, nprobe=n_clusters)
