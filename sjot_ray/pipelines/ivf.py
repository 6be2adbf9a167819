"""IVF similarity index with CLUSTER-PARTITIONED parquet storage.

The r3 IVF query (queries.q_ann_ivf_topk) prunes SCORING to the probed
clusters but still scans every embedding row to discard most of them —
at 100 TB that read dominates. This module closes the loop: a one-time
index build writes the embeddings as one parquet file PER CLUSTER, and
the query path reads ONLY the probed clusters' files, so bytes read
scale with nprobe/n_clusters (measured by the manifest's file sizes;
see tests/test_ivf.py and BASELINE.md).

Build (``build_ivf_index``): train spherical k-means centroids on a
bounded sample (driver), broadcast them, assign every vector to its
centroid with one matmul per batch, co-locate clusters through the
manual hash shuffle (cluster id is the key — each cluster lands wholly
in one reduce task), and write one file per cluster plus a
``centroids.npy`` + ``manifest.parquet`` sidecar. Deployment note: the
reduce tasks write directly to the index directory — on a multi-node
cluster that directory is shared storage (S3/NFS), exactly like every
other ``write_parquet`` sink; one file per cluster keeps the layout
resumable (a re-run skips the finished index via the _DONE marker).

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
    return int(min(1024, max(8, np.sqrt(n_rows))))


def build_ivf_index(sf_dir: str, n_clusters: int | None = None,
                    seed: int = 42, out_root: str = IVF_ROOT) -> str:
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
    # centroid training on a bounded deterministic sample (driver-side;
    # the sample is small by construction, not a full materialize)
    sample = _t(ds.limit(20_000))
    Xs = _emb_matrix(sample["embedding"])
    Xs = Xs / np.maximum(np.linalg.norm(Xs, axis=1, keepdims=True), 1e-12)
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
        """One reduce task owns a set of whole clusters: write one file
        per cluster, return its manifest row."""
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
            part = g.slice(s, e - s).select(["vec_id", "embedding",
                                            "cluster"])
            path = os.path.join(cluster_dir, f"cluster-{c:05d}.parquet")
            tmp = path + ".tmp"
            pq.write_table(part, tmp)
            os.replace(tmp, path)
            out["cluster"].append(c)
            out["path"].append(path)
            out["rows"].append(part.num_rows)
            out["bytes"].append(os.path.getsize(path))
        return pa.table({k: pa.array(v) for k, v in out.items()})

    B = max(8, min(256, n_clusters // 4))
    manifest = _t(hash_shuffle_apply(assigned, "cluster", B,
                                     write_partition, empty_manifest))
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    pq.write_table(manifest, os.path.join(index_dir, "manifest.parquet"))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_clusters": n_clusters, "n_rows": n_rows,
                   "seed": seed}, f)
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
             return_stats: bool = False):
    """Cluster-partitioned IVF cosine top-k: the read itself is pruned
    to the probed clusters' files."""
    n_rows = _parquet_rows(sf_dir, "embeddings")
    if n_clusters is None:
        n_clusters = default_n_clusters(n_rows)
    if nprobe is None:
        nprobe = max(2, n_clusters // 4)
    nprobe = min(nprobe, n_clusters)
    index_dir = build_ivf_index(sf_dir, n_clusters)

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
