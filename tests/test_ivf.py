"""Cluster-partitioned IVF index (sjot_ray/pipelines/ivf.py): build
layout, read pruning (bytes read scale with nprobe), and full-probe
equivalence with the exact brute-force baseline."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(ray_session, tmp_path_factory):
    from sjot_ray.pipelines.ivf import build_ivf_index

    root = str(tmp_path_factory.mktemp("ivf"))
    return build_ivf_index(SF, n_clusters=16, out_root=root), root


def test_index_layout(index_dir):
    idx, _root = index_dir
    files = sorted(glob.glob(os.path.join(idx, "clusters", "*.parquet")))
    assert files, "no cluster files written"
    manifest = pq.read_table(os.path.join(idx, "manifest.parquet"))
    assert set(manifest["path"].to_pylist()) == set(files)
    # every row landed in exactly one cluster file; each file holds one
    # cluster only
    total = 0
    for f in files:
        t = pq.read_table(f)
        assert len(set(t["cluster"].to_pylist())) == 1
        total += t.num_rows
    n_rows = pq.read_metadata(f"{SF}/embeddings.parquet").num_rows
    assert total == n_rows
    assert os.path.exists(os.path.join(idx, "centroids.npy"))


def test_read_pruning_scales_with_nprobe(ray_session, index_dir):
    """The probed-path byte count must shrink with nprobe — the measured
    fact behind 'prunes the read'."""
    from sjot_ray.pipelines.ivf import probed_paths
    from sjot_ray.pipelines.queries import _emb_matrix, _t, _read

    idx, _root = index_dir
    qt = _t(_read(SF, "embeddings", columns=["vec_id", "embedding"])
            .filter(expr="vec_id < 5"))
    Q = _emb_matrix(qt["embedding"])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    _, paths2, bytes2, total = probed_paths(idx, Qn, nprobe=2)
    _, paths_all, bytes_all, _ = probed_paths(idx, Qn, nprobe=16)
    assert bytes_all == total           # full probe reads everything
    assert bytes2 < bytes_all           # pruned probe reads strictly less
    assert len(paths2) < len(paths_all)


def test_full_probe_equals_exact_baseline(ray_session, index_dir):
    from sjot_ray.pipelines.ivf import ivf_topk
    from sjot_ray.pipelines.queries import q_ann_cosine_topk

    _idx, root = index_dir
    got = ivf_topk(SF, n_clusters=16, nprobe=16)
    exact = q_ann_cosine_topk(SF)
    assert got.to_pydict() == exact.to_pydict()


def test_partitioned_query_entry_runs(ray_session):
    from sjot_ray.pipelines.ivf import q_ann_ivf_partitioned

    out = q_ann_ivf_partitioned(SF)
    assert out.num_rows > 0
    assert out.column_names == ["query_id", "neighbor_id", "rank"]


def test_build_is_idempotent(ray_session, index_dir):
    from sjot_ray.pipelines.ivf import build_ivf_index

    idx, root = index_dir
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(os.path.join(idx, "clusters", "*"))}
    idx2 = build_ivf_index(SF, n_clusters=16, out_root=root)
    assert idx2 == idx
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m  # nothing rewritten


def test_hot_cluster_spans_multiple_files(ray_session, tmp_path):
    """A cluster larger than rows_per_file is written as MULTIPLE files
    (r4 VERDICT "what's wrong" #3): the manifest lists every chunk, the
    probed read still prunes, and full probe still equals the exact
    brute-force baseline bit-for-bit."""
    from sjot_ray.pipelines.ivf import build_ivf_index, ivf_topk
    from sjot_ray.pipelines.queries import q_ann_cosine_topk

    rng = np.random.default_rng(3)
    dim, n_hot, n_bg = 16, 1500, 1500
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    hot = base[None, :] + 0.05 * rng.normal(size=(n_hot, dim))
    bg = rng.normal(size=(n_bg, dim))
    X = np.concatenate([hot, bg]).astype(np.float32)
    order = rng.permutation(len(X))
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(X[order].ravel(), pa.float32()), dim).cast(
        pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(np.arange(len(X)), pa.int64()),
                  "embedding": emb})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "embeddings.parquet")

    root = str(tmp_path / "idx")
    idx = build_ivf_index(str(sf), n_clusters=8, out_root=root,
                          rows_per_file=400)
    manifest = pq.read_table(os.path.join(idx, "manifest.parquet"))
    per_cluster = {}
    for c, r in zip(manifest["cluster"].to_pylist(),
                    manifest["rows"].to_pylist()):
        per_cluster.setdefault(c, []).append(r)
    assert sum(sum(v) for v in per_cluster.values()) == len(X)
    assert max(r for v in per_cluster.values() for r in v) <= 400
    assert any(len(v) >= 3 for v in per_cluster.values()), \
        "the planted hot cluster should span >= 3 chunk files"

    got = ivf_topk(str(sf), n_clusters=8, nprobe=8, out_root=root,
                   rows_per_file=400)
    exact = q_ann_cosine_topk(str(sf))
    assert got.to_pydict() == exact.to_pydict()

    # pruned probe reads strictly fewer bytes than the full index
    _, stats = ivf_topk(str(sf), n_clusters=8, nprobe=1, out_root=root,
                        rows_per_file=400, return_stats=True)
    assert 0 < stats["bytes_read"] < stats["total_bytes"]


def test_default_n_clusters_scales_past_1024():
    from sjot_ray.pipelines.ivf import default_n_clusters

    assert default_n_clusters(10**9) == 31622      # ~sqrt(n), not 1024
    assert default_n_clusters(10**12) == 65536     # manifest-sanity cap
    assert default_n_clusters(500) == 22


def test_minibatch_kmeans_recovers_planted_centroids():
    """Mini-batch spherical k-means (the large-sample training path)
    lands centroids near planted directions: every planted direction has
    a centroid at cosine > 0.95."""
    from sjot_ray.pipelines.ivf import _kmeans_minibatch

    rng = np.random.default_rng(5)
    dim, k = 12, 4
    D = rng.normal(size=(k, dim))
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    X = np.repeat(D, 500, axis=0) + 0.05 * rng.normal(size=(k * 500, dim))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    X = X[rng.permutation(len(X))]
    C = _kmeans_minibatch(X, k, seed=1, steps=120)
    sim = D @ C.T
    assert (sim.max(axis=1) > 0.95).all()
