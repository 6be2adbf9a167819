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
