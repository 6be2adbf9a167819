"""Planted/property tests for pipelines/textsim.py (vectorized
Levenshtein pairs, Misra-Gries + recount heavy hitters) and the cosine
range search."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sjot_ray.pipelines.textsim import (HH_STATS, MAX_DIST, PREFIX,
                                        _mg_partial, _prefix_matrix,
                                        levenshtein_pairs)


def _lev_ref(a: str, b: str) -> int:
    """Scalar reference DP."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_pairs_vs_scalar_reference():
    rng = np.random.default_rng(7)
    alphabet = list("abcd ")
    strs = ["".join(rng.choice(alphabet, size=rng.integers(0, PREFIX + 1)))
            for _ in range(120)]
    a_idx = rng.integers(0, len(strs), 200)
    b_idx = rng.integers(0, len(strs), 200)
    col = pa.array(strs, pa.string())
    mat, lens = _prefix_matrix(col, PREFIX)
    got = levenshtein_pairs(mat[a_idx], lens[a_idx], mat[b_idx],
                            lens[b_idx])
    expect = [_lev_ref(strs[i], strs[j]) for i, j in zip(a_idx, b_idx)]
    assert got.tolist() == expect


def test_prefix_matrix_respects_array_offset():
    """Sliced Arrow arrays carry a nonzero offset — the raw-buffer path
    must window both offsets and values correctly."""
    col = pa.array(["zzzz", "abc", "", "de"], pa.string()).slice(1, 3)
    mat, lens = _prefix_matrix(col, 4)
    assert lens.tolist() == [3, 0, 2]
    assert mat[0, :3].tobytes() == b"abc"
    assert mat[1].tolist() == [0, 0, 0, 0]
    assert mat[2, :2].tobytes() == b"de"


def test_edit_distance_pairs_planted(ray_session, tmp_path):
    """Near-identical docs in one length block pair up with the exact
    distance; docs in different blocks never pair even if identical."""
    from sjot_ray.pipelines.textsim import q_edit_distance_pairs

    sf = tmp_path / "sf"
    sf.mkdir()
    texts = ["the quick brown fox jumps",      # ids 0,1: dist 1 prefix
             "the quick crown fox jumps",
             "the quick brown fox JUMPED OVER xx",  # other block (len)
             "completely different words here"]     # same block as 0,1
    n_chars = [25, 25, 34, 26]  # 25//4==26//4==6; 34//4==8
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(texts),
        "n_chars": pa.array(n_chars, pa.int64())}),
        sf / "documents.parquet")
    out = q_edit_distance_pairs(str(sf)).to_pylist()
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out}
    assert got.get((0, 1)) == 1
    assert (0, 2) not in got and (1, 2) not in got
    # doc 3 is in the same block but far away (> MAX_DIST) or kept —
    # verify against the scalar reference either way
    d03 = _lev_ref(texts[0][:PREFIX], texts[3][:PREFIX])
    assert ((0, 3) in got) == (d03 <= MAX_DIST)


def test_mg_partial_bound_and_sentinel():
    """The summary keeps ≤ MG_K tokens, counts are underestimates by
    ≤ d, and the sentinel row carries d."""
    from sjot_ray.pipelines.textsim import MG_K

    words = []
    for i in range(MG_K + 40):          # more distinct than MG_K
        words += [f"w{i:03d}"] * (i + 1)
    t = pa.table({"text": pa.array([" ".join(words)])})
    out = _mg_partial(t)
    sent = out.filter(pa.compute.equal(out["token"], ""))
    assert sent.num_rows == 1
    d = sent["d"][0].as_py()
    assert d > 0
    body = out.filter(pa.compute.not_equal(out["token"], ""))
    assert body.num_rows <= MG_K
    true = {f"w{i:03d}": i + 1 for i in range(MG_K + 40)}
    for r in body.to_pylist():
        assert 0 < r["cnt"] <= true[r["token"]]
        assert true[r["token"]] - r["cnt"] <= d


def test_heavy_hitters_certified_exact(ray_session, tmp_path):
    """Skewed corpus: the certificate holds and the result equals the
    brute-force census."""
    import collections

    from sjot_ray.pipelines.textsim import q_heavy_hitter_tokens

    rng = np.random.default_rng(3)
    vocab = [f"tok{i}" for i in range(200)]
    weights = 1.0 / np.arange(1, 201) ** 1.5        # zipf-ish skew
    weights /= weights.sum()
    docs = [" ".join(rng.choice(vocab, size=40, p=weights))
            for _ in range(400)]
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({"text": pa.array(docs)}),
                   sf / "documents.parquet")
    out = q_heavy_hitter_tokens(str(sf)).to_pylist()
    assert HH_STATS["certified"] is True
    census = collections.Counter(
        tok for d in docs for tok in d.split())
    expect = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["token"], r["n"]) for r in out] == expect


def test_heavy_hitters_fallback_exact(ray_session):
    """Uniform tokens defeat the certificate; the census fallback still
    returns the exact top-k."""
    import collections

    import ray.data

    from sjot_ray.pipelines.textsim import heavy_hitter_tokens

    rng = np.random.default_rng(5)
    vocab = [f"u{i:02d}" for i in range(40)]
    docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(300)]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)})) \
        .repartition(8)

    census = collections.Counter(tok for d in docs for tok in d.split())
    expect = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    def fallback():
        t = sorted(census.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        return pa.table({
            "token": pa.array([k for k, _ in t]),
            "n": pa.array([v for _, v in t], pa.int64())})

    out = heavy_hitter_tokens(ds, k=10, census_fallback=fallback)
    assert [(r["token"], r["n"]) for r in out.to_pylist()] == expect
    # with 40 near-uniform tokens and MG_K=64 candidates, every token is
    # a candidate — certification may legitimately succeed; the point of
    # this test is exactness either way, so only sanity-check the stats
    assert HH_STATS["candidates"] >= 10


def test_ann_range_search_planted(ray_session, tmp_path):
    """Known geometry: orthogonal vectors never match, near-parallel
    ones do, and the probe never reports itself."""
    from sjot_ray.pipelines.queries import q_ann_range_search

    sf = tmp_path / "sf"
    sf.mkdir()
    dim = 8
    e = np.eye(dim, dtype=np.float32)
    vecs = [e[0], e[1], e[2],          # probes 0,1,2
            (0.9 * e[0] + 0.1 * e[3]),  # near probe 0
            e[4],                       # orthogonal to everything
            (0.7 * e[1] + 0.3 * e[2])]  # near probes 1 AND 2
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32()))}),
        sf / "embeddings.parquet")
    out = q_ann_range_search(str(sf)).to_pylist()
    got = {(r["query_id"], r["neighbor_id"]): r["score_r"] for r in out}
    assert got[(0, 3)] == pytest.approx(0.9 / np.hypot(0.9, 0.1), abs=2e-5)
    assert (0, 0) not in got           # self excluded
    assert all(q != n for q, n in got)
    assert (0, 4) not in got and (1, 4) not in got
    assert (1, 5) in got and (2, 5) in got
