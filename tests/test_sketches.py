"""Unit tests for the mergeable sketch primitives (deterministic seeds)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sjot_ray.state.sketches import (
    BloomFilter,
    HyperLogLog,
    KLLSketch,
    hamming_distance64,
    hash64,
    minhash_signatures,
    simhash,
)


def keys(prefix, n, start=0):
    return hash64(pa.array([f"{prefix}{i}" for i in range(start, start + n)]))


def test_hll_accuracy_and_merge():
    a = HyperLogLog(14)
    a.add_hashes(keys("k", 100_000))
    b = HyperLogLog(14)
    b.add_hashes(keys("k", 100_000, start=50_000))
    a.merge(b)
    true = 150_000
    assert abs(a.estimate() - true) / true < 0.03


def test_hll_serialize_roundtrip():
    a = HyperLogLog(12)
    a.add_hashes(keys("x", 5000))
    b = HyperLogLog.deserialize(a.serialize(), 12)
    assert b.estimate() == a.estimate()


def test_bloom_no_false_negatives_and_low_fp():
    b = BloomFilter(50_000, fpp=0.01)
    members = keys("m", 50_000)
    b.add_hashes(members)
    assert b.contains_hashes(members).all()
    probes = keys("nonmember", 20_000)
    fp = b.contains_hashes(probes).mean()
    assert fp < 0.03


def test_bloom_merge():
    a = BloomFilter(10_000, 0.01)
    b = BloomFilter(10_000, 0.01)
    a.add_hashes(keys("a", 5000))
    b.add_hashes(keys("b", 5000))
    a.merge(b)
    assert a.contains_hashes(keys("a", 5000)).all()
    assert a.contains_hashes(keys("b", 5000)).all()


def test_kll_quantiles_and_merge():
    rng = np.random.default_rng(7)
    a = KLLSketch(200)
    for _ in range(10):
        a.add_values(rng.normal(0, 1, 100_000))
    b = KLLSketch(200)
    b.add_values(rng.normal(0, 1, 200_000))
    a.merge(b)
    q = a.quantiles([0.25, 0.5, 0.75])
    assert abs(q[0] + 0.674) < 0.05
    assert abs(q[1]) < 0.05
    assert abs(q[2] - 0.674) < 0.05
    assert a.n == 1_200_000


def test_minhash_jaccard_estimate():
    sa = hash64(np.asarray([f"s{i}" for i in range(100)], object))
    sb = hash64(np.asarray([f"s{i}" for i in range(50, 150)], object))
    flat = np.concatenate([sa, sb])
    sig = minhash_signatures(flat, np.array([0, 100, 200]), num_perm=256)
    est = (sig[0] == sig[1]).mean()
    true_j = 50 / 150
    assert abs(est - true_j) < 0.08


def test_simhash_similarity_ordering():
    t_base = [f"w{i}" for i in range(60)]
    t_close = t_base[:-2] + ["x1", "x2"]
    t_far = [f"z{i}" for i in range(60)]
    hs = [hash64(np.asarray(t, object)) for t in (t_base, t_close, t_far)]
    flat = np.concatenate(hs)
    offs = np.array([0, 60, 120, 180])
    fp = simhash(flat, offs)
    d_close = hamming_distance64(fp[:1], fp[1:2])[0]
    d_far = hamming_distance64(fp[:1], fp[2:3])[0]
    assert d_close < d_far


def test_tdigest_accuracy_and_merge():
    from sjot_ray.state.sketches import TDigest

    rng = np.random.default_rng(5)
    x = rng.normal(10, 3, 200_000)
    # single digest
    td = TDigest(300)
    for chunk in np.array_split(x, 20):
        td.add_values(chunk)
    qs = [0.001, 0.01, 0.25, 0.5, 0.75, 0.99, 0.999]
    est = td.quantiles(qs)
    true = np.quantile(x, qs)
    spread = x.max() - x.min()
    # cluster width near q is ~(2π/δ)√(q(1−q)) of the mass, so 1% of
    # the value spread comfortably bounds the interpolation error
    for q, e, t in zip(qs, est, true):
        assert abs(e - t) < 0.01 * spread, (q, e, t)
    # sharded merge ≈ single digest
    shards = []
    for chunk in np.array_split(x, 8):
        s = TDigest(300)
        s.add_values(chunk)
        shards.append(s)
    merged = shards[0]
    for s in shards[1:]:
        merged.merge(s)
    est_m = merged.quantiles(qs)
    for q, a, b in zip(qs, est, est_m):
        assert abs(a - b) < 0.02 * spread, (q, a, b)
    assert merged.n == len(x)


def test_tdigest_bounded_centroids():
    from sjot_ray.state.sketches import TDigest

    td = TDigest(100)
    rng = np.random.default_rng(0)
    for _ in range(50):
        td.add_values(rng.uniform(0, 1, 10_000))
    assert len(td.means) < 400  # ~2·delta bound for the merging variant
