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
