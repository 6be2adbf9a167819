"""Mergeable sketches for the wide, table-level checks (north rule):
HyperLogLog (uniqueness), Bloom filter (referential semi-joins), a KLL-style
quantile sketch (distribution drift), MinHash (near-dup signatures) and
SimHash (fingerprints).

All sketches are (a) buildable per Arrow batch with vectorized numpy over
64-bit hashes, (b) cheaply serializable (plain ndarrays) and (c) mergeable
— so each Ray task emits one partial per batch and a tiny reduce merges
them, instead of shuffling raw rows (SURVEY.md §2.6 "aggregations").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash64(arr) -> np.ndarray:
    """Vectorized 64-bit hash of a string/binary/numeric Arrow array or
    ndarray (splitmix64 over a cheap content hash).

    For string columns we avoid per-row Python by hashing with pyarrow's
    cast to binary + a polynomial rolling hash over fixed-width chunks is
    overkill here — we use numpy's void-view trick on the raw buffers via
    pandas' util.hash_array when available, else a python fallback.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, (pa.Array,)):
        if pa.types.is_integer(arr.type) or pa.types.is_floating(arr.type):
            x = arr.to_numpy(zero_copy_only=False)
            x = np.nan_to_num(x).astype(np.float64).view(np.uint64)
            return _splitmix64(x)
        # strings: pandas hash_array is vectorized C
        import pandas as pd

        vals = arr.to_pandas()
        h = pd.util.hash_array(vals.to_numpy(dtype=object), hash_key="sjot_ray01234567")
        return h.astype(np.uint64)
    x = np.asarray(arr)
    if x.dtype == object or x.dtype.kind in "US":
        import pandas as pd

        return pd.util.hash_array(x.astype(object),
                                  hash_key="sjot_ray01234567").astype(np.uint64)
    return _splitmix64(x.astype(np.uint64))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK64
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK64
    return z ^ (z >> np.uint64(31))


def rehash(h: np.ndarray, salt: int) -> np.ndarray:
    return _splitmix64(h ^ np.uint64(salt * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))


# --------------------------------------------------------------------------
class HyperLogLog:
    """Standard HLL with 2^p registers; add() is vectorized over a hash
    ndarray; merge = register-wise max."""

    def __init__(self, p: int = 14):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray):
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) & _MASK64
        # rank = leading zeros of rest + 1 (capped)
        with np.errstate(divide="ignore"):
            nz = 64 - self.p
            lz = np.full(len(h), nz, dtype=np.int64)
            nonzero = rest != 0
            # floor(log2) via float conversion is exact for < 2^53; use
            # bit-length trick through float64 on the high 53 bits instead
            r = rest[nonzero]
            fl = np.floor(np.log2(r.astype(np.float64))).astype(np.int64)
            lz[nonzero] = 63 - fl
        rank = np.minimum(lz + 1, nz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    def serialize(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def deserialize(cls, b: bytes, p: int = 14) -> "HyperLogLog":
        h = cls(p)
        h.registers = np.frombuffer(b, dtype=np.uint8).copy()
        return h


# --------------------------------------------------------------------------
class BloomFilter:
    """Bit-array Bloom filter, k derived from target fpp; vectorized add
    and contains over hash ndarrays; merge = OR."""

    def __init__(self, capacity: int, fpp: float = 0.01):
        n_bits = max(64, int(-capacity * np.log(fpp) / (np.log(2) ** 2)))
        self.n_bits = 1 << int(np.ceil(np.log2(n_bits)))
        self.k = max(1, int(round(self.n_bits / max(1, capacity) * np.log(2))))
        self.k = min(self.k, 8)
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)

    def _positions(self, h: np.ndarray) -> np.ndarray:
        pos = np.empty((self.k, len(h)), dtype=np.uint64)
        h1 = h
        h2 = rehash(h, 1)
        for i in range(self.k):
            pos[i] = (h1 + np.uint64(i) * h2) & np.uint64(self.n_bits - 1)
        return pos

    def add_hashes(self, h: np.ndarray):
        pos = self._positions(h).ravel()
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        np.bitwise_or.at(self.bits, word.astype(np.int64),
                         np.uint64(1) << bit)

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        pos = self._positions(h)
        word, bit = pos >> np.uint64(6), pos & np.uint64(63)
        hits = (self.bits[word.astype(np.int64)]
                >> bit) & np.uint64(1)
        return hits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


# --------------------------------------------------------------------------
class KLLSketch:
    """Quantile sketch in the KLL style (compaction ladder of levels with
    doubling weights; see Karnin-Lang-Liberty and the KLL± follow-up in
    PAPERS.md). Approximate, mergeable, bounded memory."""

    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._rng = np.random.default_rng(42)

    def add_values(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return
        self.n += len(x)
        self.levels[0] = np.concatenate([self.levels[0], x])
        self._compact()

    def _capacity(self, level: int) -> int:
        # geometric decay of per-level capacity, floor 8
        c = int(self.k * (2 / 3) ** (len(self.levels) - 1 - level))
        return max(8, c)

    def _compact(self):
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._capacity(i):
                lv = np.sort(self.levels[i])
                off = int(self._rng.integers(0, 2))
                promoted = lv[off::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[i + 1] = np.concatenate(
                    [self.levels[i + 1], promoted])
            i += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._compact()
        return self

    def quantiles(self, qs) -> np.ndarray:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 1 << i, dtype=np.float64))
        if not items:
            return np.full(len(qs), np.nan)
        it = np.concatenate(items)
        w = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        it, w = it[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        out = np.empty(len(qs))
        for j, q in enumerate(qs):
            target = q * total
            k = int(np.searchsorted(cw, target, side="left"))
            out[j] = it[min(k, len(it) - 1)]
        return out


# --------------------------------------------------------------------------
class TDigest:
    """Merging t-digest (Dunning & Ertl): centroids sized by the scale
    function k(q) = δ/(2π)·asin(2q−1), which keeps clusters tiny near the
    tails and coarse in the middle — strong tail-quantile accuracy with
    bounded memory. Mergeable: per-batch partials merge by concatenating
    centroid lists and re-running the one-pass merge. Raw batches are
    pre-compressed vectorized (sorted + quantile-sliced) so only ~4δ
    centroids ever enter the Python merge loop."""

    def __init__(self, delta: int = 100):
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.vmin = np.inf
        self.vmax = -np.inf

    def _k(self, q):
        return self.delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress_batch(self, x: np.ndarray):
        """Sorted batch → ≤ ~4δ (mean, weight) clusters, vectorized."""
        n = len(x)
        ks = np.linspace(self._k(0.0), self._k(1.0), int(4 * self.delta) + 1)
        qs = (np.sin(ks * 2 * np.pi / self.delta) + 1) / 2
        cuts = np.unique(np.clip((qs * n).astype(np.int64), 0, n))
        cuts = cuts[(cuts > 0) & (cuts < n)]
        starts = np.concatenate([[0], cuts])
        sums = np.add.reduceat(x, starts)
        counts = np.diff(np.concatenate([starts, [n]]))
        return sums / counts, counts.astype(np.float64)

    def _merge_centroids(self, m: np.ndarray, w: np.ndarray):
        order = np.argsort(m, kind="stable")
        m, w = m[order], w[order]
        total = w.sum()
        out_m, out_w = [], []
        q0 = 0.0
        cur_m, cur_w = m[0], w[0]
        for i in range(1, len(m)):
            q = q0 + (cur_w + w[i]) / total
            if self._k(q) - self._k(q0) <= 1.0:
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                q0 += cur_w / total
                cur_m, cur_w = m[i], w[i]
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    def add_values(self, x: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        x = np.sort(x[~np.isnan(x)])
        if len(x) == 0:
            return
        self.n += len(x)
        self.vmin = min(self.vmin, float(x[0]))
        self.vmax = max(self.vmax, float(x[-1]))
        bm, bw = self._compress_batch(x)
        self._merge_centroids(np.concatenate([self.means, bm]),
                              np.concatenate([self.weights, bw]))

    def merge(self, other: "TDigest") -> "TDigest":
        if other.n == 0:
            return self
        self.n += other.n
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self._merge_centroids(np.concatenate([self.means, other.means]),
                              np.concatenate([self.weights, other.weights]))
        return self

    def quantiles(self, qs) -> np.ndarray:
        if self.n == 0:
            return np.full(len(qs), np.nan)
        total = self.weights.sum()
        cw = np.cumsum(self.weights) - self.weights / 2
        xp = np.concatenate([[0.0], cw, [total]])
        fp = np.concatenate([[self.vmin], self.means, [self.vmax]])
        return np.interp(np.asarray(qs, dtype=np.float64) * total, xp, fp)


def minhash_signatures(shingle_hashes: np.ndarray, row_offsets: np.ndarray,
                       num_perm: int = 64, seed: int = 42) -> np.ndarray:
    """MinHash signatures per row from flattened shingle hashes.

    ``shingle_hashes``: uint64 ndarray of all rows' shingle hashes,
    concatenated; ``row_offsets``: int64 (n+1) prefix offsets into it.
    Returns (n, num_perm) uint64. Vectorized: one pass per permutation
    using np.minimum.reduceat.
    """
    n = len(row_offsets) - 1
    sig = np.full((n, num_perm), _MASK64, dtype=np.uint64)
    if len(shingle_hashes) == 0:
        return sig
    nonempty = np.diff(row_offsets) > 0
    starts = row_offsets[:-1][nonempty]
    for p in range(num_perm):
        hp = rehash(shingle_hashes, seed + p)
        mins = np.minimum.reduceat(hp, starts)
        sig[nonempty, p] = mins
    return sig


def simhash(token_hashes: np.ndarray, row_offsets: np.ndarray,
            bits: int = 64) -> np.ndarray:
    """SimHash fingerprint per row: sign-sum of token-hash bits."""
    n = len(row_offsets) - 1
    out = np.zeros(n, dtype=np.uint64)
    if len(token_hashes) == 0:
        return out
    bitcols = ((token_hashes[:, None] >> np.arange(bits, dtype=np.uint64))
               & np.uint64(1)).astype(np.int32) * 2 - 1
    nonempty = np.diff(row_offsets) > 0
    starts = row_offsets[:-1][nonempty]
    sums = np.add.reduceat(bitcols, starts, axis=0)
    fp = (sums > 0).astype(np.uint64)
    vals = np.zeros(int(nonempty.sum()), dtype=np.uint64)
    for b in range(bits):
        vals |= fp[:, b] << np.uint64(b)
    out[nonempty] = vals
    return out


def hamming_distance64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = a ^ b
    # popcount via bit tricks (no np.bit_count before numpy 2)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)
