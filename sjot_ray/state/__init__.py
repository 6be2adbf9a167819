"""Mergeable sketch state for wide table-level checks."""

from .sketches import (
    BloomFilter,
    HyperLogLog,
    KLLSketch,
    hamming_distance64,
    hash64,
    minhash_signatures,
    rehash,
    simhash,
)

__all__ = ["BloomFilter", "HyperLogLog", "KLLSketch", "hash64", "rehash",
           "minhash_signatures", "simhash", "hamming_distance64"]
