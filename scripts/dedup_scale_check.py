"""Scale evidence for the distributed dedup verify: run MinHash+LSH →
keyed-join Jaccard over a generated 2M-doc corpus and report wall time,
verified-pair count, and driver RSS before/after/peak. The point: the
driver never materializes the corpus (round-1 version concatenated every
document's text onto the driver — OOM at scale), so driver RSS stays flat
regardless of corpus size.

Usage: python scripts/dedup_scale_check.py [--docs 2000000] [--num-cpus 16]
Writes the corpus once under /tmp and reuses it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def gen_corpus(out_dir: str, n_docs: int, shards: int = 32,
               vocab: int = 50_000, words_per_doc: int = 30,
               seed: int = 42) -> str:
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    vocab_arr = pa.array([f"w{i}" for i in range(vocab)])
    per = n_docs // shards
    rng = np.random.default_rng(seed)
    for s in range(shards):
        idx = rng.integers(0, vocab, size=(per, words_per_doc))
        # plant near-dups: the shard's last 1% copies its first 1% with
        # one word changed
        k = max(1, per // 100)
        idx[-k:] = idx[:k]
        idx[-k:, 5] = rng.integers(0, vocab, size=k)
        words = vocab_arr.take(pa.array(idx.ravel(), pa.int64()))
        offs = pa.array(np.arange(per + 1) * words_per_doc, pa.int32())
        texts = pc.binary_join(pa.ListArray.from_arrays(offs, words), " ")
        ids = pa.array(np.arange(s * per, (s + 1) * per), pa.int64())
        pq.write_table(pa.table({"doc_id": ids, "text": texts}),
                       os.path.join(out_dir, f"part-{s:04d}.parquet"),
                       row_group_size=16384)
    open(done, "w").write("ok")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2_000_000)
    ap.add_argument("--num-cpus", type=int, default=16)
    ap.add_argument("--corpus-dir", default=None)
    args = ap.parse_args()

    corpus = args.corpus_dir or f"/tmp/sjot_ray_dedup_corpus_{args.docs}"
    gen_corpus(corpus, args.docs)
    rss_gen = _rss_mb()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    import ray.data

    from sjot_ray.pipelines.dedup import distributed_jaccard, minhash_candidates

    rss_before = _rss_mb()
    t0 = time.time()
    ds = ray.data.read_parquet(corpus, columns=["doc_id", "text"])
    pairs = minhash_candidates(ds)
    verified = distributed_jaccard(pairs, ds, k=5, threshold=0.5)
    wall = time.time() - t0
    rss_after = _rss_mb()

    import resource

    print(json.dumps({
        "docs": args.docs,
        "num_cpus": args.num_cpus,
        "verified_pairs": verified.num_rows,
        "wall_sec": round(wall, 2),
        "docs_per_sec": int(args.docs / wall),
        "driver_rss_mb_before": round(rss_before, 1),
        "driver_rss_mb_after": round(rss_after, 1),
        "driver_rss_mb_peak": round(
            resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0, 1),
        "driver_rss_mb_after_gen": round(rss_gen, 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
