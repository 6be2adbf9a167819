"""Scale evidence for the round-5 text operators: run doc_repetition,
dup_ngram_frac, distinctive_terms and histogram_doc_length over a
generated large corpus and report per-op wall time plus driver RSS
before/after. The point: each op's driver footprint is independent of
corpus size (per-doc metrics stream, gram postings shuffle instead of
collecting, the DF broadcast is vocab-sized not corpus-sized), so
driver RSS stays flat as docs scale.

Usage: python scripts/textops_scale_check.py [--docs 1000000]
                                             [--num-cpus 16]
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

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def gen_corpus(out_dir: str, n_docs: int, vocab: int = 50_000,
               words_per_doc: int = 30, seed: int = 7) -> str:
    """One documents.parquet (doc_id, text, n_chars) with planted
    cross-document duplication: 2% of docs copy another doc's text so
    dup_ngram_frac has real shared 5-grams to find."""
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(os.path.join(out_dir, "_DONE")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    vocab_arr = pa.array([f"w{i}" for i in range(vocab)])
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, vocab, size=(n_docs, words_per_doc))
    k = max(1, n_docs // 50)
    idx[-k:] = idx[:k]  # full-copy tail: guaranteed shared 5-grams
    words = vocab_arr.take(pa.array(idx.ravel(), pa.int64()))
    offs = pa.array(np.arange(n_docs + 1) * words_per_doc, pa.int32())
    texts = pc.binary_join(pa.ListArray.from_arrays(offs, words), " ")
    t = pa.table({"doc_id": pa.array(np.arange(n_docs), pa.int64()),
                  "text": texts,
                  "n_chars": pc.cast(pc.utf8_length(texts), pa.int64())})
    pq.write_table(t, path, row_group_size=65536)
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    return out_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--num-cpus", type=int, default=16)
    args = ap.parse_args()

    sf = gen_corpus(f"/tmp/sjot_textops_{args.docs}", args.docs)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False)
    from sjot_ray.pipelines.queries import (q_distinctive_terms,
                                            q_doc_repetition,
                                            q_dup_ngram_frac,
                                            q_histogram_doc_length)

    report: dict = {"docs": args.docs, "num_cpus": args.num_cpus,
                    "rss_start_mb": round(_rss_mb(), 1), "ops": {}}
    for name, fn, summarize in (
        ("doc_repetition", q_doc_repetition,
         lambda t: {"rows": t.num_rows}),
        ("dup_ngram_frac", q_dup_ngram_frac,
         lambda t: {"rows": t.num_rows,
                    "docs_with_dups": int(pc.sum(pc.cast(
                        pc.greater(t["n_dup"], 0), pa.int64())).as_py())}),
        ("distinctive_terms", q_distinctive_terms,
         lambda t: {"rows": t.num_rows}),
        ("histogram_doc_length", q_histogram_doc_length,
         lambda t: {"rows": t.num_rows,
                    "total": int(pc.sum(t["n"]).as_py())}),
    ):
        t0 = time.time()
        out = fn(sf)
        wall = round(time.time() - t0, 2)
        report["ops"][name] = {"wall_s": wall,
                               "rss_after_mb": round(_rss_mb(), 1),
                               **summarize(out)}
    # NOTE: doc_repetition/distinctive_terms return per-doc tables via
    # _t() for the gate's hash — at this scale that driver table is the
    # RSS delta you see, ~n_docs × a few dozen bytes, and it exists only
    # because the CHECK wants the full result; the production path
    # writes the same Dataset to parquet instead of materializing.
    report["rss_end_mb"] = round(_rss_mb(), 1)
    print(json.dumps(report))
    ray.shutdown()


if __name__ == "__main__":
    main()
