"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs": N, "docs_per_sec": N}

Headline = flagship interleaved-corpus validation (read parquet →
actor-pool columnar SJOT validation → violations view + verdict summary),
corpus size scaled off the sf's events row count. Corpus generation is
cached/warmed before timing so the measurement is compute + pipeline, not
one-time synthesis.

--scaling: runs the headline pipeline twice in fresh interpreters at two
parallelism levels (default num_cpus 2 and 8 — overridable via
GRAFT_SCALE_LO/HI) on the same fixed 2M-doc corpus and reports both
throughputs plus scaling efficiency (recorded in BASELINE.md). The
defaults are chosen for THIS sandbox: the host exposes 32 vCPUs but
sustains only ~10 cores of parallel throughput (measured), so 8→32
would measure host saturation rather than engine scaling.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

def corpus_docs() -> int:
    override = os.environ.get("GRAFT_BENCH_DOCS")
    if override:
        return int(override)
    import pyarrow.parquet as pq

    n_events = pq.read_metadata(f"{SF_DIR}/events.parquet").num_rows
    return max(20_000, 2 * n_events)

def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from sjot_ray.pipelines import queries as Q
    from sjot_ray.pipelines.flagship import read_corpus, validated, verdict_summary
    from sjot_ray.sources.gen import interleaved_parquet

    num_docs = corpus_docs()
    # warm: generate/cache corpus, then run the FULL pipeline once
    # untimed — this spawns the worker pool and pays every per-worker
    # one-time cost (parquet reader init ~0.5s, validator compile) and
    # primes the page cache, so the measurement is steady-state
    # throughput, not session startup.
    interleaved_parquet(num_docs, seed=42)
    verdict_summary(validated(read_corpus(num_docs, seed=42)))

    # best-of-3: this host shows 3-7x co-tenant/hypervisor-steal spikes
    # minute to minute (identical runs measured 0.57s and 3.98s back to
    # back) — a single sample records the weather, not the engine. All
    # samples are reported alongside the best.
    headline_samples = []
    for _ in range(3):
        t0 = time.time()
        summary = verdict_summary(validated(read_corpus(num_docs, seed=42)))
        headline_samples.append(round(time.time() - t0, 3))
    headline = min(headline_samples)
    n_pass = int(summary.loc[summary["rule"] == "PASS", "n"].sum())

    query_times: dict[str, float] = {}
    names = () if os.environ.get("GRAFT_SKIP_QUERIES") else (
        "q1_lineitem", "segment_revenue", "events_hourly",
        "token_counts", "text_quality", "dedup_exact",
        "ann_cosine_topk", "validate_documents",
        "validate_events_props", "uniqueness_events_user",
        "order_lineitem_join", "user_sessions_salted",
        "dedup_embedding_exact", "lang_id", "doc_fingerprint")
    for name in names:
        fn = getattr(Q, f"q_{name}")
        best = float("inf")
        for _ in range(3):  # best-of-3: noisy host, cold-start amortized
            t0 = time.time()
            fn(SF_DIR)
            best = min(best, time.time() - t0)
        query_times[name] = round(best, 3)

    ray.shutdown()
    return {
        "metric": "flagship interleaved validation wall time"
                  " (read→validate→summarize)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": query_times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": num_docs,
        "docs_per_sec": round(num_docs / headline),
        "headline_samples": headline_samples,
        "pass_rate": round(n_pass / num_docs, 4),
    }

def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SKIP_QUERIES="1",
                   GRAFT_BENCH_DOCS=str(scale_docs))
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__))).stdout
        return json.loads(out.strip().splitlines()[-1])

    # a fixed-size corpus big enough that compute dominates the constant
    # pipeline-startup cost at the LOW level (otherwise the measurement is
    # of Ray session startup, not engine scaling)
    scale_docs = max(2_000_000, corpus_docs())

    lo_n = int(os.environ.get("GRAFT_SCALE_LO", "2"))
    hi_n = int(os.environ.get("GRAFT_SCALE_HI", "8"))
    run(hi_n)  # warm caches (corpus parquet + page cache), untimed
    # best-of-3 per level: the sandbox host is noisy (measured ±50%
    # under co-tenant load) and a single depressed hi-level run
    # understates efficiency
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))
    lo = max((run(lo_n) for _ in range(reps)),
             key=lambda r: r["docs_per_sec"])
    hi = max((run(hi_n) for _ in range(reps)),
             key=lambda r: r["docs_per_sec"])
    tput_lo = lo["docs_per_sec"]
    tput_hi = hi["docs_per_sec"]
    eff = (tput_hi / tput_lo) / (hi_n / lo_n)
    return {
        "metric": "scaling efficiency, flagship validation,"
                  f" num_cpus {lo_n}->{hi_n}",
        "value": round(eff, 3),
        "unit": "efficiency",
        "lo_cpus": lo_n, "hi_cpus": hi_n,
        "sec_lo": lo["value"],
        "sec_hi": hi["value"],
        "docs_per_sec_lo": tput_lo,
        "docs_per_sec_hi": tput_hi,
        "docs": lo["docs"],
        "sf": SF_DIR,
    }

if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
