"""Job entry point for ``ray job submit`` (the north rule's submission
shape): end-to-end resumable validation of an interleaved corpus plus the
table-level checks, with per-partition lineage + metrics manifests.

    ray job submit -- python scripts/run_job.py \
        --input /data/interleaved --output /data/validated

On the sandbox (single node) it runs against the generated corpus:

    python scripts/run_job.py --docs 200000 --output /tmp/job_out

Owns its Ray session (scripts may; the library and __ray_entry__ never do).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="directory of parquet shards")
    ap.add_argument("--docs", type=int, default=200_000,
                    help="generate a corpus of this size when no --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"include_dashboard": False, "ignore_reinit_error": True,
              "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(address="local", **kw)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from sjot_ray.pipelines.checkpoint import resumable_validate
    from sjot_ray.pipelines.wide_checks import duplicate_keys, referential_check
    from sjot_ray.sources.gen import interleaved_parquet, media_catalog

    input_dir = args.input or interleaved_parquet(args.docs, args.seed)

    t0 = time.time()
    summary = resumable_validate(input_dir, args.output)

    validated = ray.data.read_parquet(args.output)
    dups = duplicate_keys(validated, "doc_id").count()
    # distinct estimate comes from the manifests' merged HLL sketches —
    # a resumed run recovers it without re-reading any partition

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def media_rows(t: pa.Table) -> pa.Table:
        spans = t["spans"]
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        mr = spans.flatten().field("media_ref")
        return pa.table({"media_ref": mr}).filter(pc.is_valid(mr))

    refs = validated.map_batches(media_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
    dangling = referential_check(refs, "media_ref", media_catalog()).count()

    report = {
        **summary,
        "duplicate_doc_ids": dups,
        "dangling_media_refs": dangling,
        "wall_sec": round(time.time() - t0, 2),
    }
    with open(f"{args.output}/_job_report.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
