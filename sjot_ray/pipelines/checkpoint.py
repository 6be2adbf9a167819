"""Resumable, partition-addressed execution with per-partition lineage +
metrics (the north rule's checkpoint/resume story).

Layout under ``out_dir``::

    part-<i>.parquet           one output partition per input shard
    _manifest/part-<i>.json    lineage + metrics for that partition

A manifest entry records the input file, its content fingerprint
(size+mtime), row counts, pass counts, wall time, the engine version, and
a serialized per-shard HyperLogLog sketch of doc_id — enough to (a) skip
completed partitions on rerun, (b) invalidate when the input shard
changed, and (c) aggregate job-level metrics INCLUDING the distinct-id
estimate without touching the data (sketches are mergeable, so a resumed
run recovers the estimate from manifests alone). Writes are atomic (temp file + rename): a crash mid-partition
leaves no manifest entry, so the rerun redoes exactly that partition.

This layer deliberately drops to raw Ray tasks (one per input shard): the
Dataset API streams blocks without stable shard↔output addressing, and
resumability requires exactly that addressing. Everything inside a task is
still the same compiled columnar validator used by the streaming pipeline.
"""

from __future__ import annotations

import json
import os
import time

import ray


def _shard_fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


@ray.remote
def _process_shard(input_file: str, out_dir: str, idx: int, schema,
                   extras_column, engine_version: str) -> dict:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pa.set_cpu_count(2)
    pa.set_io_thread_count(4)
    from sjot_ray.stages.validate import ValidateInterleavedDocs

    t0 = time.time()
    tbl = pq.read_table(input_file)
    v = ValidateInterleavedDocs(schema, extras_column=extras_column)
    out = v(tbl)

    part = os.path.join(out_dir, f"part-{idx:05d}.parquet")
    tmp = part + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, part)

    import base64

    import pyarrow.compute as pc

    from sjot_ray.state.sketches import HyperLogLog, hash64

    n_pass = int(pc.sum(out["verdict"]).as_py() or 0)
    hll = HyperLogLog(14)
    if tbl.num_rows:
        hll.add_hashes(hash64(out["doc_id"]))
    # per-rule verdict histogram: manifests alone reconstruct the job
    # summary (a resumed/summary-only run never re-reads the data)
    rc = pa.table({"rule": pc.fill_null(out["v_rule"], "PASS")}) \
        .group_by("rule").aggregate([([], "count_all")])
    rule_counts = dict(zip(rc["rule"].to_pylist(),
                           rc["count_all"].to_pylist()))
    manifest = {
        "partition": idx,
        "input_file": input_file,
        "input_fingerprint": _shard_fingerprint(input_file),
        "rows": tbl.num_rows,
        "rows_pass": n_pass,
        "rows_fail": tbl.num_rows - n_pass,
        "wall_sec": round(time.time() - t0, 3),
        "engine_version": engine_version,
        "completed_at": time.time(),
        "hll_doc_id": base64.b64encode(hll.serialize()).decode(),
        "rule_counts": rule_counts,
    }
    mdir = os.path.join(out_dir, "_manifest")
    os.makedirs(mdir, exist_ok=True)
    mtmp = os.path.join(mdir, f"part-{idx:05d}.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, os.path.join(mdir, f"part-{idx:05d}.json"))
    return manifest


def resumable_validate(input_dir: str, out_dir: str, schema=None,
                       extras_column: str | None = "_extra_props") -> dict:
    """Validate every parquet shard under ``input_dir`` into ``out_dir``,
    skipping partitions whose manifest matches the current input shard.

    Returns job summary: partitions done/skipped, aggregate row metrics.
    """
    from .. import __version__
    from ..sources.gen import FLAGSHIP_SCHEMA

    if schema is None:
        schema = FLAGSHIP_SCHEMA
    shards = sorted(
        os.path.join(input_dir, f) for f in os.listdir(input_dir)
        if f.endswith(".parquet"))
    os.makedirs(out_dir, exist_ok=True)
    mdir = os.path.join(out_dir, "_manifest")

    # prune stale state from previous runs: manifests/parts whose index is
    # beyond the current shard set, or whose recorded input no longer sits
    # at that index (shrunk/reordered inputs) — otherwise they would be
    # double-counted in the job summary and linger as stale output
    if os.path.isdir(mdir):
        for f in os.listdir(mdir):
            if not f.endswith(".json"):
                continue
            try:
                idx = int(f[len("part-"):-len(".json")])
            except ValueError:
                continue
            stale = idx >= len(shards)
            if not stale:
                try:
                    with open(os.path.join(mdir, f)) as fh:
                        stale = json.load(fh).get("input_file") != shards[idx]
                except (json.JSONDecodeError, OSError):
                    stale = True
            if stale:
                for p in (os.path.join(mdir, f),
                          os.path.join(out_dir, f"part-{idx:05d}.parquet")):
                    if os.path.exists(p):
                        os.remove(p)

    todo, skipped = [], 0
    for i, shard in enumerate(shards):
        mpath = os.path.join(mdir, f"part-{i:05d}.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if (m.get("input_file") == shard
                    and m.get("input_fingerprint") == _shard_fingerprint(shard)
                    and m.get("engine_version") == __version__
                    and os.path.exists(
                        os.path.join(out_dir, f"part-{i:05d}.parquet"))):
                skipped += 1
                continue
        todo.append((i, shard))

    results = ray.get([
        _process_shard.remote(shard, out_dir, i, schema, extras_column,
                              __version__)
        for i, shard in todo])

    # aggregate metrics across ALL manifests (old + new); the per-shard
    # HLL sketches merge into the job-level distinct estimate, so a
    # resumed run recovers it without re-reading any data
    import base64

    from sjot_ray.state.sketches import HyperLogLog

    total = {"rows": 0, "rows_pass": 0, "rows_fail": 0}
    merged_hll = HyperLogLog(14)
    rule_counts: dict = {}
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.endswith(".json"):
            with open(os.path.join(mdir, f)) as fh:
                m = json.load(fh)
            for k in total:
                total[k] += m[k]
            if m.get("hll_doc_id"):
                merged_hll.merge(HyperLogLog.deserialize(
                    base64.b64decode(m["hll_doc_id"]), 14))
            for r, n in (m.get("rule_counts") or {}).items():
                rule_counts[r] = rule_counts.get(r, 0) + n
    return {
        "partitions_total": len(shards),
        "partitions_processed": len(results),
        "partitions_skipped": skipped,
        **total,
        "distinct_doc_ids_est": round(merged_hll.estimate()),
        "rule_counts": rule_counts,
    }
