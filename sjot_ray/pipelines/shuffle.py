"""Manual two-stage hash shuffle over raw Ray tasks.

Why this exists (the one place we drop below the Dataset API): Ray Data's
sort-based ``groupby`` costs ~O(#distinct keys) in per-group overhead and,
in local mode, routes the shuffled table through the DRIVER heap
(measured on this host: 3.2M distinct int64 keys → ~56 s wall and ~1.4 GB
of driver RssAnon for a 640 MB table; 64 coarse partitions → 1.1 s but
still the driver-heap blowup). High-cardinality key co-location — LSH
bucket grouping, candidate-pair joins — therefore uses the classic Ray
map/reduce shuffle: each map task splits its block into B hash partitions
(B object returns), each reduce task concatenates one partition across
blocks and applies a vectorized per-partition function. Data moves
worker→object store→worker; the driver only ever holds object refs
(B × n_blocks of them).

Partitioning assumption (document per use): all rows with equal
``key_col`` land in the same partition (key % B); per-partition functions
must be correct for any superset of co-located key groups.

Fan-in: a reduce task's argument list is capped at ``_FANIN`` input
cells. Beyond that, intermediate combine rounds form a merge tree —
each combine concatenates up to ``_FANIN`` partition cells into one
object-store table and returns a ref — so a 100 TB run with ~4×10^5
input blocks costs ⌈log_FANIN(n_blocks)⌉ (=2) extra rounds per
partition instead of one task with 4×10^5 arguments. The driver holds
B × n_blocks refs transiently at split time (refs only, ~100 B each);
combine rounds shrink that to B × fan-in.

Driver ref ceiling (measured, deliberate): B × n_blocks cell refs is
the footprint floor of this single-stage design — ~10^7 cells (≈1 GB
of ref bookkeeping) is a practical driver limit, i.e. B=4096 with up
to ~2.5K blocks or B=256 with 4×10^4 blocks. An attempted
one-tuple-per-block variant (partition extraction inside the tasks)
was MEASURED strictly worse — every per-partition task then borrows
every block's B inner refs, multiplying Ray's per-(task × ref)
bookkeeping by B (driver RSS 336 MB → 1.5 GB, wall 50 s → 80 s on the
2M-doc dedup check) — so it was reverted. Past the cell ceiling the
right structure is a TWO-STAGE shuffle (coarse key%G co-location, then
per-group key%B), which keeps the product at G×n_blocks + B×(n/G);
not needed at current corpus scales and left as the documented 100 TB
growth path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _split(t: pa.Table, key_col: str, B: int):
    # Returns a tuple of B ObjectRefs (or None for empty cells), NOT the
    # tables themselves: Ray inlines small (<100 KiB) task returns into
    # the OWNER process's memory, so returning n_blocks × B small tables
    # directly parks the entire shuffled payload in the driver heap
    # (measured: +1.4 GB for a 640 MB table). ray.put keeps each cell in
    # the worker-side object store and only refs travel to the driver.
    if t.num_rows == 0:
        # Ray Data passes zero-row blocks through map transforms
        # untouched, so an empty block may still carry an upstream schema
        # (possibly without key_col); reduce drops empties anyway
        return tuple(None for _ in range(B))
    k = t[key_col].to_numpy(zero_copy_only=False)
    if k.dtype != np.int64:
        k = k.astype(np.int64)
    part = (k.view(np.uint64) % np.uint64(B)).astype(np.int64)
    order = np.argsort(part, kind="stable")
    t_sorted = t.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(part[order], np.arange(B + 1))
    out = []
    for i in range(B):
        n = int(bounds[i + 1] - bounds[i])
        out.append(ray.put(t_sorted.slice(int(bounds[i]), n).combine_chunks())
                   if n else None)
    return tuple(out)


@ray.remote
def _reduce(fn, empty: pa.Table, *part_refs) -> pa.Table:
    refs = [r for r in part_refs if r is not None]
    parts = [p for p in ray.get(refs) if p.num_rows] if refs else []
    if not parts:
        return empty
    return fn(pa.concat_tables(parts, promote_options="default"))


# Max arguments per reduce/combine task. Ray resolves each argument
# individually; thousands of args per task stress the scheduler and the
# owner's ref bookkeeping, so beyond this the shuffle inserts combine
# rounds (a merge tree) instead of widening one task.
_FANIN = 512


@ray.remote
def _combine(*part_refs):
    """Merge up to _FANIN partition cells into one table; returns an
    inner ObjectRef (like _split) so the merged table lives in the
    worker-side object store, never inlined into the driver heap."""
    refs = [r for r in part_refs if r is not None]
    parts = [p for p in ray.get(refs) if p.num_rows] if refs else []
    if not parts:
        return None
    return ray.put(pa.concat_tables(parts, promote_options="default")
                   .combine_chunks())


def coarse_buckets(n_rows: int, rows_per_part: int = 400_000,
                   cap: int = 4096) -> int:
    """Partition count for high-cardinality keyed work: scales with the
    input so per-task memory stays bounded, floored at 16 for
    parallelism, capped to bound scheduler fan-out."""
    return int(min(cap, max(16, n_rows // rows_per_part + 1)))


def hash_shuffle_apply(ds: "ray.data.Dataset", key_col: str, n_parts: int,
                       fn, empty: pa.Table,
                       fanin: int = _FANIN) -> "ray.data.Dataset":
    """Partition ``ds`` by ``key_col % n_parts`` (integer keys), apply
    ``fn(partition_table) -> pa.Table`` once per partition in reduce
    tasks, and return the outputs as a new Dataset. ``empty`` is the
    output schema's empty table (returned for empty partitions and when
    the input has no blocks).

    When the input has more than ``fanin`` blocks, each partition's
    cells are merged through intermediate ``_combine`` rounds (a
    ``fanin``-ary tree) so no task ever takes more than ``fanin``
    arguments — the shuffle scales past the single-round ~10^4-block
    fan-in ceiling with ⌈log_fanin(n_blocks)⌉ rounds."""
    B = max(2, int(n_parts))
    fanin = max(2, int(fanin))
    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return ray.data.from_arrow(empty)
    split_out = [_split.options(num_returns=B).remote(b, key_col, B)
                 for b in block_refs]
    out_refs = []
    for p in range(B):
        cells = [split_out[i][p] for i in range(len(split_out))]
        while len(cells) > fanin:
            cells = [_combine.remote(*cells[i:i + fanin])
                     for i in range(0, len(cells), fanin)]
        out_refs.append(_reduce.remote(fn, empty, *cells))
    return ray.data.from_arrow_refs(out_refs)
