"""Temporal operators Ray Data lacks natively: distributed AS-OF join,
per-key window functions (lag / row_number / running max), and a
big-big time-band RANGE join — each expressed as a hash-partitioned
shuffle (pipelines/shuffle.py) with fully vectorized per-partition
kernels, the composition the brief prescribes for operators the Dataset
API can't express directly.

Partitioning assumptions (documented per the brief):
* ``asof_join`` / ``window_funcs``: all rows of one key fit one reduce
  task (same contract as sessionize_salted's merge phase — per-user
  event counts are bounded; a pathological hot key would need the salt
  treatment sessionize_salted demonstrates).
* ``range_join_count``: the probe window must be narrower than the time
  bucket (window ≤ BUCKET_DAYS days ⇒ ≤ 2 probed buckets per probe
  row); one bucket's build rows fit one reduce task (buckets are
  fixed-width time slices, so skew is bounded by event-rate skew, not
  key skew).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..state.sketches import rehash
from .shuffle import coarse_buckets, hash_shuffle_apply

_US_PER_DAY = np.int64(86_400_000_000)


def _i64(col) -> np.ndarray:
    """int64 numpy view of an int/timestamp Arrow column. Nulls (the
    other side's rows in a union-schema shuffle) become 0 — callers mask
    them by side, and filling avoids the lossy float64 round-trip Arrow
    uses for nullable-to-numpy."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    if col.null_count:
        col = pc.fill_null(col, 0)
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _hkey(keys: np.ndarray) -> pa.Array:
    """Well-mixed shuffle key (plain ``% B`` on raw keys would stripe)."""
    return pa.array(rehash(keys.view(np.uint64), 17).astype(np.int64))


# ---------------------------------------------------------------------------
# AS-OF join


def asof_join(probe: "ray.data.Dataset", source: "ray.data.Dataset",
              key_col: str, ts_col: str, tie_col: str,
              carry_cols: list[str], n_rows: int | None = None,
              prefix: str = "prior_") -> "ray.data.Dataset":
    """For every probe row, attach ``carry_cols`` of the LATEST source
    row of the same key that is STRICTLY earlier by the total order
    ``(ts, tie)`` — the classic as-of (backward) join, distributed as:

    1. tag both sides into one union schema (probe extras are null on
       source rows and vice versa),
    2. hash-shuffle by key so every key's rows co-locate,
    3. per partition: one vectorized sort by ``(key, ts, tie, side)``
       with probe-before-source at exact ties (strict '<' semantics),
       then a single ``np.maximum.accumulate`` over source positions —
       each probe row reads the last source index in its prefix, and a
       key-equality check masks leakage across key boundaries.

    No per-row Python; the whole partition is O(n log n) in the sort.
    ``tie_col`` must make ``(ts, tie)`` a total order per key (use a
    unique row id); carried columns are null where no source precedes.
    """
    probe_schema = probe.schema().base_schema \
        if hasattr(probe.schema(), "base_schema") else probe.schema()
    source_schema = source.schema().base_schema \
        if hasattr(source.schema(), "base_schema") else source.schema()
    probe_cols = list(probe_schema.names)
    out_names = probe_cols + [prefix + c for c in carry_cols]

    if n_rows is None:
        n_rows = probe.count() + source.count()
    B = coarse_buckets(n_rows, cap=1024)

    def _tag(side: int):
        # capture plain pyarrow schemas, never the Datasets themselves
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols: dict = {"hkey": _hkey(_i64(t[key_col])),
                          "side": pa.array(np.full(n, side, np.int8))}
            for c in probe_cols:
                cols[c] = t[c] if side == 0 else pa.nulls(
                    n, probe_schema.field(c).type)
            for c in carry_cols:
                cols["__src_" + c] = t[c] if side == 1 else pa.nulls(
                    n, source_schema.field(c).type)
            if side == 1:  # source rows still need the join coordinates
                cols[key_col] = t[key_col]
                cols[ts_col] = t[ts_col]
                cols[tie_col] = t[tie_col]
            return pa.table(cols)
        return fn

    tagged = probe.map_batches(_tag(0), batch_format="pyarrow",
                               zero_copy_batch=True).union(
        source.map_batches(_tag(1), batch_format="pyarrow",
                           zero_copy_batch=True))

    def within(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                          (tie_col, "ascending"), ("side", "ascending")])
        g = g.take(idx)
        key = _i64(g[key_col])
        is_src = _i64(g["side"]) == 1
        n = len(key)
        last_src = np.maximum.accumulate(
            np.where(is_src, np.arange(n, dtype=np.int64), -1))
        probe_pos = np.nonzero(~is_src)[0]
        match = last_src[probe_pos]
        ok = (match >= 0)
        ok &= key[match.clip(min=0)] == key[probe_pos]
        cols = {c: g[c].take(pa.array(probe_pos)) for c in probe_cols}
        take_idx = np.where(ok, match, -1)
        for c in carry_cols:
            src = g["__src_" + c].combine_chunks() \
                if isinstance(g["__src_" + c], pa.ChunkedArray) \
                else g["__src_" + c]
            taken = src.take(pa.array(take_idx.clip(min=0)))
            cols[prefix + c] = pc.if_else(pa.array(ok), taken,
                                          pa.nulls(len(ok), src.type))
        return pa.table(cols)

    empty = pa.table({
        **{c: pa.nulls(0, probe_schema.field(c).type)
           for c in probe_cols},
        **{prefix + c: pa.nulls(0, source_schema.field(c).type)
           for c in carry_cols}}).select(out_names)
    return hash_shuffle_apply(tagged, "hkey", B, within, empty)


def q_asof_purchase_click(sf_dir: str):
    """AS-OF join inside the events stream: every 'purchase' event picks
    up the id and value of the same user's most recent earlier 'click'
    (strictly earlier by (ts, event_id)). Oracle: DuckDB
    last_value(... IGNORE NULLS) over the interleaved per-user log."""
    from .queries import _read, _t

    ev = _read(sf_dir, "events",
               columns=["event_id", "ts", "user_id", "event_type", "value"])

    def pick(kind: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).select(cols)
        return fn

    probe = ev.map_batches(pick("purchase", ["event_id", "user_id", "ts"]),
                           batch_format="pyarrow", zero_copy_batch=True)
    source = ev.map_batches(
        pick("click", ["event_id", "user_id", "ts", "value"]),
        batch_format="pyarrow", zero_copy_batch=True)
    from .queries import _parquet_rows

    out = asof_join(probe, source, key_col="user_id", ts_col="ts",
                    tie_col="event_id", carry_cols=["event_id", "value"],
                    prefix="prior_click_",
                    n_rows=_parquet_rows(sf_dir, "events"))
    t = _t(out).rename_columns(
        ["event_id", "user_id", "ts", "prior_click_id",
         "prior_click_value"])
    return t.sort_by("event_id")


# ---------------------------------------------------------------------------
# per-key window functions


def window_funcs(ds: "ray.data.Dataset", key_col: str, ts_col: str,
                 tie_col: str, val_col: str,
                 n_rows: int | None = None) -> "ray.data.Dataset":
    """SQL window functions over ``PARTITION BY key ORDER BY (ts, tie)``
    without a global sort: hash-partition by key, then one vectorized
    pass per partition computes

    * ``prev_delta_us`` — lag difference of ``ts`` in microseconds
      (null on each key's first row),
    * ``row_number`` — 1-based rank within the key,
    * ``running_max`` — cumulative max of ``val_col`` (an
      order-insensitive aggregate, so it is bit-exact regardless of the
      engine's accumulation tree — unlike a running float SUM).
    """
    if n_rows is None:
        n_rows = ds.count()
    B = coarse_buckets(n_rows, cap=1024)
    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("hkey", _hkey(_i64(t[key_col])))

    def within(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                          (tie_col, "ascending")])
        g = g.take(idx)
        key = _i64(g[key_col])
        ts = _i64(g[ts_col])
        val = g[val_col].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(g[val_col], pa.ChunkedArray) \
            else g[val_col].to_numpy(zero_copy_only=False)
        n = len(key)
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        run = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        rn = np.arange(n, dtype=np.int64) - starts[run] + 1
        delta = np.empty(n, dtype=np.int64)
        delta[1:] = ts[1:] - ts[:-1]
        delta[new] = 0
        run_max = _segmented_cummax(val, run)
        return pa.table({
            key_col: g[key_col],
            tie_col: g[tie_col],
            "prev_delta_us": pc.if_else(
                pa.array(~new), pa.array(delta), pa.nulls(n, pa.int64())),
            "row_number": pa.array(rn),
            "running_max": pa.array(run_max, pa.float64()),
        })

    empty = pa.table({
        key_col: pa.nulls(0, schema.field(key_col).type),
        tie_col: pa.nulls(0, schema.field(tie_col).type),
        "prev_delta_us": pa.nulls(0, pa.int64()),
        "row_number": pa.nulls(0, pa.int64()),
        "running_max": pa.nulls(0, pa.float64()),
    })
    return hash_shuffle_apply(
        ds.map_batches(add_key, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, within, empty)


def _segmented_cummax(val: np.ndarray, run: np.ndarray) -> np.ndarray:
    """Cumulative max that resets at each new ``run`` id (runs are
    contiguous). pandas' grouped cummax is a comparison-only C kernel —
    EXACT on floats, unlike an arithmetic lift-and-accumulate trick
    whose add/subtract round-trip can perturb the 1e-6 digit the
    correctness gate hashes."""
    import pandas as pd

    if len(val) == 0:
        return val.astype(np.float64)
    return pd.Series(val.astype(np.float64)).groupby(run).cummax() \
        .to_numpy()


def q_events_window(sf_dir: str):
    """Per-user window functions over the events stream: lag-delta in
    µs, row_number, running max(value) ordered by (ts, event_id)."""
    from .queries import _parquet_rows, _read, _t

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    out = window_funcs(ds, key_col="user_id", ts_col="ts",
                       tie_col="event_id", val_col="value",
                       n_rows=_parquet_rows(sf_dir, "events"))
    return _t(out).sort_by("event_id")


# ---------------------------------------------------------------------------
# big-big time-band RANGE join

BUCKET_DAYS = 32


def range_join_count(build: "ray.data.Dataset", build_ts: str,
                     probe: "ray.data.Dataset", probe_id: str,
                     probe_ts: str, window_days: int,
                     n_rows: int | None = None) -> "ray.data.Dataset":
    """Count, for every probe row, the build rows whose timestamp falls
    in ``[probe_ts, probe_ts + window_days)`` — a big-big interval join
    with NO equi key, distributed by time-bucketing both sides (bucket
    = µs // (BUCKET_DAYS·day)). The comparison runs at FULL microsecond
    granularity — exactly the SQL `l.ts >= o.ts AND l.ts < o.ts +
    INTERVAL` predicate — so intra-day timestamps count correctly (a
    day-truncating variant diverged on random non-midnight-aligned
    corpora; caught by the seed-9002 differential):

    * build rows go to their bucket;
    * each probe row fans out to the ≤ 2 buckets its window overlaps
      (requires ``window_days ≤ BUCKET_DAYS``), its window clamped to
      that bucket's µs range so buckets count disjointly;
    * per partition: sort the build timestamps once, answer every probe
      with two ``np.searchsorted`` calls;
    * per-bucket partial counts groupby-sum back to one row per probe
      id (zero-count probes drop out — inner-join semantics).

    Both sides stream; no broadcast of either side; partition size is
    bounded by the event rate of a fixed time slice.
    """
    if window_days > BUCKET_DAYS:
        raise ValueError(f"window_days must be <= {BUCKET_DAYS}")
    if n_rows is None:
        n_rows = build.count()
    B = min(256, coarse_buckets(n_rows, rows_per_part=200_000, cap=256))
    WUS = np.int64(window_days) * _US_PER_DAY
    BDUS = np.int64(BUCKET_DAYS) * _US_PER_DAY

    def tag_build(t: pa.Table) -> pa.Table:
        us = _i64(t[build_ts])
        b = us // BDUS
        n = len(us)
        return pa.table({
            "hkey": _hkey(b), "side": pa.array(np.zeros(n, np.int8)),
            "day": pa.array(us), "pid": pa.nulls(n, pa.int64()),
            "lo": pa.nulls(n, pa.int64()), "hi": pa.nulls(n, pa.int64())})

    def tag_probe(t: pa.Table) -> pa.Table:
        lo = _i64(t[probe_ts])
        hi = lo + WUS                     # exclusive
        pid = _i64(t[probe_id])
        b0 = lo // BDUS
        b1 = (hi - 1) // BDUS
        parts = []
        for b in (b0, np.where(b1 != b0, b1, np.int64(-1))):
            keep = b >= 0
            bb, pl, ph, pp = b[keep], lo[keep], hi[keep], pid[keep]
            parts.append(pa.table({
                "hkey": _hkey(bb),
                "side": pa.array(np.ones(int(keep.sum()), np.int8)),
                "day": pa.array(bb),  # bucket id rides in `day` for probes
                "pid": pa.array(pp),
                "lo": pa.array(np.maximum(pl, bb * BDUS)),
                "hi": pa.array(np.minimum(ph, (bb + 1) * BDUS))}))
        return pa.concat_tables(parts)

    tagged = build.map_batches(tag_build, batch_format="pyarrow",
                               zero_copy_batch=True).union(
        probe.map_batches(tag_probe, batch_format="pyarrow",
                          zero_copy_batch=True))

    def within(g: pa.Table) -> pa.Table:
        side = _i64(g["side"])
        day = _i64(g["day"])
        ships = np.sort(day[side == 0])
        is_p = side == 1
        lo = _i64(g["lo"])[is_p]
        hi = _i64(g["hi"])[is_p]
        pid = _i64(g["pid"])[is_p]
        n = np.searchsorted(ships, hi, "left") - \
            np.searchsorted(ships, lo, "left")
        keep = n > 0
        return pa.table({"pid": pa.array(pid[keep]),
                         "n": pa.array(n[keep].astype(np.int64))})

    empty = pa.table({"pid": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    parts = hash_shuffle_apply(tagged, "hkey", B, within, empty)

    def merge(g: pa.Table) -> pa.Table:
        pid = _i64(g["pid"])
        n = _i64(g["n"])
        order = np.argsort(pid, kind="stable")
        pid, n = pid[order], n[order]
        newk = np.ones(len(pid), dtype=bool)
        newk[1:] = pid[1:] != pid[:-1]
        starts = np.nonzero(newk)[0]
        return pa.table({
            "pid": pa.array(pid[starts]),
            "n": pa.array(np.add.reduceat(n, starts)
                          if len(starts) else n[:0])})

    def rekey(t: pa.Table) -> pa.Table:
        return t.append_column("hkey2", _hkey(_i64(t["pid"])))

    B2 = coarse_buckets(n_rows, rows_per_part=800_000, cap=512)
    return hash_shuffle_apply(
        parts.map_batches(rekey, batch_format="pyarrow",
                          zero_copy_batch=True),
        "hkey2", B2, merge,
        pa.table({"pid": pa.array([], pa.int64()),
                  "n": pa.array([], pa.int64())}))


def q_order_shipments_window(sf_dir: str):
    """RANGE join orders × lineitem with no equi key: per order, how
    many lineitems (of ANY order) shipped in the 7 days from its order
    date. 150K × 600K at sf0.1 — the time-bucket co-partition keeps it
    off the O(n·m) cliff the SQL engines' IEJoin exists for."""
    from .queries import _parquet_rows, _read, _t

    li = _read(sf_dir, "lineitem", columns=["l_shipdate"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])
    out = range_join_count(li, "l_shipdate", orders, "o_orderkey",
                           "o_orderdate", window_days=7,
                           n_rows=_parquet_rows(sf_dir, "lineitem"))
    t = _t(out)
    if not t.column_names:        # zero matching windows anywhere
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "n_shipped_7d": pa.array([], pa.int64())})
    t = t.rename_columns(["o_orderkey", "n_shipped_7d"])
    return t.sort_by("o_orderkey")


TEMPORAL_ORACLE_SQL: dict[str, str] = {
    "asof_purchase_click": """
        WITH s AS (
          SELECT event_id, user_id, ts, event_type,
                 CASE WHEN event_type = 'click' THEN event_id END
                   AS click_id,
                 CASE WHEN event_type = 'click' THEN value END
                   AS click_value
          FROM events WHERE event_type IN ('click', 'purchase')
        ), w AS (
          SELECT event_id, user_id, ts, event_type,
                 last_value(click_id IGNORE NULLS) OVER win
                   AS prior_click_id,
                 last_value(click_value IGNORE NULLS) OVER win
                   AS prior_click_value
          FROM s
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id, user_id, ts, prior_click_id, prior_click_value
        FROM w WHERE event_type = 'purchase' ORDER BY event_id
    """,
    "events_window": """
        SELECT user_id, event_id,
               date_diff('microsecond', lag(ts) OVER win, ts)
                 AS prev_delta_us,
               row_number() OVER win AS row_number,
               max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS running_max
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        ORDER BY event_id
    """,
    "order_shipments_window": """
        SELECT o.o_orderkey, count(*) AS n_shipped_7d
        FROM orders o JOIN lineitem l
          ON l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
        GROUP BY o.o_orderkey
        ORDER BY o.o_orderkey
    """,
}


# ---------------------------------------------------------------------------
# grouped ARG_MAX (latest row per key)

def _last_per_key(t: pa.Table, key_col: str, ts_col: str,
                  tie_col: str) -> pa.Table:
    """Keep each key's row with the max (ts, tie) — one vectorized sort +
    one take; ties broken deterministically by ``tie_col``."""
    if t.num_rows == 0:
        return t
    idx = pc.sort_indices(
        t, sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                      (tie_col, "ascending")])
    t = t.take(idx)
    key = _i64(t[key_col])
    last = np.nonzero(np.r_[key[1:] != key[:-1], True])[0]
    return t.take(pa.array(last, pa.int64()))


def q_latest_event_per_user(sf_dir: str):
    """Grouped ARG_MAX — each user's latest event row (full payload),
    ordered by (ts, event_id) so ties are deterministic. Two-level
    reduction: every batch first collapses to ≤ one row per user seen in
    the batch (argmax is idempotent and mergeable, like the moment
    partials), then the ≤|users|-per-batch partials co-locate through
    the keyed shuffle and each partition re-argmaxes once — the same
    shape as SQL's ``arg_max``/``row_number()=1`` but with no global
    sort and only partial rows on the wire."""
    from .queries import _parquet_rows, _read, _t

    cols = ["user_id", "event_id", "ts", "event_type", "value"]
    ds = _read(sf_dir, "events", columns=cols)
    B = coarse_buckets(_parquet_rows(sf_dir, "events"), cap=1024)

    def partial(t: pa.Table) -> pa.Table:
        r = _last_per_key(t, "user_id", "ts", "event_id")
        return r.append_column("hkey", _hkey(_i64(r["user_id"])))

    empty = pa.table({
        "user_id": pa.array([], pa.int64()),
        "event_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64())})

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        return _last_per_key(g, "user_id", "ts", "event_id").select(cols)

    out = hash_shuffle_apply(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, final, empty)
    return _t(out).sort_by("user_id")


TEMPORAL_ORACLE_SQL["latest_event_per_user"] = """
    SELECT user_id, event_id, ts, event_type, value
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts DESC, event_id DESC)
                      AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# ordered-sequence funnel

def q_funnel_view_click_purchase(sf_dir: str):
    """Conversion funnel with STRICT temporal ordering — users who
    viewed, then clicked after their first view, then purchased after
    that first qualifying click. Events hash-partition by user (all of
    a user's rows co-locate once), and each partition resolves the
    three stages with Arrow kernels only: min-ts per user for stage 1,
    then an inner join + ts-filter + min for each later stage — no
    per-user Python loop, no global sort. Partitions emit 3-row count
    partials; the driver folds ≤3·B rows. The same shape extends to any
    fixed event-sequence pattern (A then B then C …)."""
    from .queries import _parquet_rows, _read, _t

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    B = coarse_buckets(_parquet_rows(sf_dir, "events"), cap=1024)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("hkey", _hkey(_i64(t["user_id"])))

    STAGES = ["view", "view>click", "view>click>purchase"]
    empty = pa.table({"stage": pa.array([], pa.string()),
                      "n_users": pa.array([], pa.int64())})

    def funnel_part(g: pa.Table) -> pa.Table:
        def first_after(kind: str, prev: pa.Table | None) -> pa.Table:
            """min ts per user of `kind` events, strictly after the
            user's ts in `prev` (prev=None → unconditional)."""
            e = g.filter(pc.equal(g["event_type"], kind)) \
                .select(["user_id", "ts"])
            if prev is not None:
                e = e.join(prev, keys="user_id", join_type="inner")
                e = e.filter(pc.greater(e["ts"], e["t_prev"]))
                e = e.select(["user_id", "ts"])
            m = e.group_by("user_id").aggregate([("ts", "min")])
            return m.rename_columns(["user_id", "t_prev"])

        s1 = first_after("view", None)
        s2 = first_after("click", s1)
        s3 = first_after("purchase", s2)
        return pa.table({
            "stage": pa.array(STAGES, pa.string()),
            "n_users": pa.array([s1.num_rows, s2.num_rows, s3.num_rows],
                                pa.int64())})

    parts = hash_shuffle_apply(
        ds.map_batches(add_key, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, funnel_part, empty)
    t = _t(parts)
    if t.num_rows == 0:
        return empty
    agg = t.group_by("stage").aggregate([("n_users", "sum")])
    return agg.rename_columns(["stage", "n_users"]).sort_by("stage")


TEMPORAL_ORACLE_SQL["funnel_view_click_purchase"] = """
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
           GROUP BY e.user_id)
    SELECT stage, n_users FROM (
        SELECT 'view' AS stage, count(*) AS n_users FROM s1
        UNION ALL
        SELECT 'view>click', count(*) FROM s2
        UNION ALL
        SELECT 'view>click>purchase', count(*) FROM s3)
    ORDER BY stage
"""


# ---------------------------------------------------------------------------
# ranking window-function family (rank / dense_rank / lead / ntile)

def _ntile(rn: np.ndarray, cnt: np.ndarray, n: int) -> np.ndarray:
    """SQL NTILE(n): the first ``cnt % n`` buckets get ``cnt // n + 1``
    rows, the rest ``cnt // n`` — vectorized over rows (``rn`` is the
    1-based row_number, ``cnt`` the row's partition size)."""
    q, r = cnt // n, cnt % n
    big = r * (q + 1)            # rows covered by the oversized buckets
    in_big = rn <= big
    # q == 0 only when cnt < n, and then every row is in a 'big' bucket
    safe_q = np.maximum(q, 1)
    return np.where(in_big, (rn - 1) // (q + 1) + 1,
                    r + (rn - big - 1) // safe_q + 1).astype(np.int64)


def rank_window_funcs(ds: "ray.data.Dataset", key_col: str, ts_col: str,
                      tie_col: str, val_col: str, lab_col: str,
                      n_rows: int | None = None,
                      n_tiles: int = 4) -> "ray.data.Dataset":
    """Per-key ranking window functions in ONE keyed shuffle:

    * ``rnk`` / ``drnk`` — RANK / DENSE_RANK over ``val_col`` DESC
      (ties share a rank; equality on the raw stored doubles, no
      arithmetic, so it is engine-stable);
    * ``lead_label`` — LEAD(``lab_col``) over (ts, tie);
    * ``tile`` — NTILE(``n_tiles``) over (ts, tie).

    Per partition: one sort by (key, ts, tie) for the sequential
    functions, one lexsort by (key, -val) for the rank pair, and pure
    numpy segment arithmetic in between — no per-row Python. Same
    partitioning contract as ``window_funcs``: one key's rows fit one
    reduce task."""
    if n_rows is None:
        n_rows = ds.count()
    B = coarse_buckets(n_rows, cap=1024)
    schema = ds.schema()
    schema = getattr(schema, "base_schema", schema)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column("hkey", _hkey(_i64(t[key_col])))

    def within(g: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            g, sort_keys=[(key_col, "ascending"), (ts_col, "ascending"),
                          (tie_col, "ascending")])
        g = g.take(idx)
        key = _i64(g[key_col])
        val = g[val_col].combine_chunks().to_numpy(zero_copy_only=False) \
            if isinstance(g[val_col], pa.ChunkedArray) \
            else g[val_col].to_numpy(zero_copy_only=False)
        n = len(key)
        if n == 0:
            return pa.table({
                key_col: pa.nulls(0, schema.field(key_col).type),
                tie_col: pa.nulls(0, schema.field(tie_col).type),
                "rnk": pa.array([], pa.int64()),
                "drnk": pa.array([], pa.int64()),
                "lead_label": pa.nulls(0, schema.field(lab_col).type),
                "tile": pa.array([], pa.int64())})
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        run = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.r_[starts, n])
        rn = np.arange(n, dtype=np.int64) - starts[run] + 1
        cnt = sizes[run]
        tile = _ntile(rn, cnt, n_tiles)
        # LEAD(label): next row's label unless it starts a new key
        ends = np.zeros(n, dtype=bool)
        ends[:-1] = new[1:]
        ends[-1] = True
        lab = g[lab_col].combine_chunks() \
            if isinstance(g[lab_col], pa.ChunkedArray) else g[lab_col]
        nxt = np.minimum(np.arange(n, dtype=np.int64) + 1, n - 1)
        lead = pc.if_else(pa.array(~ends), lab.take(pa.array(nxt)),
                          pa.nulls(n, lab.type))
        # RANK / DENSE_RANK over val DESC: lexsort puts each key's rows
        # in descending-value order; ties copy the first equal's position
        order2 = np.lexsort((-val, key))
        v2, r2 = val[order2], run[order2]
        pos2 = np.arange(n, dtype=np.int64) - starts[r2] + 1
        newv = np.ones(n, dtype=bool)
        newv[1:] = (r2[1:] != r2[:-1]) | (v2[1:] != v2[:-1])
        first_eq = np.maximum.accumulate(
            np.where(newv, np.arange(n, dtype=np.int64), 0))
        rnk2 = pos2[first_eq]
        dc = np.cumsum(newv)
        drnk2 = dc - dc[starts[r2]] + 1
        rnk = np.empty(n, dtype=np.int64)
        drnk = np.empty(n, dtype=np.int64)
        rnk[order2] = rnk2
        drnk[order2] = drnk2
        return pa.table({
            key_col: g[key_col],
            tie_col: g[tie_col],
            "rnk": pa.array(rnk),
            "drnk": pa.array(drnk),
            "lead_label": lead,
            "tile": pa.array(tile)})

    empty = pa.table({
        key_col: pa.nulls(0, schema.field(key_col).type),
        tie_col: pa.nulls(0, schema.field(tie_col).type),
        "rnk": pa.array([], pa.int64()),
        "drnk": pa.array([], pa.int64()),
        "lead_label": pa.nulls(0, schema.field(lab_col).type),
        "tile": pa.array([], pa.int64())})
    return hash_shuffle_apply(
        ds.map_batches(add_key, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, within, empty)


def q_events_rank(sf_dir: str):
    """Per-user ranking windows over the events stream: RANK and
    DENSE_RANK by value DESC, LEAD(event_type) and NTILE(4) by
    (ts, event_id)."""
    from .queries import _parquet_rows, _read, _t

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value",
                        "event_type"])
    out = rank_window_funcs(ds, key_col="user_id", ts_col="ts",
                            tie_col="event_id", val_col="value",
                            lab_col="event_type",
                            n_rows=_parquet_rows(sf_dir, "events"))
    return _t(out).sort_by("event_id")


TEMPORAL_ORACLE_SQL["events_rank"] = """
    SELECT user_id, event_id,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC)
                AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY user_id
                                   ORDER BY value DESC)
                AS BIGINT) AS drnk,
           lead(event_type) OVER win AS lead_label,
           CAST(ntile(4) OVER win AS BIGINT) AS tile
    FROM events
    WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY event_id
"""
