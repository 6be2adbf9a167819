"""Table-level checks (north rule): uniqueness, referential integrity,
distribution drift, column stats — each designed as partial-per-batch →
tiny final merge, never a raw-row all-to-all shuffle.

* uniqueness: per-batch ``group_by(key).count`` partials (one row per key
  per batch) → global ``groupby(key).sum`` over the much smaller partials
  → filter n>1. Approximate distinct-count variant via mergeable HLL
  partials (one sketch row per batch).
* referential: the small build side is collected once, hashed into a Bloom
  filter + exact set, broadcast via ``ray.put``, probed inside
  ``map_batches`` (semi/anti-join without a shuffle).
* drift: per-batch KLL sketch partials merged on the driver; compare
  quantile vectors of current vs baseline.
* column stats: per-batch (count, nulls, min, max, sum, sumsq) partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..state.sketches import BloomFilter, HyperLogLog, KLLSketch, hash64


# -- uniqueness --------------------------------------------------------------

def duplicate_keys(ds: "ray.data.Dataset", key: str,
                   n_rows: int | None = None) -> "ray.data.Dataset":
    """Keys appearing more than once, with their multiplicities.

    Per-batch Arrow pre-count, then the partial rows are co-located by
    hash64(key) through the manual hash shuffle (key cardinality ~n hits
    Ray groupby's per-group wall, see pipelines/shuffle.py) and merged
    with a vectorized Arrow group_by on the exact key per partition.
    ``n_rows`` sizes the partition count; when None it is taken from
    ``ds.count()`` (metadata-cheap for parquet sources)."""
    from .shuffle import hash_shuffle_apply

    if n_rows is None:
        n_rows = ds.count()
    from .shuffle import coarse_buckets

    B = coarse_buckets(n_rows)

    def partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by(key).aggregate([([], "count_all")])
        g = g.rename_columns([key, "n"])
        return g.append_column(
            "hkey", pa.array(hash64(g[key]).astype(np.int64)))

    def merge_part(g: pa.Table) -> pa.Table:
        out = g.group_by(key).aggregate([("n", "sum")])
        out = out.rename_columns([key, "n"])
        return out.filter(pc.greater(out["n"], 1))

    key_type = ds.schema().base_schema.field(key).type
    empty = pa.table({key: pa.array([], key_type),
                      "n": pa.array([], pa.int64())})
    return hash_shuffle_apply(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        "hkey", B, merge_part, empty)


def distinct_count_hll(ds: "ray.data.Dataset", column: str,
                       p: int = 14) -> float:
    """Approximate distinct count: one HLL partial per batch, merged on
    the driver (sketch rows are ~16 KiB each)."""
    def partial(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        arr = t[column]
        valid = pc.drop_null(arr)
        if len(valid):
            h.add_hashes(hash64(valid))
        return pa.table({"sketch": pa.array([h.serialize()], pa.binary())})

    merged = HyperLogLog(p)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        for s in b["sketch"].to_pylist():
            merged.merge(HyperLogLog.deserialize(s, p))
    return merged.estimate()


# -- referential -------------------------------------------------------------

def referential_check(ds: "ray.data.Dataset", column: str,
                      catalog: "ray.data.Dataset | pa.Table",
                      catalog_column: str | None = None,
                      exact: bool = True):
    """Anti-join ``ds[column]`` against a catalog key set.

    Build side: the catalog column is hashed into a Bloom filter (and,
    when ``exact``, the key set) once on the driver and broadcast with
    ``ray.put`` — every probe task reads it from the object store, nothing
    is re-shipped per batch and nothing shuffles.

    Returns (dangling_rows Dataset, stats dict).
    """
    catalog_column = catalog_column or column
    if isinstance(catalog, pa.Table):
        keys = catalog[catalog_column].combine_chunks()
    else:
        keys = pa.chunked_array(
            [b[catalog_column] for b in
             catalog.iter_batches(batch_format="pyarrow")]).combine_chunks()
    bloom = BloomFilter(max(64, len(keys)), fpp=0.001)
    bloom.add_hashes(hash64(keys))
    exact_keys = keys if exact else None
    side_ref = ray.put((bloom, exact_keys))

    def probe(t: pa.Table) -> pa.Table:
        # stateless task + broadcast: ray.get hits the local object store
        # on warm workers (no actor cold-start)
        bloom_w, exact_w = ray.get(side_ref)
        arr = t[column]
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        ok = np.zeros(t.num_rows, dtype=bool)
        if valid.any():
            h = hash64(arr)
            hit = bloom_w.contains_hashes(h)
            if exact_w is not None and hit.any():
                # exact confirm: one Arrow hash-set kernel, no Python
                hit &= pc.is_in(arr, value_set=exact_w) \
                    .to_numpy(zero_copy_only=False)
            ok = hit & valid
        return t.append_column("__ref_ok__", pa.array(ok | ~valid))

    probed = ds.map_batches(probe, batch_format="pyarrow",
                            zero_copy_batch=True)
    dangling = probed.map_batches(
        lambda t: t.filter(pc.invert(t["__ref_ok__"])).drop_columns(
            ["__ref_ok__"]),
        batch_format="pyarrow")
    return dangling


def referential_check_partitioned(ds: "ray.data.Dataset", column: str,
                                  catalog: "ray.data.Dataset",
                                  catalog_column: str | None = None,
                                  n_rows: int | None = None):
    """Anti-join for a LARGE catalog (too big to broadcast): both sides'
    keys co-locate by hash64(key) through the manual hash shuffle and
    each partition filters its probe keys against its catalog keys with
    one Arrow is_in. Returns the dangling (key, n) rows. Use
    :func:`referential_check` when the catalog fits a broadcast."""
    from .shuffle import hash_shuffle_apply

    catalog_column = catalog_column or column
    if n_rows is None:
        n_rows = ds.count()
    from .shuffle import coarse_buckets

    B = coarse_buckets(n_rows)
    key_type = ds.schema().base_schema.field(column).type

    def probe_rows(t: pa.Table) -> pa.Table:
        g = t.select([column]).group_by(column).aggregate([([], "count_all")])
        g = g.rename_columns(["key", "n"])
        g = g.filter(pc.is_valid(g["key"]))
        return pa.table({
            "hkey": pa.array(hash64(g["key"]).astype(np.int64)),
            "key": g["key"],
            "n": g["n"],
            "side": pa.array(np.zeros(g.num_rows, dtype=np.int8))})

    def catalog_rows(t: pa.Table) -> pa.Table:
        keys = pc.unique(t[catalog_column].combine_chunks()
                         if isinstance(t[catalog_column], pa.ChunkedArray)
                         else t[catalog_column])
        keys = keys.filter(pc.is_valid(keys))
        keys = pc.cast(keys, key_type)
        return pa.table({
            "hkey": pa.array(hash64(keys).astype(np.int64)),
            "key": keys,
            "n": pa.array(np.zeros(len(keys), dtype=np.int64)),
            "side": pa.array(np.ones(len(keys), dtype=np.int8))})

    tagged = ds.map_batches(probe_rows, batch_format="pyarrow",
                            zero_copy_batch=True).union(
        catalog.map_batches(catalog_rows, batch_format="pyarrow",
                            zero_copy_batch=True))
    empty = pa.table({"key": pa.array([], key_type),
                      "n": pa.array([], pa.int64())})

    def anti(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy(zero_copy_only=False)
        probe = g.filter(pa.array(side == 0))
        cat = g.filter(pa.array(side == 1))["key"].combine_chunks()
        if probe.num_rows == 0:
            return empty
        agg = probe.group_by("key").aggregate([("n", "sum")])
        agg = agg.rename_columns(["key", "n"])
        if len(cat):
            agg = agg.filter(pc.invert(pc.is_in(agg["key"],
                                                value_set=cat)))
        return agg

    return hash_shuffle_apply(tagged, "hkey", B, anti, empty)


# -- drift -------------------------------------------------------------------

def quantile_sketch_of(ds: "ray.data.Dataset", column: str,
                       kind: str = "kll", k: int = 200):
    """Merged quantile sketch of a numeric column (per-batch partials →
    one tiny driver-side merge). ``kind``: "kll" (uniform rank error) or
    "tdigest" (tail-accurate, Dunning scale function)."""
    from ..state.sketches import TDigest

    def make():
        return KLLSketch(k) if kind == "kll" else TDigest(k // 2)

    def partial(t: pa.Table) -> pa.Table:
        import pickle

        sk = make()
        arr = pc.drop_null(t[column])
        if len(arr):
            sk.add_values(arr.to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([pickle.dumps(sk)], pa.binary())})

    import pickle

    merged = make()
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
               .iter_batches(batch_format="pyarrow"):
        for s in b["sketch"].to_pylist():
            merged.merge(pickle.loads(s))
    return merged


def kll_sketch_of(ds: "ray.data.Dataset", column: str,
                  k: int = 200) -> KLLSketch:
    """Merged KLL sketch of a numeric column (per-batch partials)."""
    return quantile_sketch_of(ds, column, kind="kll", k=k)


def drift_check(ds_current: "ray.data.Dataset",
                ds_baseline: "ray.data.Dataset", column: str,
                quantiles=(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99),
                threshold: float = 0.1, sketch: str = "kll") -> dict:
    """Quantile-vector drift between two datasets on one column.

    Reports per-quantile values and a normalized max-shift score
    (|Δq| / IQR of the baseline); ``drifted`` when the score exceeds
    ``threshold``. ``sketch`` picks the quantile sketch ("kll" or
    "tdigest" — the latter for tail-sensitive drift)."""
    cur = quantile_sketch_of(ds_current, column,
                             kind=sketch).quantiles(list(quantiles))
    base = quantile_sketch_of(ds_baseline, column,
                              kind=sketch).quantiles(list(quantiles))
    iqr = max(base[-2] - base[1], 1e-12) if len(base) > 2 else 1.0
    score = float(np.max(np.abs(cur - base)) / iqr)
    return {
        "column": column,
        "quantiles": list(quantiles),
        "current": [float(x) for x in cur],
        "baseline": [float(x) for x in base],
        "max_shift_iqr": score,
        "drifted": bool(score > threshold),
    }


# -- column stats ------------------------------------------------------------

def column_stats(ds: "ray.data.Dataset", columns: list[str]) -> pa.Table:
    """Exact per-column stats (n, nulls, min, max, mean, std) via
    mergeable per-batch partials — no shuffle, one tiny reduce."""
    def partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [], "min": [], "max": [],
                "sum": [], "sumsq": []}
        for c in columns:
            arr = t[c]
            nn = pc.drop_null(arr)
            x = nn.to_numpy(zero_copy_only=False).astype(np.float64) \
                if len(nn) else np.zeros(0)
            rows["column"].append(c)
            rows["n"].append(len(arr))
            rows["nulls"].append(len(arr) - len(nn))
            rows["min"].append(float(x.min()) if len(x) else np.nan)
            rows["max"].append(float(x.max()) if len(x) else np.nan)
            rows["sum"].append(float(x.sum()))
            rows["sumsq"].append(float((x * x).sum()))
        return pa.table(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_pandas()
    g = parts.groupby("column").agg(
        n=("n", "sum"), nulls=("nulls", "sum"), min=("min", "min"),
        max=("max", "max"), sum=("sum", "sum"), sumsq=("sumsq", "sum"))
    g["mean"] = g["sum"] / (g["n"] - g["nulls"]).clip(lower=1)
    var = g["sumsq"] / (g["n"] - g["nulls"]).clip(lower=1) - g["mean"] ** 2
    g["std"] = np.sqrt(var.clip(lower=0))
    return pa.Table.from_pandas(g.reset_index()[
        ["column", "n", "nulls", "min", "max", "mean", "std"]])
