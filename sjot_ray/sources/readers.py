"""Corpus readers: one entry point per storage format, all returning a
column-pruned ``ray.data.Dataset`` with input-proportional block counts.

BASELINE.json's input hint names a Lance corpus. ``pylance`` is not
installable in this sandbox (no network; verified in rounds 1-2), so the
Lance path is import-gated: when the package is present,
``read_corpus_table(..., format="lance")`` goes straight to
``ray.data.read_lance`` with the same column pruning; otherwise it raises
with the documented substitution (Parquet carries the identical schema
and the same pruned-scan semantics). Everything downstream is
format-agnostic — pipelines see only the Dataset.
"""

from __future__ import annotations

import os

import ray
import ray.data


def _default_blocks(path: str) -> int | None:
    """One block per shard file for directories (Ray's splitter otherwise
    targets ~200 blocks regardless of size — measured 2.7× wall cost);
    None lets single files use the row-proportional caller default."""
    if os.path.isdir(path):
        n = sum(1 for f in os.listdir(path)
                if f.endswith((".parquet", ".lance", ".json", ".csv")))
        return max(1, n)
    return None


def read_corpus_table(path: str, columns: list[str] | None = None,
                      format: str = "parquet",
                      override_num_blocks: int | None = None
                      ) -> "ray.data.Dataset":
    """Read an interleaved-document corpus table (the BASELINE.json
    input_hint shape) from ``path`` in the given format."""
    if override_num_blocks is None:
        override_num_blocks = _default_blocks(path)
    kw = {}
    if override_num_blocks:
        kw["override_num_blocks"] = override_num_blocks
    if format == "parquet":
        return ray.data.read_parquet(path, columns=columns, **kw)
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "Lance input requested but pylance is not installed in "
                "this environment (no network to install it — verified); "
                "the corpus is materialized as Parquet with the identical "
                "schema and pruned-scan semantics. Pass format='parquet'."
            ) from e
        return ray.data.read_lance(path, columns=columns, **kw)
    if format == "json":
        ds = ray.data.read_json(path, **kw)
    elif format == "csv":
        ds = ray.data.read_csv(path, **kw)
    else:
        raise ValueError(f"unknown corpus format {format!r}")
    return ds.select_columns(columns) if columns else ds


def write_corpus_table(ds: "ray.data.Dataset", path: str,
                       format: str = "parquet") -> None:
    """Partitioned write (one file per block — resumable layout)."""
    if format == "parquet":
        ds.write_parquet(path)
        return
    if format == "lance":
        try:
            import lance  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "Lance output requested but pylance is not installed; "
                "use format='parquet' (identical schema/layout semantics)."
            ) from e
        ds.write_lance(path)
        return
    raise ValueError(f"unknown corpus format {format!r}")
