"""Deterministic corpus generation and IO helpers."""

from .gen import (
    FLAGSHIP_SCHEMA,
    generate_interleaved,
    interleaved_parquet,
    media_catalog,
)

__all__ = ["FLAGSHIP_SCHEMA", "generate_interleaved", "interleaved_parquet",
           "media_catalog"]
