"""sjot_ray — a Ray-Data-native schema + constraint validation engine with
the query/data-processing capabilities of Genivia/SJOT.

Layers:

* ``sjot_ray.core`` — full-fidelity SJOT semantics (validate/valid/check,
  mutation/normalization, unions, satisfiability), pure Python, compiled
  once per schema. The conformance oracle for everything above it.
* ``sjot_ray.columnar`` — vectorized Arrow predicate compiler for
  table-shaped schemas (the hot path inside ``map_batches``).
* ``sjot_ray.stages`` — Ray Data stage callables (validator actor pools,
  normalizers, JSON decode).
* ``sjot_ray.state`` — mergeable sketches (HyperLogLog, Bloom, KLL,
  MinHash/SimHash) for the wide table-level checks.
* ``sjot_ray.pipelines`` — end-to-end Dataset pipelines: flagship
  interleaved-document validation, uniqueness/referential/drift checks,
  dedup family, similarity search, text analysis.
* ``sjot_ray.sources`` — deterministic interleaved-corpus generator and
  parquet IO helpers.
"""

from .core import SJOT, SJOTSchemaError, SJOTValidationError, check, valid, validate

__version__ = "0.3.0"

__all__ = [
    "SJOT",
    "SJOTSchemaError",
    "SJOTValidationError",
    "check",
    "valid",
    "validate",
    "__version__",
]
