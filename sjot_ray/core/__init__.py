"""Core SJOT semantics: schema parsing/compilation, validation walker,
schema admission. Pure Python, no Ray dependency — this layer is the
single source of truth for conformance; the distributed engine
(`sjot_ray.columnar`, `sjot_ray.pipelines`) builds on it."""

from .check import check, check_satisfiable
from .errors import SJOTSchemaError, SJOTValidationError
from .validator import (
    Context,
    default_value,
    extend_type,
    is_union,
    reftype,
    roottype,
    valid,
    validate,
    validate_value,
)


class SJOT:
    """Facade mirroring the reference's public API surface
    (``SJOT.validate`` / ``SJOT.valid`` / ``SJOT.check``, index.js:28-102)."""

    validate = staticmethod(validate)
    valid = staticmethod(valid)
    check = staticmethod(check)


__all__ = [
    "SJOT",
    "SJOTSchemaError",
    "SJOTValidationError",
    "Context",
    "check",
    "check_satisfiable",
    "default_value",
    "extend_type",
    "is_union",
    "reftype",
    "roottype",
    "valid",
    "validate",
    "validate_value",
]
