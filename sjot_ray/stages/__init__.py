"""Ray Data stage callables (actor pools + per-worker-cached tasks)."""

from .validate import (
    ValidateInterleavedDocs,
    ValidateJsonColumn,
    make_validate_fn,
    violations_view,
)

__all__ = ["ValidateInterleavedDocs", "ValidateJsonColumn",
           "make_validate_fn", "violations_view"]
