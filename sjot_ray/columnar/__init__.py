"""Vectorized Arrow predicate compilation for table-shaped SJOT schemas."""

from .table_validator import ColumnarCompileError, Rule, TableValidator

__all__ = ["TableValidator", "ColumnarCompileError", "Rule"]
