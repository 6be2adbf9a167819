"""Compile an SJOT object schema against an Arrow table shape into
vectorized per-column predicate kernels.

This is the engine's hot path: where the reference walks one parsed JSON
document at a time re-parsing type strings as it goes
(/root/reference/index.js:109-757), we compile the schema ONCE on the
driver into an ordered list of :class:`Rule` objects — each rule evaluates
one constraint over a whole Arrow batch with ``pyarrow.compute`` / numpy
kernels — and reproduce the reference's **first-error-wins** semantics by
selecting, per row, the violation with the smallest (property-order,
item-index, item-rule-order) key. Verdicts, violation rows (datapath /
typepath / what / value_repr in the reference's diagnostic format) and the
normalized output (defaults injected — SURVEY.md §1.3) all come out of one
pass over the batch.

Supported shapes (everything the interleaved-document corpus and the
TPC-H-ish tables need): object-of-{primitive, list<primitive>,
list<struct<primitive…>>} with required/optional properties, defaults,
numeric ranges/enums, sized ints (incl. the long=±2^47 quirk), string
formats/regexes, length bounds, sets (uniqueness inside a list),
``@one/@any/@all/@dep`` propsets, ``@final`` (via an unknown-keys capture
column), depth-1 unions over scalar columns (scalar columns: the n==1 try-each-branch loop; LIST columns and
nested list fields: the reference's per-depth dispatch with full
container-branch validation — set-dup, bounds, first failing item;
OBJECT payloads over struct and map layouts: the full object dispatch —
the wildcard/empty ``object`` slot, ``@if/@then`` discriminator triples
in declaration order, and multi-branch first-data-prop-names-a-branch
selection, each distinct target compiled to an embedded sub-validator),
tuple types over list columns AND over tuple-typed fields inside nested
structs (positional rules selected by item index, reference
index.js:240-254), nested struct objects to any depth
(rules over struct child arrays masked by enclosing-struct validity,
with runtime ``@final`` against the struct's physical fields and
recursive default injection in ``normalize_batch``), list/set fields
inside item objects and nested structs (first-failing-item reduction
over a second-level flatten), OBJECT, UNION and TUPLE fields inside
item objects (the nested compilers rebased onto the flattened child
table, sharing the item's ordering major),
propset/@dep presence that counts valid-default optionals declared
earlier as present (the reference injects them before checking,
index.js:429-433), and regex property names over Arrow map
columns (per-entry rules on the flattened key/value table,
index.js:388-405), over struct layouts at any nesting depth
(matching fields discovered per batch from the struct's Arrow type,
first-failing-field-wins in field order = the reference's
data-iteration order), AND at ROOT level — a typed table's document
properties are its columns, so matching props are discovered per
batch from the batch's column names (plain-scalar, char-length,
container, object and — via per-column row-engine rules — union /
tuple / deep value types).

Positions whose types are beyond the vectorized kernels (triply-nested
containers, union branches mixing container/object/tuple payloads,
non-scalar map values, exotic item-field types, …) DEGRADE to one
generic dyn rule that validates just that column/field per row through
the row engine — the rest of the schema stays columnar, and the
violation rows/ordering are exactly the reference's because the row
engine produces them. NON-OBJECT roots (scalar / container / union /
``any``) compile too when the caller names the single document column
(``value_column=``): the per-position machinery validates that column
and datapaths render with the reference's root ``$`` prefix; null
cells are the null DOCUMENT (row-engine verdict, computed once per
batch). :class:`ColumnarCompileError` is reserved for the genuinely
untypeable input — a non-object root with NO ``value_column`` (a
table cannot say which column holds the document; callers fall back
to the row engine, ``sjot_ray.stages``); no evaluation path raises
inside a Ray worker. MAP-layout targets are owned by row-engine catch-all
rules whenever the object type exceeds the vectorized map companions
(scalar prop values + @final) — propsets/@dep, regex props and
non-scalar prop values all route map rows through the row engine with
every struct-path rule gated inert on map targets. Schema–table SHAPE
mismatches (a container type over a scalar column, a scalar type over a
list column, object types over map vs struct layouts) produce the row
engine's verdicts via per-family shape rules, including the reference's
type dualities: ``char[n,m]`` is a string-length check for string data
but an array-of-char for list data, the number branch range-scans any
type string, and map columns carry object data. Embedded ``@sjot``
under a TOP-LEVEL ``any``-typed column IS interpreted: carrier rows
(struct field / map key "@sjot") are detected per batch and routed
through the row engine inside the same pass, so mixed corpora stay on
the fast path (``any`` fields nested deeper remain uninterpreted — use
``ValidateJsonColumn`` for those). Mismatch diagnostics may differ
from the row engine in ``what`` labels (verdicts always agree —
fuzz-verified across shape matrices).

Arrow-null semantics (documented design choice): a null column value ≡ an
absent JSON property. Required-prop nulls report "should be present";
optional-prop nulls are deleted/defaulted exactly like absent props. This
matches the reference for optionals (index.js:425 treats explicit null
like absence) and collapses the present-null vs absent distinction for
required props, which Arrow cannot represent.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.errors import SJOTSchemaError
from ..core.jsutil import js_string
from ..core.ranges import compile_bounds, compile_range
from ..core.validator import (
    _INT_BOUNDS,
    _NUMERIC_TYPES,
    FORMAT_PATTERNS,
    default_value,
    extend_type,
    is_union,
    reftype,
    roottype,
)

# first-error ordering: key = (major << 38) | (item_idx << 12) | minor
_MINOR_BITS = 12
_ITEM_BITS = 26
_KEY_INF = np.iinfo(np.int64).max


def _is_container_type(rt: str) -> bool:
    """True for list/set type strings. ``char…]`` whose FIRST "]" is the
    last character is the reference's string-length type, not a list
    (index.js: ``type.startsWith("char") && type.indexOf("]") ===
    type.length - 1``); ``char[2,4][]`` etc. are real containers."""
    if not (rt.endswith("]") or rt.endswith("}")):
        return False
    return not (rt.startswith("char") and rt.find("]") == len(rt) - 1)


def _is_scalar_str_type(rt) -> bool:
    return isinstance(rt, str) and not _is_container_type(rt)


def _is_listish(dt) -> bool:
    return (pa.types.is_list(dt) or pa.types.is_large_list(dt)
            or pa.types.is_fixed_size_list(dt) or pa.types.is_map(dt))


def _is_list_type(dt) -> bool:
    """List-shaped for ARRAY semantics — excludes maps, which carry
    OBJECT data (a map column against an array type is 'not an array')."""
    return (pa.types.is_list(dt) or pa.types.is_large_list(dt)
            or pa.types.is_fixed_size_list(dt))


def _char_len_scalar_eval(arr, rt, extra_valid=None):
    """(fail, values) for a char[n,m] rule over ANY column type. String
    columns get the length check (values = lengths). Any other type is a
    schema-table mismatch: every valid value fails (the reference labels
    those what="value"; this dedicated rule keeps its static "length"
    label — a documented diagnostic approximation for mismatched
    columns, with the verdict exact either way)."""
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        valid = _valid_mask(arr)
        if extra_valid is not None:
            valid = valid & extra_valid
        lengths = np.where(valid, _np(pc.utf8_length(arr)), 0) \
            .astype(np.int64)
        return _length_fail_mask(lengths, valid,
                                 compile_bounds(rt, 5)), lengths
    if _is_list_type(arr.type):
        # reference duality: ARRAY data against "char[n,m]" is an array
        # of "char" items with [n,m] length bounds (index.js:262-276)
        valid = _valid_mask(arr)
        if extra_valid is not None:
            valid = valid & extra_valid
        lengths = np.where(valid,
                           np.nan_to_num(_np(pc.list_value_length(arr))),
                           0).astype(np.int64)
        fail = _length_fail_mask(lengths, valid, compile_bounds(rt, 5))
        item_fail, _ = _list_item_first_fail(arr, "char", valid, [{}], {})
        return fail | (item_fail & valid), lengths
    fail = _scalar_fail_mask(arr, rt)
    if extra_valid is not None:
        fail = fail & extra_valid
    return fail, arr


def _is_char_len_type(rt) -> bool:
    """char[n,m] string-length types: violations report what="length"
    with the actual length as the datum (index.js:920-966)."""
    return isinstance(rt, str) and rt.startswith("char[") \
        and rt != "char[]" and rt.find("]") == len(rt) - 1


class ColumnarCompileError(Exception):
    """Schema shape not expressible as vectorized column kernels."""


@dataclass
class Rule:
    major: int
    minor: int
    prop: str                 # top-level column this rule reads
    typepath: str
    what: str                 # "value" | "length" | "should be present" | …
    type_repr: str            # the type expression for the message
    child: bool = False       # evaluated on the flattened item table
    no_value: bool = False    # message carries no value (propset style)
    field_name: str | None = None   # item-struct field (for datapath)
    list_col: str | None = None     # owning list column for child rules
    inner: bool = False       # rule on items of a NESTED list field; the
    # ev returns (mask, (flat_items, value_idx, inner_pos)) and the
    # datapath gains the inner [i] suffix
    map_entry: bool = False   # child rule on a map column's entries; ev
    # returns (mask, (keys, values)) and the datapath is $.col.<key>
    const_repr: str | None = None   # absent-optional-with-invalid-default
    # rules: the violation fields are compile-time constants
    dyn: bool = False         # per-row dynamic diagnostics; ev returns
    # (mask, (datapaths, value_reprs)) object ndarrays filled for
    # failing rows (regex property names over nested struct fields —
    # matching FIELDS are only known from the batch's Arrow schema)

    def key_base(self) -> int:
        return (self.major << (_ITEM_BITS + _MINOR_BITS)) | self.minor


def _np(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def _valid_mask(arr) -> np.ndarray:
    return _np(pc.is_valid(arr))


def _fullmatch_mask(arr, pattern: str) -> np.ndarray:
    """True where a non-null value FAILS the JS-anchored regex
    (``RegExp("^" + pattern + "$")`` — CONCATENATED anchors, split by
    top-level alternation). RE2 via pyarrow (its ``$`` is already
    text-end); Python fallback only when RE2 rejects the pattern."""
    from ..core.validator import js_regex_to_py

    valid = _valid_mask(arr)
    try:
        anchored = "^" + js_regex_to_py(pattern, dollar="$") + "$"
        m = pc.match_substring_regex(arr, anchored)
        ok = np.where(valid, _np(m), False).astype(bool)
        return valid & ~ok
    except (pa.ArrowInvalid, re.error):
        from ..core.validator import compile_regex_type

        rx = compile_regex_type(pattern)
        out = np.zeros(len(arr), dtype=bool)
        for i, v in enumerate(arr.to_pylist()):
            if v is not None and rx.fullmatch(v) is None:
                out[i] = True
        return out


def _num_fail_mask(arr, type_str: str) -> np.ndarray:
    """Fail mask for one numeric type expression over a numeric column."""
    valid = _valid_mask(arr)
    x = np.where(valid, _np(pc.cast(arr, pa.float64(), safe=False)), 0.0)
    if pa.types.is_floating(arr.type):
        isfloat = valid & (x != np.floor(x))
    else:
        isfloat = np.zeros(len(x), dtype=bool)

    if type_str in ("number", "float", "double", "atom"):
        ok = np.ones(len(x), dtype=bool)
    elif type_str == "integer":
        ok = ~isfloat
    elif type_str in _INT_BOUNDS:
        lo, hi = _INT_BOUNDS[type_str]
        ok = (x >= lo) & (x <= hi) & ~isfloat
    else:
        alts = compile_range(type_str)
        ok = np.zeros(len(x), dtype=bool)
        # a float hitting an int-lexical alternative aborts the whole scan
        # (reference `break`, index.js:566-573): floats may only match
        # alternatives BEFORE the first int-lexical one
        float_dead = False
        for a in alts:
            if a.kind == 0:      # ..m
                m = (x < a.hi) if a.hi_excl else (x <= a.hi)
                intish = not a.hi_dot
            elif a.kind == 1:    # n..
                m = (x > a.lo) if a.lo_excl else (x >= a.lo)
                intish = not a.lo_dot
            elif a.kind == 2:    # n..m
                lo_ok = (x > a.lo) if a.lo_excl else (x >= a.lo)
                hi_ok = (x < a.hi) if a.hi_excl else (x <= a.hi)
                m = lo_ok & hi_ok
                intish = not (a.lo_dot and a.hi_dot)
            else:                # const
                m = x == a.lo
                intish = not a.lo_dot
            if intish or float_dead:
                m = m & ~isfloat
            ok |= m
            if intish:
                float_dead = True
    return valid & ~ok


def _bool_fail_mask(arr, type_str: str) -> np.ndarray:
    valid = _valid_mask(arr)
    x = np.where(valid, _np(arr), False).astype(bool)
    if type_str in ("boolean", "atom"):
        ok = np.ones(len(x), dtype=bool)
    elif type_str == "true":
        ok = x
    elif type_str == "false":
        ok = ~x
    else:
        ok = np.zeros(len(x), dtype=bool)
    return valid & ~ok


def _string_fail_mask(arr, type_str: str) -> np.ndarray:
    if type_str in ("string", "char[]", "atom"):
        return np.zeros(len(arr), dtype=bool)
    if type_str.startswith("("):
        return _fullmatch_mask(arr, type_str)
    if type_str in FORMAT_PATTERNS:
        return _fullmatch_mask(arr, FORMAT_PATTERNS[type_str])
    if type_str == "char":
        valid = _valid_mask(arr)
        lengths = np.where(valid, _np(pc.utf8_length(arr)), 1)
        return valid & (lengths != 1)
    if type_str.startswith("char["):
        valid = _valid_mask(arr)
        lengths = np.where(valid, _np(pc.utf8_length(arr)), 0)
        return _length_fail_mask(lengths, valid, compile_bounds(type_str, 5))
    if type_str.startswith("char"):
        # unknown char-prefixed type accepts any string (reference quirk,
        # index.js:679-690)
        return np.zeros(len(arr), dtype=bool)
    # any other type against a string column always fails
    return _valid_mask(arr)


def _length_fail_mask(lengths: np.ndarray, valid: np.ndarray, bounds) -> np.ndarray:
    if bounds is None:
        return np.zeros(len(lengths), dtype=bool)
    kind = bounds[0]
    ln = np.where(valid, lengths, 0)
    ok = np.ones(len(ln), dtype=bool)
    if kind == "exact":
        ok = (ln == bounds[1]) if not math.isnan(bounds[1]) \
            else np.zeros(len(ln), bool)
    elif kind == "min":
        if not math.isnan(bounds[1]):
            ok = ~(ln < bounds[1])
    elif kind == "max":
        if not math.isnan(bounds[1]):
            ok = ~(ln > bounds[1])
    else:
        if not math.isnan(bounds[1]):
            ok &= ~(ln < bounds[1])
        if not math.isnan(bounds[2]):
            ok &= ~(ln > bounds[2])
    return valid & ~ok


def _scalar_kind_of_arrow(dtype: pa.DataType) -> str | None:
    if pa.types.is_boolean(dtype):
        return "boolean"
    if pa.types.is_integer(dtype) or pa.types.is_floating(dtype) or \
            pa.types.is_decimal(dtype):
        return "number"
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "string"
    if pa.types.is_null(dtype):
        return "null"
    return None


def _scalar_fail_mask(arr, type_str: str) -> np.ndarray:
    """Fail mask for a scalar SJOT type over a scalar Arrow column. Nulls
    never fail here — presence is a separate rule."""
    kind = _scalar_kind_of_arrow(arr.type)
    if type_str == "any":
        return np.zeros(len(arr), dtype=bool)
    if type_str == "atom":
        # atom = bool ∨ number ∨ string (index.js:466,477,668): null
        # data and ARRAY/OBJECT data (kind None — list/struct/map
        # columns) are not atoms
        return np.zeros(len(arr), dtype=bool) \
            if kind in ("boolean", "number", "string") else _valid_mask(arr)
    if type_str == "null":
        return _valid_mask(arr)
    if type_str in ("object", "array"):
        return _valid_mask(arr)  # scalar columns never hold objects/arrays
    if kind == "number":
        # the reference's number branch range-scans ANY type string
        # (comma-split pieces through parseFloat — so 4 IS valid against
        # "char[2,4]" or "string[2,4]"); compile_range reproduces that
        # parse, the row engine relies on it, and parity requires the
        # columnar kernel to do the same
        try:
            return _num_fail_mask(arr, type_str)
        except SJOTSchemaError:
            return _valid_mask(arr)
    if kind == "string":
        return _string_fail_mask(arr, type_str)
    if kind == "boolean":
        return _bool_fail_mask(arr, type_str)
    if kind == "null":
        return np.zeros(len(arr), dtype=bool)
    # container/other Arrow types against a scalar SJOT type: every valid
    # value fails (reference: array/object data vs a scalar type is a
    # "value" error) — never a runtime error inside a Ray worker
    return _valid_mask(arr)


def _set_dup_mask(arr) -> np.ndarray:
    """Per-row duplicate detection inside a list column (set semantics:
    duplicates by JS strict equality after String()-sort, index.js:294-299).
    Vectorized via lexsort on (parent, String(value))."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if not _is_list_type(arr.type):  # shape mismatch handled by shape rule
        return np.zeros(n, dtype=bool)
    vt = arr.type.value_type
    if _is_listish(vt) or pa.types.is_struct(vt):
        # set members that are ARRAYS/OBJECTS: JS strict equality never
        # holds between distinct references (index.js dedup uses ===),
        # so only NULL members (null === null) can duplicate —
        # String()-equality would falsely flag equal-content lists
        valid = _valid_mask(arr)
        lengths = np.where(valid, np.nan_to_num(
            _np(pc.list_value_length(arr))), 0).astype(np.int64)
        parent = np.repeat(np.arange(n), lengths)
        out = np.zeros(n, dtype=bool)
        if len(parent):
            fvalid = _valid_mask(arr.flatten())
            nulls_per_row = np.bincount(parent[~fvalid], minlength=n)
            out = nulls_per_row >= 2
        return out
    valid = _valid_mask(arr)
    lengths = np.where(valid, _np(pc.list_value_length(arr)), 0).astype(np.int64)
    parent = np.repeat(np.arange(n), lengths)
    out = np.zeros(n, dtype=bool)
    if len(parent) == 0:
        return out
    flat = arr.flatten()
    vals = np.asarray([js_string(v) for v in flat.to_pylist()], dtype=object)
    order = np.lexsort((vals, parent))
    p_s, v_s = parent[order], vals[order]
    dup = (p_s[1:] == p_s[:-1]) & (v_s[1:] == v_s[:-1])
    out[np.unique(p_s[1:][dup])] = True
    return out


_PSET_WORD = {"@one": "one of", "@any": "any of", "@all": "all or none of"}


def _presence(tbl, name) -> np.ndarray:
    if name not in tbl.column_names:
        return np.zeros(tbl.num_rows, dtype=bool)
    return _valid_mask(tbl[name])


def _nested_field(tbl, path):
    """Resolve a (col, field, field, …) path through struct columns.

    Returns ``(field_array | None, parent_valid)`` where ``parent_valid``
    is the AND of the validity of every enclosing struct — children of a
    null struct may hold arbitrary buffer values in Arrow, so every
    nested fail mask must be ANDed with it."""
    name = path[0]
    if name not in tbl.column_names:
        return None, np.zeros(tbl.num_rows, dtype=bool)
    arr = tbl[name]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    parent_valid = np.ones(tbl.num_rows, dtype=bool)
    for f in path[1:]:
        parent_valid = parent_valid & _valid_mask(arr)
        if not pa.types.is_struct(arr.type):
            return None, np.zeros(tbl.num_rows, dtype=bool)
        i = arr.type.get_field_index(f)
        if i < 0:
            return None, parent_valid
        arr = arr.field(i)
    return arr, parent_valid


def _map_entries_of(tbl, col):
    """Map column → (keys, values, parent_row, row_valid) or None."""
    if col not in tbl.column_names:
        return None
    arr = tbl[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_map(arr.type):
        return None
    lst = arr.cast(pa.list_(pa.struct(
        [("key", arr.type.key_type), ("value", arr.type.item_type)])))
    valid = _valid_mask(lst)
    lengths = np.where(valid, np.nan_to_num(_np(pc.list_value_length(lst))),
                       0).astype(np.int64)
    flat = lst.flatten()
    parent = np.repeat(np.arange(len(lst)), lengths)
    return flat.field("key"), flat.field("value"), parent, valid


def _map_entry_presence(tbl, col, key_name):
    """(has_key per row, map-column validity per row); zeros when the
    column is absent or not a map."""
    zeros = np.zeros(tbl.num_rows, dtype=bool)
    e = _map_entries_of(tbl, col)
    if e is None:
        return zeros, zeros
    keys, _vals, parent, valid = e
    m = _np(pc.fill_null(pc.equal(keys, key_name), False)).astype(bool)
    has = np.zeros(tbl.num_rows, dtype=bool)
    has[parent[m]] = True
    return has, valid


def _map_key_gather(tbl, col, key_name):
    """(present bool[n], per-row value array aligned to the table) for
    one key of a map column. ``present`` is KEY presence (a null-valued
    entry is still present — map entries keep the explicit-null
    distinction); absent rows hold null in the value array."""
    e = _map_entries_of(tbl, col)
    if e is None:
        return None, None
    keys, vals, parent, valid = e
    n = tbl.num_rows
    m = _np(pc.fill_null(pc.equal(keys, key_name), False)).astype(bool)
    present = np.zeros(n, dtype=bool)
    present[parent[m]] = True
    present &= valid
    mm = np.nonzero(m)[0]
    if len(mm) == 0:
        return present, pa.nulls(n, vals.type)
    idx = np.full(n, -1, dtype=np.int64)
    p = parent[mm]
    up, first = np.unique(p, return_index=True)
    idx[up] = mm[first]
    vals_al = vals.take(pa.array(np.where(idx >= 0, idx, 0), pa.int64()))
    vals_al = pc.if_else(pa.array(idx >= 0), vals_al,
                         pa.nulls(n, vals.type))
    return present, vals_al


def _struct_items_ok(child_tbl):
    """Valid STRUCT items only: map-typed items are owned by the item
    object's row-engine catch-all rule, so field-presence-based rules
    must stay inert on them."""
    items = child_tbl["__item__"]
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    if not pa.types.is_struct(items.type):
        return np.zeros(child_tbl.num_rows, dtype=bool)
    return _valid_mask(items)


def _nested_presence(tbl, path):
    arr, parent_valid = _nested_field(tbl, path)
    if arr is None:
        return np.zeros(tbl.num_rows, dtype=bool)
    return parent_valid & _valid_mask(arr)


def _py_doc(v):
    """Arrow ``as_py`` cell → JSON value under the engine's conventions:
    struct-layout null fields ≡ absent (dropped recursively), map cells
    (lists of (key, value) tuples) become dicts, list items stay."""
    if isinstance(v, list) and v and isinstance(v[0], tuple) \
            and len(v[0]) == 2:
        return {k: _py_doc(x) for k, x in v}
    if isinstance(v, dict):
        return {k: _py_doc(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_py_doc(x) for x in v]
    return v


def _pset_fail(kind, present_list, n):
    count = np.sum(present_list, axis=0) if present_list else np.zeros(n)
    if kind == "@one":
        return count != 1
    if kind == "@any":
        return count == 0
    return (count > 0) & (count < len(present_list))


class TableValidator:
    """Compiled, reusable batch validator: one SJOT object schema over one
    Arrow table shape. Build once (driver or actor ``__init__``), call
    :meth:`validate_batch` per batch."""

    def __init__(self, schema, type_=None, extras_column: str | None = None,
                 value_column: str | None = None):
        sjots = schema if isinstance(schema, list) else [schema]
        self.sjots = sjots
        self.sjot = sjots[0]
        typepath = "/@root"
        orig_t = type_ if type_ is not None else roottype(self.sjot)
        t = orig_t
        while isinstance(t, str) and "#" in t and not t.startswith("(") \
                and not t.endswith("]") and not t.endswith("}"):
            typepath = f"{typepath}/{t}"
            t = reftype(sjots, t, self.sjot)
        self.extras_column = extras_column
        self.root_type = t
        self.root_typepath = typepath
        self.root_value_column: str | None = None
        self._major = -1
        self.rules: list[tuple[Rule, object]] = []
        if not isinstance(t, dict):
            # NON-OBJECT roots (scalar / container / union / any): the
            # document IS the cell value of ONE caller-named column —
            # over a table there is no other meaning, so without
            # ``value_column`` the input is genuinely untypeable and we
            # keep the compile-time raise (callers fall back to the row
            # engine). With it, the per-position machinery compiles the
            # column like any prop value; datapaths render with the
            # synthetic "$.<col>" prefix stripped back to "$" (the
            # reference's root datapath).
            if value_column is None:
                raise ColumnarCompileError(
                    "table validation requires an object root type"
                    " (pass value_column=<col> to validate a non-object"
                    " root over that single column)")
            self.root_value_column = value_column
            self._compile_root_value(orig_t, t, value_column, typepath)
            return
        self._compile_object(t, typepath)

    def _compile_root_value(self, orig_t, rt, vc, typepath):
        """Compile a non-object root type over the single document
        column ``vc``. Null cells are the NULL DOCUMENT (not an absent
        property): their verdict is the row engine's on ``None`` —
        computed once per batch, it is the same for every null row."""
        from ..core import Context, SJOTValidationError
        from ..core.validator import validate_value

        sjots, sjot = self.sjots, self.sjot
        major = self._next_major()
        r_null = Rule(major, 0, vc, typepath, "value", "", dyn=True)

        def ev_null(tbl, vc=vc, orig_t=orig_t, tp=typepath):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if vc not in tbl.column_names:
                nulls = np.ones(n, dtype=bool)
            else:
                nulls = ~_valid_mask(tbl[vc] if not isinstance(
                    tbl[vc], pa.ChunkedArray)
                    else tbl[vc].combine_chunks())
            if not nulls.any():
                return zeros, None
            try:
                validate_value(sjots, None, orig_t, sjot, f"$.{vc}",
                               "/@root", Context())
                return zeros, None           # root type accepts null
            except SJOTValidationError as e:
                row = e.violation_row()
            except SJOTSchemaError:
                return zeros, None
            paths_o = np.full(n, None, dtype=object)
            reprs_o = np.full(n, None, dtype=object)
            whats_o = np.full(n, None, dtype=object)
            tps_o = np.full(n, None, dtype=object)
            dp = row["datapath"]
            for i in np.nonzero(nulls)[0]:
                paths_o[i] = dp[2:] if dp.startswith("$.") else vc
                reprs_o[i] = row["value_repr"]
                whats_o[i] = row["what"]
                tps_o[i] = row["typepath"]
            return nulls, (paths_o, reprs_o, whats_o, tps_o)
        self._add(r_null, ev_null)

        mark = len(self.rules)
        saved_major = self._major
        try:
            major = self._next_major()
            self._compile_value_rules(vc, rt, typepath, major)
        except ColumnarCompileError:
            # beyond the vectorized kernels: per-cell row engine for the
            # document column (still never a whole-schema fallback)
            del self.rules[mark:]
            self._major = saved_major
            self._add_rowengine_value_rule([vc], rt, typepath)

    # -- compilation -------------------------------------------------------

    def _next_major(self) -> int:
        self._major += 1
        return self._major

    def _add(self, rule: Rule, ev):
        self.rules.append((rule, ev))

    def _resolve_path(self, t, typepath):
        while isinstance(t, str) and "#" in t and not t.startswith("(") \
                and not t.endswith("]") and not t.endswith("}"):
            typepath = f"{typepath}/{t}"
            t = reftype(self.sjots, t, self.sjot)
        return t, typepath

    def _compile_object(self, type_, typepath):
        if "@extends" in type_:
            extend_type(self.sjots, type_, self.sjot, typepath)
        isfinal = bool(type_.get("@final", False))

        for prop, proptype in type_.items():
            if prop.startswith("@"):
                if prop in ("@one", "@any", "@all"):
                    self._compile_propset(prop, proptype, typepath,
                                           type_)
                elif prop == "@dep":
                    self._compile_dep(proptype, typepath, type_)
                continue
            if prop.startswith("("):
                self._compile_root_regex_prop(prop, proptype, typepath)
                continue
            q = prop.find("?")
            name = prop[:q] if q != -1 else prop
            required = q == -1
            self._compile_prop(name, prop, proptype, required, typepath)

        if isfinal and self.extras_column is not None:
            major = self._next_major()
            rule = Rule(major, 0, self.extras_column, typepath + "/@final",
                        "additional property should not be present", "",
                        no_value=True)
            col = self.extras_column

            def ev(tbl, col=col):
                if col not in tbl.column_names:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                arr = tbl[col]
                valid = _valid_mask(arr)
                lengths = np.where(valid, _np(pc.list_value_length(arr)), 0).astype(np.int64)
                return valid & (lengths > 0), arr
            self._add(rule, ev)

    def _compile_root_regex_prop(self, prop, proptype, typepath):
        """Regex property name at ROOT level (reference index.js:388-405):
        a typed table's document properties ARE its columns, so matching
        props are discovered per batch by testing COLUMN NAMES against the
        pattern. Column order = data-property order, so
        first-failing-column-wins inside the one rule reproduces the
        reference's data-iteration order (row engine kind-2 entries,
        core/validator.py:967-975). Plain-scalar, char-length and
        container (list/set of scalar) value types compile — the same
        surface as the struct-layout companions this mirrors; object /
        union / doubly-nested value types stay on the row engine. The
        extras-capture column is excluded: its entries are ``@final``'s
        unknown-key surface, checked by the @final rule."""
        rt, prop_tp = self._resolve_path(proptype, f"{typepath}/{prop}")
        from ..core.validator import compile_regex_type
        matcher = compile_regex_type(prop)
        extras = self.extras_column
        sjots, sjot = self.sjots, self.sjot

        def _columns(tbl):
            for cname in tbl.column_names:
                if cname == extras or matcher.fullmatch(cname) is None:
                    continue
                farr = tbl[cname]
                if isinstance(farr, pa.ChunkedArray):
                    farr = farr.combine_chunks()
                yield cname, farr

        if isinstance(rt, str) and _is_container_type(rt):
            is_set = rt.endswith("}")
            j = rt.rfind("{" if is_set else "[")
            bounds = compile_bounds(rt, j + 1)
            itemtype, _tp = self._resolve_path(rt[:j], prop_tp)
            if not _is_scalar_str_type(itemtype):
                # doubly-nested value types: row engine per matching
                # column (position degradation, not whole-schema)
                self._add_root_regex_rowengine_rule(prop, rt, prop_tp,
                                                    _columns)
                return
            major = self._next_major()
            r = Rule(major, 0, prop, prop_tp, "value", rt, dyn=True)

            def ev(tbl, rt=rt, itemtype=itemtype, is_set=is_set,
                   bounds=bounds):
                n = tbl.num_rows
                fail = np.zeros(n, dtype=bool)
                whats = np.full(n, None, dtype=object)
                reprs = np.full(n, None, dtype=object)
                paths = np.full(n, None, dtype=object)
                for cname, farr in _columns(tbl):
                    if not _is_list_type(farr.type):
                        ff = _scalar_fail_mask(farr, rt)
                        for i in np.nonzero(ff & ~fail)[0]:
                            v = farr[int(i)].as_py()
                            whats[i] = "value"
                            reprs[i] = js_string(v) \
                                if not isinstance(v, (dict, list)) else ""
                            paths[i] = cname
                        fail |= ff
                        continue
                    fvalid = _valid_mask(farr)
                    ffail = np.zeros(n, dtype=bool)
                    if is_set:
                        dup = _set_dup_mask(farr) & fvalid
                        for i in np.nonzero(dup & ~fail)[0]:
                            whats[i], reprs[i], paths[i] = "value", "", cname
                        ffail |= dup
                    if bounds is not None:
                        lengths = np.where(fvalid, np.nan_to_num(
                            _np(pc.list_value_length(farr))),
                            0).astype(np.int64)
                        lf = _length_fail_mask(lengths, fvalid, bounds) \
                            & fvalid & ~ffail
                        for i in np.nonzero(lf & ~fail)[0]:
                            whats[i] = "length"
                            paths[i] = cname
                            reprs[i] = str(int(lengths[i]))
                        ffail |= lf
                    sarr = _sort_sets(farr) if is_set else farr
                    ifail, ival = _list_item_first_fail(
                        sarr, itemtype, fvalid, sjots, sjot)
                    ifail = ifail & ~ffail
                    if ifail.any() and ival is not None:
                        flat, vidx, fpos = ival[0], ival[1], ival[2]
                        iwhats = ival[3] if len(ival) > 3 else None
                        for i in np.nonzero(ifail & ~fail)[0]:
                            paths[i] = f"{cname}[{int(fpos[i])}]"
                            whats[i] = str(iwhats[int(vidx[i])]) \
                                if iwhats is not None else "value"
                            if isinstance(flat, np.ndarray):
                                reprs[i] = str(flat[int(vidx[i])])
                            else:
                                v = flat[int(vidx[i])].as_py()
                                reprs[i] = "" \
                                    if isinstance(v, (dict, list)) \
                                    else js_string(v)
                        ffail |= ifail
                    fail |= ffail
                return fail, (paths, reprs, whats)
            self._add(r, ev)
            return

        if isinstance(rt, str) and _is_char_len_type(rt):
            major = self._next_major()
            r = Rule(major, 0, prop, prop_tp, "length", rt, dyn=True)

            def ev(tbl, rt=rt):
                n = tbl.num_rows
                fail = np.zeros(n, dtype=bool)
                paths = np.full(n, None, dtype=object)
                reprs = np.full(n, None, dtype=object)
                for cname, farr in _columns(tbl):
                    ff, lens = _char_len_scalar_eval(farr, rt)
                    for i in np.nonzero(ff & ~fail)[0]:
                        paths[i] = cname
                        if isinstance(lens, np.ndarray):
                            reprs[i] = str(int(lens[int(i)]))
                        else:
                            v = lens[int(i)].as_py()
                            reprs[i] = js_string(v) \
                                if not isinstance(v, (dict, list)) else ""
                    fail |= ff
                return fail, (paths, reprs)
            self._add(r, ev)
            return

        if isinstance(rt, dict):
            self._compile_root_regex_obj_values(prop, rt, prop_tp,
                                                _columns)
            return

        if rt == "any":
            # carriers in matching columns (struct/map layouts) — the
            # row-engine rule below short-circuits non-carriers
            self._add_root_regex_rowengine_rule(prop, rt, prop_tp,
                                                _columns)
            return

        if not _is_scalar_str_type(rt):
            # union / tuple value types: row engine per matching column
            # (position degradation, not whole-schema)
            self._add_root_regex_rowengine_rule(prop, rt, prop_tp,
                                                _columns)
            return
        major = self._next_major()
        r = Rule(major, 0, prop, prop_tp, "value", rt, dyn=True)

        def ev(tbl, rt=rt):
            n = tbl.num_rows
            fail = np.zeros(n, dtype=bool)
            paths = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            for cname, farr in _columns(tbl):
                ff = _scalar_fail_mask(farr, rt)
                newly = ff & ~fail
                for i in np.nonzero(newly)[0]:
                    v = farr[int(i)].as_py()
                    reprs[i] = "" if isinstance(v, (dict, list)) \
                        else js_string(v)
                    paths[i] = cname
                fail |= ff
            return fail, (paths, reprs)
        self._add(r, ev)

    def _add_root_regex_rowengine_rule(self, prop, rt, prop_tp,
                                       _columns):
        """Root-level regex prop whose VALUE type is beyond the
        vectorized kernels (union / tuple / doubly-nested container):
        one dyn rule validating each matching column's non-null cells
        through the row engine, first-failing-column-wins in column
        order (= the reference's data-iteration order)."""
        sjots, sjot = self.sjots, self.sjot
        major = self._next_major()
        r = Rule(major, 0, prop, prop_tp, "value", "", dyn=True)

        def ev(tbl, rt=rt, tp=prop_tp):
            n = tbl.num_rows
            fail = np.zeros(n, dtype=bool)
            paths = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            for cname, farr in _columns(tbl):
                valid = _valid_mask(farr) & ~fail
                is_map = pa.types.is_map(farr.type)
                if rt == "any":
                    # only @sjot carriers can fail "any": skip layouts
                    # that cannot carry; narrow struct columns to rows
                    # whose "@sjot" field is set
                    if pa.types.is_struct(farr.type):
                        fi = farr.type.get_field_index("@sjot")
                        if fi < 0:
                            continue
                        valid &= _valid_mask(farr.field(fi))
                    elif not is_map:
                        continue
                if not valid.any():
                    continue
                for i in np.nonzero(valid)[0]:
                    cell = farr[int(i)].as_py()
                    data = {k: _py_doc(v) for k, v in cell} if is_map \
                        else _py_doc(cell)
                    try:
                        validate_value(sjots, data, rt, sjot,
                                       f"$.{cname}", tp, ctx)
                    except SJOTValidationError as e:
                        row = e.violation_row()
                        fail[i] = True
                        dp = row["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") \
                            else cname
                        reprs[i] = row["value_repr"]
                        whats[i] = row["what"]
                        tps[i] = row["typepath"]
                    except SJOTSchemaError:
                        pass
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _make_col_obj_sub(self, cname, obj_type, typepath):
        """Embedded sub-validator for ONE column (or nested field) path
        against an object type — the root-regex analogue of the union
        object-branch subs: `_compile_struct_props` bound to the path,
        shape rule included (a non-struct, non-map layout fails every
        valid value). ``cname`` is a column name or a path list."""
        sub = TableValidator.__new__(TableValidator)
        sub.sjots, sub.sjot = self.sjots, self.sjot
        sub.extras_column = None
        sub.root_value_column = None
        sub._major = -1
        sub.rules = []
        path = [cname] if isinstance(cname, str) else list(cname)
        sub._compile_struct_props(path, dict(obj_type), typepath)
        return sub

    def _obj_needs_map_rowengine(self, obj_type, typepath) -> bool:
        """True when a MAP-layout target of this object type is beyond
        the depth-1 vectorized companions (plain-scalar prop values +
        @final): propsets/@dep, regex prop names, or any char-length /
        container / object / union / tuple prop value type. Such
        objects route map-layout rows through the row-engine catch-all
        (``_add_nested_map_object_rule``) with every struct-path rule
        gated inert on map targets."""
        for prop, proptype in obj_type.items():
            if prop in ("@one", "@any", "@all", "@dep"):
                return True
            if prop.startswith("@"):
                continue
            if prop.startswith("("):
                return True
            rt, _tp = self._resolve_path(proptype, f"{typepath}/{prop}")
            if not _is_scalar_str_type(rt) or _is_char_len_type(rt):
                return True
            if rt == "any":
                # "any" map values may carry embedded @sjot schemas the
                # scalar companions cannot interpret (reference
                # index.js:111-131) — the row-engine catch-all does
                return True
        return False

    def _add_nested_map_object_rule(self, path, obj_type, typepath):
        """Catch-all for an object type whose Arrow position is
        MAP-typed (any depth ≥ 2 position, or a depth-1 position whose
        object type is beyond the vectorized map companions): validate
        each valid row's map cell through the row engine against the
        full object type (fixed + regex props, propsets, @final,
        defaults — exact reference semantics), folding the first
        violation into this dyn rule. All struct-field rules for the
        same object are gated inert on map targets, so this rule fully
        owns them."""
        sjots, sjot = self.sjots, self.sjot
        dotted = ".".join(path)
        major = self._next_major()
        r = Rule(major, 0, dotted, typepath, "value", "", dyn=True)

        def ev(tbl, path=tuple(path), obj=obj_type, tp=typepath,
               dotted=dotted):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None or not pa.types.is_map(arr.type):
                return zeros, None
            valid = _valid_mask(arr) & parent_ok
            fail = np.zeros(n, dtype=bool)
            paths_o = np.full(n, None, dtype=object)
            reprs_o = np.full(n, None, dtype=object)
            whats_o = np.full(n, None, dtype=object)
            tps_o = np.full(n, None, dtype=object)
            if not valid.any():
                return fail, (paths_o, reprs_o, whats_o, tps_o)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            for i in np.nonzero(valid)[0]:
                # explicit dict build: an EMPTY map cell as_py()s to []
                # and _py_doc could not tell it from an empty list
                cell = arr[int(i)].as_py()
                doc = {k: _py_doc(v) for k, v in cell}
                try:
                    validate_value(sjots, doc, obj, sjot, f"$.{dotted}",
                                   tp, ctx)
                except SJOTValidationError as e:
                    row = e.violation_row()
                    fail[i] = True
                    dp = row["datapath"]
                    paths_o[i] = dp[2:] if dp.startswith("$.") \
                        else dotted
                    reprs_o[i] = row["value_repr"]
                    whats_o[i] = row["what"]
                    tps_o[i] = row["typepath"]
            return fail, (paths_o, reprs_o, whats_o, tps_o)
        self._add(r, ev)

    def _compile_root_regex_obj_values(self, prop, rt, prop_tp, _columns):
        """Root-level regex property names whose VALUE type is an object
        (reference index.js:388-405 + 407-460): matching columns are
        discovered per batch; STRUCT-layout columns validate through a
        memoized embedded sub-validator (compile-time probe guarantees
        the object type is columnar-compilable, so the per-column
        runtime instantiation cannot raise); any other layout (map,
        scalar, list — shape mismatches and entry-keyed objects) routes
        the few valid rows through the ROW ENGINE inside the same pass,
        exactly like the embedded-@sjot carrier rule. First-failing-
        column-wins in column order = the reference's data-iteration
        order."""
        # compile-time probe: name-independent, so success here means
        # the per-cname runtime compile below can never raise
        self._make_col_obj_sub("__rxprobe__", rt, prop_tp)
        sjots, sjot = self.sjots, self.sjot
        major = self._next_major()
        r = Rule(major, 0, prop, prop_tp, "value", "", dyn=True)
        subs: dict = {}

        def ev(tbl, rt=rt, tp=prop_tp):
            n = tbl.num_rows
            fail = np.zeros(n, dtype=bool)
            paths = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)
            for cname, farr in _columns(tbl):
                if pa.types.is_struct(farr.type):
                    sub = subs.get(cname)
                    if sub is None:
                        sub = subs[cname] = self._make_col_obj_sub(
                            cname, rt, tp)
                    sverdict, sviols, _ = sub.validate_batch(tbl)
                    by_row = {v["row_idx"]: v for v in sviols}
                    sf = ~np.asarray(sverdict, dtype=bool)
                    for i in np.nonzero(sf & ~fail)[0]:
                        v = by_row[int(i)]
                        dp = v["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") \
                            else dp
                        whats[i] = v["what"]
                        reprs[i] = v["value_repr"]
                        tps[i] = v["typepath"]
                    fail |= sf
                    continue
                # map / scalar / list layouts: exact row-engine
                # semantics at per-row cost, valid rows only (Arrow
                # null ≡ absent property)
                valid = _valid_mask(farr)
                todo = valid & ~fail
                if not todo.any():
                    continue
                from ..core import Context, SJOTValidationError
                from ..core.validator import validate_value
                ctx = Context()
                for i in np.nonzero(todo)[0]:
                    doc = _py_doc(farr[int(i)].as_py())
                    try:
                        validate_value(sjots, doc, rt, sjot,
                                       f"$.{cname}", tp, ctx)
                    except SJOTValidationError as e:
                        row = e.violation_row()
                        fail[i] = True
                        dp = row["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") \
                            else cname
                        reprs[i] = row["value_repr"]
                        whats[i] = row["what"]
                        tps[i] = row["typepath"]
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _compile_embedded_sjot_rule(self, name, typepath, major):
        """Embedded ``@sjot`` under an ``any``-typed column OR nested
        field (``name`` is a column name or a path list): detect carrier
        rows per batch (struct field / map key "@sjot") and validate
        ONLY those with the row engine — exact reference semantics
        (type-name refs, inline schema dicts, schema lists) at per-row
        cost proportional to the carrier count."""
        path = [name] if isinstance(name, str) else list(name)
        dotted = ".".join(path)
        rule = Rule(major, 0, dotted, typepath, "value", "", dyn=True)
        sjots, sjot = self.sjots, self.sjot

        def ev(tbl, path=tuple(path), name=dotted, tp=typepath):
            zeros = np.zeros(tbl.num_rows, dtype=bool)
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None:
                return zeros, None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_struct(arr.type):
                i = arr.type.get_field_index("@sjot")
                if i < 0:
                    return zeros, None
                carriers = _valid_mask(arr) & _valid_mask(arr.field(i)) \
                    & parent_ok
            elif pa.types.is_map(arr.type):
                lst = arr.cast(pa.list_(pa.struct(
                    [("key", arr.type.key_type),
                     ("value", arr.type.item_type)])))
                # alignment lengths use Arrow validity ONLY (flatten()
                # drops null rows' ranges, not parent-invalid ones)
                valid = _valid_mask(lst)
                lengths = np.where(valid, np.nan_to_num(
                    _np(pc.list_value_length(lst))), 0).astype(np.int64)
                keys = lst.flatten().field("key")
                parent = np.repeat(np.arange(len(lst)), lengths)
                m = _np(pc.fill_null(pc.equal(keys, "@sjot"),
                                     False)).astype(bool)
                carriers = np.zeros(tbl.num_rows, dtype=bool)
                carriers[parent[m]] = True
                carriers &= valid & parent_ok
            else:
                return zeros, None
            if not carriers.any():
                return zeros, None
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            fail = np.zeros(tbl.num_rows, dtype=bool)
            paths_o = np.full(tbl.num_rows, None, dtype=object)
            reprs_o = np.full(tbl.num_rows, None, dtype=object)
            whats_o = np.full(tbl.num_rows, None, dtype=object)
            tps_o = np.full(tbl.num_rows, None, dtype=object)
            for i in np.nonzero(carriers)[0]:
                doc = _py_doc(arr[int(i)].as_py())
                try:
                    validate_value(sjots, doc, "any", sjot,
                                   f"$.{name}", tp, ctx)
                except SJOTValidationError as e:
                    row = e.violation_row()
                    fail[i] = True
                    # datapath already carries the $.{name} prefix
                    paths_o[i] = row["datapath"][2:] \
                        if row["datapath"].startswith("$.") else name
                    reprs_o[i] = row["value_repr"]
                    whats_o[i] = row["what"]
                    tps_o[i] = row["typepath"]
                except SJOTSchemaError as e:
                    fail[i] = True
                    paths_o[i] = name
                    reprs_o[i] = ""
                    whats_o[i] = e.msg
                    tps_o[i] = e.typepath
            return fail, (paths_o, reprs_o, whats_o, tps_o)
        self._add(rule, ev)

    def _injected_present(self, obj_type, upto_key) -> frozenset:
        """Props whose VALID default the row engine injects before
        reaching ``upto_key`` in schema order: the reference mutates the
        document (index.js:429-433), so a propset/@dep encountered LATER
        sees those optionals as present regardless of the data. Props
        with failing defaults are excluded — for their rows the default
        violation (an earlier rule) wins first-error anyway."""
        out = set()
        for k, v in obj_type.items():
            if k == upto_key:
                break
            if k.startswith("@") or k.startswith("("):
                continue
            q = k.find("?")
            if q != -1 and q < len(k) - 1 \
                    and self._default_violation(k, q, v, "") is None:
                out.add(k[:q])
        return frozenset(out)

    def _compile_propset(self, kind, propsets, typepath, obj_type):
        inj = self._injected_present(obj_type, kind)
        for pset in propsets:
            major = self._next_major()
            rule = Rule(major, 0, "", typepath + "/" + kind,
                        f"requires {_PSET_WORD[kind]} {','.join(pset)}"
                        " properties", "", no_value=True)

            def ev(tbl, pset=pset, kind=kind, inj=inj):
                present = [np.ones(tbl.num_rows, dtype=bool) if p in inj
                           else _presence(tbl, p) for p in pset]
                return _pset_fail(kind, present, tbl.num_rows), None
            self._add(rule, ev)

    def _compile_dep(self, deps, typepath, obj_type):
        inj = self._injected_present(obj_type, "@dep")
        for name, dep in deps.items():
            major = self._next_major()
            rule = Rule(major, 0, name, typepath + "/@dep",
                        f"requires {js_string(dep)}", "", no_value=True)
            dlist = [dep] if isinstance(dep, str) else list(dep)

            def ev(tbl, name=name, dlist=dlist, inj=inj):
                has = np.ones(tbl.num_rows, dtype=bool) if name in inj \
                    else _presence(tbl, name)
                ok = np.ones(tbl.num_rows, dtype=bool)
                for d in dlist:
                    if d not in inj:
                        ok &= _presence(tbl, d)
                return has & ~ok, None
            self._add(rule, ev)

    def _default_violation(self, prop, q, proptype, typepath):
        """For ``name?default`` props the reference INJECTS the default
        when the prop is absent and validates it (index.js:429-433); a
        default that fails its own type makes every absent row invalid
        with a CONSTANT violation, computable at compile time. Returns
        (what, value_repr, typepath) or None when the default passes.
        Defaults are always scalars (sjot_default), so the violation
        anchors at the property itself."""
        if q == -1 or q >= len(prop) - 1:
            return None
        from ..core import Context
        from ..core.errors import SJOTSchemaError, SJOTValidationError
        from ..core.validator import validate_value

        try:
            d = default_value(prop[q + 1:], self.sjots, None, proptype,
                              self.sjot)
            validate_value(self.sjots, d, proptype, self.sjot, "$",
                           f"{typepath}/{prop}", Context())
            return None
        except SJOTValidationError as e:
            row = e.violation_row()
            return row["what"], row["value_repr"], row["typepath"]
        except SJOTSchemaError:
            return None

    def _compile_prop(self, name, prop, proptype, required, typepath):
        rt, prop_typepath = self._resolve_path(proptype, f"{typepath}/{prop}")

        if required:
            major = self._next_major()
            rule = Rule(major, 0, name, typepath, "should be present", "",
                        no_value=True)

            def ev(tbl, name=name):
                return ~_presence(tbl, name), None
            self._add(rule, ev)
        else:
            dv = self._default_violation(prop, prop.find("?"), proptype,
                                         typepath)
            if dv is not None:
                what, repr_, tp = dv
                major = self._next_major()
                rule = Rule(major, 0, name, tp, what, "", const_repr=repr_)

                def ev(tbl, name=name):
                    return ~_presence(tbl, name), None
                self._add(rule, ev)

        mark = len(self.rules)
        saved_major = self._major
        try:
            major = self._next_major()
            self._compile_value_rules(name, rt, prop_typepath, major)
        except ColumnarCompileError:
            # exotic position: degrade to ONE row-engine value rule for
            # this column — the rest of the schema stays columnar
            del self.rules[mark:]
            self._major = saved_major
            self._add_rowengine_value_rule([name], rt, prop_typepath)

    def _compile_value_rules(self, name, rt, typepath, major):
        if rt == "any":
            # wildcard — no value constraint — EXCEPT the reference's
            # embedded-@sjot branch (index.js: 'any' data carrying an
            # "@sjot" member validates against that embedded schema/ref;
            # core/validator.py:690). Rows whose struct/map cell
            # physically carries "@sjot" are the rare slow path: they
            # run through the ROW engine inside this same rule, so mixed
            # corpora stay on the columnar fast path without a
            # whole-dataset fallback. The row engine may inject defaults
            # into its transient copy; normalize_batch does NOT rewrite
            # embedded sub-documents.
            self._compile_embedded_sjot_rule(name, typepath, major)
            return
        if rt == "object" or rt == "array":
            # wildcards constrain the SHAPE: "object" needs struct/map
            # data, "array" list data — anything else fails "value"
            # (the reference's is-not-an-object/array errors)
            self._add_wildcard_shape_rule([name], rt, typepath, major)
            return
        if isinstance(rt, dict):
            if any(p.startswith("(") for p in rt):
                # regex property names → Arrow map column (dynamic keys)
                self._compile_map_object(name, rt, typepath)
            else:
                # nested object → Arrow struct column: compile its props
                # as rules over the struct's child arrays (recursively)
                self._compile_struct_props([name], rt, typepath)
            return
        if is_union(rt):
            self._compile_union_rules(name, rt, typepath, major)
            return
        if isinstance(rt, list) or (
                isinstance(rt, str) and _is_container_type(rt)):
            # NB: char[n,m] is a STRING-length type (index.js:679-690),
            # not a list — it stays on the scalar path below
            self._compile_list_rules(name, rt, typepath, major)
            return

        if rt.startswith("char[") and rt != "char[]":
            # char[n,m] diagnostics report the violated LENGTH
            # (index.js:920-966 passes len as the error datum); LIST
            # data exercises the reference duality (array of "char"
            # items): bounds first, then the first failing ITEM with
            # its $.col[i] datapath — dyn rendering for exact parity
            rule = Rule(major, 0, name, typepath, "length", rt, dyn=True)

            def ev(tbl, name=name, rt=rt):
                n = tbl.num_rows
                if name not in tbl.column_names:
                    return np.zeros(n, dtype=bool), None
                arr = tbl[name]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                paths = np.full(n, None, dtype=object)
                whats = np.full(n, None, dtype=object)
                reprs = np.full(n, None, dtype=object)
                if not _is_list_type(arr.type):
                    fail, vals = _char_len_scalar_eval(arr, rt)
                    is_str = pa.types.is_string(arr.type) \
                        or pa.types.is_large_string(arr.type)
                    for i in np.nonzero(fail)[0]:
                        paths[i] = name
                        if is_str:
                            # string data: length check ("length", len)
                            reprs[i] = str(int(vals[i]))
                        else:
                            # non-string scalars: the reference labels
                            # these "value" (number range-scan misses /
                            # shape mismatches), node-verified
                            whats[i] = "value"
                            v = vals[int(i)].as_py()
                            reprs[i] = js_string(v) \
                                if not isinstance(v, (dict, list)) else ""
                    return fail, (paths, reprs, whats, None)
                valid = _valid_mask(arr)
                lengths = np.where(
                    valid, np.nan_to_num(_np(pc.list_value_length(arr))),
                    0).astype(np.int64)
                len_fail = _length_fail_mask(lengths, valid,
                                             compile_bounds(rt, 5)) & valid
                for i in np.nonzero(len_fail)[0]:
                    paths[i], reprs[i] = name, str(int(lengths[i]))
                item_fail, ival = _list_item_first_fail(
                    arr, "char", valid, self.sjots, self.sjot)
                item_fail = item_fail & valid & ~len_fail
                if item_fail.any() and ival is not None:
                    flat, vidx, fpos = ival[0], ival[1], ival[2]
                    iwhats = ival[3] if len(ival) > 3 else None
                    for i in np.nonzero(item_fail)[0]:
                        paths[i] = f"{name}[{int(fpos[i])}]"
                        whats[i] = str(iwhats[int(vidx[i])]) \
                            if iwhats is not None else "value"
                        if isinstance(flat, np.ndarray):
                            reprs[i] = str(flat[int(vidx[i])])
                        else:
                            v = flat[int(vidx[i])].as_py()
                            reprs[i] = "" if isinstance(v, (dict, list)) \
                                else js_string(v)
                return len_fail | item_fail, (paths, reprs, whats, None)
            self._add(rule, ev)
            return

        rule = Rule(major, 0, name, typepath, "value", rt)

        def ev(tbl, name=name, rt=rt):
            if name not in tbl.column_names:
                return np.zeros(tbl.num_rows, dtype=bool), None
            arr = tbl[name]
            return _scalar_fail_mask(arr, rt), arr
        self._add(rule, ev)

    def _compile_list_rules(self, name, rt, typepath, major):
        """List column: (set-dup), bounds, then item rules on the flattened
        child table — in the reference's check order."""
        minor = 0
        is_set = False
        inline = not isinstance(rt, str)
        itemtype = None
        items_tp = typepath

        def _num(x):
            return isinstance(x, (int, float)) and not isinstance(x, bool)

        if isinstance(rt, str):
            if rt.endswith("]"):
                i = rt.rfind("[")
                bounds = compile_bounds(rt, i + 1)
                itemtype, items_tp = self._resolve_path(rt[:i], typepath)
            else:
                i = rt.rfind("{")
                bounds = compile_bounds(rt, i + 1)
                itemtype, items_tp = self._resolve_path(rt[:i], typepath)
                is_set = True
        else:
            items_tp = typepath + "[]"
            if len(rt) == 0:
                return  # [] accepts any array
            if len(rt) == 1:
                if _num(rt[0]):
                    bounds, itemtype = ("exact", rt[0]), "any"
                else:
                    bounds = None
                    itemtype, items_tp = self._resolve_path(rt[0], items_tp)
            elif len(rt) >= 2 and _num(rt[1]):
                if _num(rt[0]):
                    bounds, itemtype = ("minmax", rt[0], rt[1]), "any"
                else:
                    bounds = ("max", rt[1])
                    itemtype, items_tp = self._resolve_path(rt[0], items_tp)
            elif _num(rt[0]):
                if len(rt) > 2 and _num(rt[2]):
                    bounds = ("minmax", rt[0], rt[2])
                else:
                    bounds = ("min", rt[0])
                itemtype, items_tp = self._resolve_path(rt[1], items_tp)
            else:
                self._compile_tuple_rules(name, rt, typepath, major)
                return

        # shape rule: a non-list column against an array/set type fails
        # every valid value ("value X is not an array T[]") — keeps a
        # schema-table mismatch from crashing the list kernels below
        type_repr = rt if isinstance(rt, str) else js_string(rt)
        shape_rule = Rule(major, minor, name, typepath, "value", type_repr)

        def ev_shape(tbl, name=name, rt_s=rt if isinstance(rt, str)
                     else None):
            if name not in tbl.column_names:
                return np.zeros(tbl.num_rows, dtype=bool), None
            arr = tbl[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            if rt_s is not None:
                # reference quirks for SCALAR data against container
                # type strings: strings bounds-check char-prefixed types
                # (index.js:679-690, 'zzz' IS valid for char[2,4][]);
                # numbers range-scan the type string (4 IS valid for
                # string[2,4]) — the scalar kernel reproduces both
                return _scalar_fail_mask(arr, rt_s), arr
            return _valid_mask(arr), arr
        self._add(shape_rule, ev_shape)
        minor += 1

        if is_set:
            rule = Rule(major, minor, name, typepath, "value",
                        rt if isinstance(rt, str) else js_string(rt))

            def ev(tbl, name=name):
                if name not in tbl.column_names:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                return _set_dup_mask(tbl[name]), tbl[name]
            self._add(rule, ev)
            minor += 1

        if bounds is not None:
            tp = typepath + ("[]" if inline else "")
            # diagnostic parity: string-form bounds report the ACTUAL length
            # (index.js:920-966 passes len), inline forms report the violated
            # BOUND (index.js:176-227 pass type[i])
            if inline:
                type_repr = itemtype if isinstance(itemtype, str) else "any"
                if not isinstance(rt, str):
                    raw_item = next((t for t in rt
                                     if isinstance(t, str)), "any")
                    type_repr = raw_item
            else:
                type_repr = rt
            rule = Rule(major, minor, name, tp, "length", type_repr)

            def ev(tbl, name=name, bounds=bounds, inline=inline):
                if name not in tbl.column_names:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                arr = tbl[name]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if not _is_list_type(arr.type):
                    return np.zeros(tbl.num_rows, dtype=bool), None
                valid = _valid_mask(arr)
                lengths = np.where(valid, _np(pc.list_value_length(arr)), 0).astype(np.int64)
                mask = _length_fail_mask(lengths, valid, bounds), None
                fail = mask[0]
                if inline:
                    lo = bounds[1] if bounds[0] in ("exact", "min", "minmax") \
                        else -math.inf
                    hi = (bounds[2] if bounds[0] == "minmax"
                          else bounds[1] if bounds[0] in ("exact", "max")
                          else math.inf)
                    vals = np.where(lengths < lo, lo, hi)
                else:
                    vals = lengths
                return fail, vals
            self._add(rule, ev)
            minor += 1

        if itemtype == "any" or itemtype is None:
            return
        if isinstance(itemtype, dict):
            self._compile_child_object(name, itemtype, items_tp, major, minor)
            return
        if _is_scalar_str_type(itemtype):
            if is_set or _is_char_len_type(itemtype):
                # the reference sorts set members (String() order) BEFORE
                # validating items (index.js:294-299), so the failing
                # index/value refer to the SORTED array
                r = Rule(major, minor, name, items_tp,
                         "length" if _is_char_len_type(itemtype)
                         else "value", itemtype, inner=True)
                sjots, sjot = self.sjots, self.sjot

                def ev_set(tbl, name=name, itemtype=itemtype,
                           is_set=is_set):
                    if name not in tbl.column_names:
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    arr = tbl[name]
                    if is_set:
                        arr = _sort_sets(arr)
                    ones = np.ones(tbl.num_rows, dtype=bool)
                    return _list_item_first_fail(arr, itemtype, ones,
                                                 sjots, sjot)
                self._add(r, ev_set)
                return
            rule = Rule(major, minor, name, items_tp,
                        "length" if _is_char_len_type(itemtype)
                        else "value", itemtype, child=True, list_col=name)
            null_item_fails = not _null_item_ok(
                self.sjots, self.sjot, itemtype)
            null_default = default_value("null", self.sjots, None, itemtype,
                                         self.sjot) if null_item_fails \
                else None

            def ev_child(child_tbl, itemtype=itemtype,
                         null_item_fails=null_item_fails,
                         null_default=null_default):
                arr = child_tbl["__item__"]
                fail = _scalar_fail_mask(arr, itemtype)
                if null_item_fails:
                    fail = fail | ~_valid_mask(arr)
                    arr = _fill_item_default(arr, null_default)
                return fail, arr
            self._add(rule, ev_child)
            return
        if isinstance(itemtype, str) and _is_container_type(itemtype):
            self._compile_child_nested_list_items(name, itemtype, items_tp,
                                                  major, minor,
                                                  outer_set=is_set)
            return
        raise ColumnarCompileError(
            f"nested container item type {itemtype!r}: use the row engine")

    def _compile_child_nested_list_items(self, name, itemtype, items_tp,
                                         major, minor, outer_set=False):
        """Doubly-nested containers (``T[a,b][c,d]``): each outer item
        (a child-table row, ``__item__`` an inner list) validates as a
        container — shape/null, set duplicates, inner bounds, first
        failing inner item — with the reference's $.col[i] / $.col[i][j]
        datapaths. An OUTER SET sorts its items (String() order,
        index.js:294-299) before validation, so that case runs a single
        self-contained rule over the sorted array instead of the
        (unsorted) child table. Inner item types must be scalar (triple
        nesting stays on the row engine)."""
        is_set2 = itemtype.endswith("}")
        j = itemtype.rfind("{" if is_set2 else "[")
        bounds2 = compile_bounds(itemtype, j + 1)
        inner_item, _tp = self._resolve_path(itemtype[:j], items_tp)
        if not _is_scalar_str_type(inner_item) \
                or _is_char_len_type(inner_item):
            raise ColumnarCompileError(
                "triply-nested containers: row engine")
        sjots, sjot = self.sjots, self.sjot

        if outer_set:
            self._add_sorted_nested_set_rule(
                name, itemtype, items_tp, major, minor,
                is_set2, bounds2, inner_item)
            return

        # 1. shape/null: a null or non-list outer item fails "value"
        r = Rule(major, minor, name, items_tp, "value", itemtype,
                 child=True, list_col=name)

        def ev_shape(child_tbl, itemtype=itemtype):
            arr = child_tbl["__item__"]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if _is_list_type(arr.type):
                return ~_valid_mask(arr), arr
            return np.ones(child_tbl.num_rows, dtype=bool), arr
        self._add(r, ev_shape)
        minor += 1
        # 2. inner set duplicates
        if is_set2:
            r = Rule(major, minor, name, items_tp, "value", itemtype,
                     child=True, list_col=name)

            def ev_dup(child_tbl):
                arr = child_tbl["__item__"]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if not _is_list_type(arr.type):
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                return _set_dup_mask(arr) & _valid_mask(arr), arr
            self._add(r, ev_dup)
            minor += 1
        # 3. inner bounds
        if bounds2 is not None:
            r = Rule(major, minor, name, items_tp, "length", itemtype,
                     child=True, list_col=name)

            def ev_len(child_tbl, bounds2=bounds2):
                arr = child_tbl["__item__"]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if not _is_list_type(arr.type):
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                valid = _valid_mask(arr)
                lengths = np.where(valid, np.nan_to_num(
                    _np(pc.list_value_length(arr))), 0).astype(np.int64)
                return _length_fail_mask(lengths, valid, bounds2), lengths
            self._add(r, ev_len)
            minor += 1
        # 4. inner items (sorted first for sets), $.col[i][j] datapaths
        r = Rule(major, minor, name, items_tp, "value", inner_item,
                 child=True, list_col=name, inner=True)

        def ev_items(child_tbl, inner_item=inner_item, is_set2=is_set2):
            arr = child_tbl["__item__"]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type):
                return np.zeros(child_tbl.num_rows, dtype=bool), None
            if is_set2:
                arr = _sort_sets(arr)
            return _list_item_first_fail(arr, inner_item,
                                         _valid_mask(arr), sjots, sjot)
        self._add(r, ev_items)

    def _add_sorted_nested_set_rule(self, name, itemtype, items_tp,
                                    major, minor, is_set2, bounds2,
                                    inner_item):
        """Outer-SET doubly-nested containers: one dyn rule over the
        String()-sorted outer array — per outer item: shape/null, inner
        set-dup, inner bounds, first failing inner item; per row the
        first failing SORTED outer index wins."""
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, minor, name, items_tp, "value", itemtype,
                 dyn=True)

        def ev(tbl, itemtype=itemtype, inner_item=inner_item,
               is_set2=is_set2, bounds2=bounds2):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if name not in tbl.column_names:
                return zeros, None
            arr = tbl[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type):
                return zeros, None
            arr = _sort_sets(arr)
            valid_o = _valid_mask(arr)
            len_o = np.where(valid_o, np.nan_to_num(
                _np(pc.list_value_length(arr))), 0).astype(np.int64)
            flat = arr.flatten()   # the outer items (inner lists)
            total = len(flat)
            rowof = np.repeat(np.arange(n), len_o)
            pos_o = np.arange(total) - np.repeat(
                np.cumsum(len_o) - len_o, len_o)
            # per-outer-item (flat) first failure: step priority
            # shape(0) < dup(1) < bounds(2) < items(3)
            STEP_INF = 9
            step = np.full(total, STEP_INF, dtype=np.int64)
            item_j = np.zeros(total, dtype=np.int64)
            fvalid = _valid_mask(flat)
            inner_is_list = _is_list_type(flat.type)
            if not inner_is_list:
                step[:] = 0   # every valid/NULL outer item fails shape
            else:
                step[~fvalid] = 0
                if is_set2:
                    dup = _set_dup_mask(flat) & fvalid
                    step[dup & (step == STEP_INF)] = 1
                if bounds2 is not None:
                    len_i = np.where(fvalid, np.nan_to_num(
                        _np(pc.list_value_length(flat))),
                        0).astype(np.int64)
                    lf = _length_fail_mask(len_i, fvalid, bounds2)
                    step[lf & (step == STEP_INF)] = 2
                sflat = _sort_sets(flat) if is_set2 else flat
                ifail, ival = _list_item_first_fail(
                    sflat, inner_item, fvalid, sjots, sjot)
                sel = ifail & (step == STEP_INF)
                step[sel] = 3
                if ival is not None:
                    item_j[sel] = ival[2][sel]
            failing = step < STEP_INF
            if not failing.any():
                return zeros, None
            # first failing sorted outer index per row
            fr, fp = rowof[failing], pos_o[failing]
            order = np.argsort(-fp)
            first_flat = np.full(n, -1, dtype=np.int64)
            src_idx = np.nonzero(failing)[0]
            first_flat[fr[order]] = src_idx[order]
            fail = first_flat >= 0
            paths = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            for i in np.nonzero(fail)[0]:
                fi = int(first_flat[i])
                oi = int(pos_o[fi])
                st = int(step[fi])
                if st == 0:
                    paths[i] = f"{name}[{oi}]"
                    whats[i] = "value"
                    v = flat[fi].as_py()
                    reprs[i] = js_string(v) \
                        if not isinstance(v, (dict, list)) else ""
                elif st == 1:
                    paths[i] = f"{name}[{oi}]"
                    whats[i], reprs[i] = "value", ""
                elif st == 2:
                    paths[i] = f"{name}[{oi}]"
                    whats[i] = "length"
                    reprs[i] = str(int(len_i[fi]))
                else:
                    jj = int(item_j[fi])
                    paths[i] = f"{name}[{oi}][{jj}]"
                    iwhats = ival[3] if ival is not None \
                        and len(ival) > 3 else None
                    vidx = int(ival[1][fi])
                    whats[i] = str(iwhats[vidx]) if iwhats is not None \
                        else "value"
                    fl = ival[0]
                    if isinstance(fl, np.ndarray):
                        reprs[i] = str(fl[vidx])
                    else:
                        v = fl[vidx].as_py()
                        reprs[i] = "" if isinstance(v, (dict, list)) \
                            else js_string(v)
            return fail, (paths, reprs, whats)
        self._add(r, ev)

    def _compile_struct_props(self, path, obj_type, typepath):
        """Nested object type over an Arrow struct column (or a struct
        field of one, recursively): required/value rules per sub-property,
        propsets/@dep over field presence, runtime @final against the
        struct's physical fields. Reference semantics index.js:407-460;
        every fail mask is ANDed with the enclosing structs' validity (an
        absent optional struct checks nothing)."""
        if "@extends" in obj_type:
            extend_type(self.sjots, obj_type, self.sjot, typepath)
        dotted = ".".join(path)
        prop_names = {p.split("?")[0] for p in obj_type
                      if not p.startswith("@") and not p.startswith("(")}

        # shape rule: a non-struct column/field against an object type
        # fails every valid value ("value X is not an object") — maps
        # pass through (they carry object data in a different layout)
        major = self._next_major()
        shape_rule = Rule(major, 0, dotted, typepath, "value", "")

        def ev_shape(tbl, path=tuple(path)):
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None or pa.types.is_struct(arr.type) \
                    or pa.types.is_map(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            return _valid_mask(arr) & parent_ok, arr
        self._add(shape_rule, ev_shape)

        deep = len(path) >= 2
        # MAP-layout ownership: a MAP-typed target carries this object's
        # data as entries, which the struct-field rules below cannot see.
        # At depth ≥ 2 that is ALWAYS routed through the row-engine
        # catch-all (no vectorized machinery exists there; silently
        # false-PASSed or false-FAILed before r4). At depth 1 the
        # vectorized companions at the bottom of this method cover
        # scalar prop values + @final only — an object carrying
        # propsets/@dep, regex prop names, or any non-plain-scalar prop
        # value type ALSO needs the catch-all (propsets false-FAILED
        # and non-scalar values false-PASSED map rows before this gate).
        map_owner = deep or self._obj_needs_map_rowengine(obj_type,
                                                          typepath)
        if map_owner:
            self._add_nested_map_object_rule(path, obj_type, typepath)

        def _target_struct_ok(tbl, path=tuple(path)):
            """Presence of the target as a STRUCT: map-typed targets are
            owned entirely by the catch-all above when ``map_owner``."""
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None:
                return np.zeros(tbl.num_rows, dtype=bool)
            ok = parent_ok & _valid_mask(arr)
            if map_owner and pa.types.is_map(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool)
            return ok

        for prop, proptype in obj_type.items():
            if prop.startswith("@"):
                if prop in ("@one", "@any", "@all"):
                    inj = self._injected_present(obj_type, prop)
                    for pset in proptype:
                        major = self._next_major()
                        r = Rule(major, 0, dotted, typepath + "/" + prop,
                                 f"requires {_PSET_WORD[prop]}"
                                 f" {','.join(pset)} properties", "",
                                 no_value=True)

                        def ev(tbl, path=tuple(path), pset=pset, kind=prop,
                               inj=inj):
                            struct_ok = _target_struct_ok(tbl)
                            present = [
                                np.ones(tbl.num_rows, dtype=bool)
                                if p in inj
                                else _nested_presence(tbl, list(path) + [p])
                                for p in pset]
                            return (_pset_fail(kind, present, tbl.num_rows)
                                    & struct_ok), None
                        self._add(r, ev)
                elif prop == "@dep":
                    inj = self._injected_present(obj_type, "@dep")
                    for dname, dep in proptype.items():
                        dlist = [dep] if isinstance(dep, str) else list(dep)
                        major = self._next_major()
                        r = Rule(major, 0, f"{dotted}.{dname}",
                                 typepath + "/@dep",
                                 f"requires {js_string(dep)}", "",
                                 no_value=True)

                        def ev(tbl, path=tuple(path), dname=dname,
                               dlist=dlist, inj=inj):
                            struct_ok = _target_struct_ok(tbl)
                            has = (struct_ok if dname in inj else
                                   _nested_presence(tbl,
                                                    list(path) + [dname]))
                            ok = np.ones(tbl.num_rows, dtype=bool)
                            for d in dlist:
                                if d not in inj:
                                    ok &= _nested_presence(
                                        tbl, list(path) + [d])
                            return has & ~ok, None
                        self._add(r, ev)
                continue
            if prop.startswith("("):
                # regex property name over a nested struct: matching
                # FIELDS are discovered per batch from the struct's Arrow
                # type; field order = data-property order, so
                # first-failing-field-wins inside the rule reproduces the
                # reference's data-iteration order (index.js:388-405;
                # row engine core/validator.py kind-2 entries). Scalar
                # value types only — anything else stays on the row
                # engine (compile-time fallback).
                rt, prop_tp = self._resolve_path(proptype,
                                                 f"{typepath}/{prop}")
                if not _is_scalar_str_type(rt) or _is_char_len_type(rt):
                    raise ColumnarCompileError(
                        "non-scalar regex-prop value types in nested"
                        " structs: row engine")
                if rt == "any":
                    # any-typed regex values: only @sjot carriers can
                    # fail — struct-layout matched fields get the
                    # carrier rule; map layouts are owned by the
                    # map_owner catch-all (regex ⇒ map_owner)
                    self._add_struct_regex_any_carrier_rule(
                        list(path), prop, prop_tp)
                    continue
                from ..core.validator import compile_regex_type
                matcher = compile_regex_type(prop)
                major = self._next_major()
                r = Rule(major, 0, dotted, prop_tp, "value", rt, dyn=True)

                def ev(tbl, path=tuple(path), matcher=matcher, rt=rt,
                       tp=prop_tp):
                    arr, parent_valid = _nested_field(tbl, list(path))
                    if arr is None:
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    base = ".".join(path)
                    if pa.types.is_map(arr.type):
                        # regex props imply ``map_owner``: map-layout
                        # targets at ANY depth (incl. item-object fields
                        # rebased onto the child table) are owned by the
                        # object-level row-engine catch-all rule
                        return (np.zeros(tbl.num_rows, dtype=bool),
                                None)
                    if not pa.types.is_struct(arr.type):
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    struct_ok = parent_valid & _valid_mask(arr)
                    fail = np.zeros(tbl.num_rows, dtype=bool)
                    paths_o = np.full(tbl.num_rows, None, dtype=object)
                    reprs_o = np.full(tbl.num_rows, None, dtype=object)
                    for f in arr.type:
                        if matcher.fullmatch(f.name) is None:
                            continue
                        farr = arr.field(f.name)
                        ff = _scalar_fail_mask(farr, rt) & struct_ok
                        newly = ff & ~fail
                        for i in np.nonzero(newly)[0]:
                            v = farr[int(i)].as_py()
                            reprs_o[i] = "" if isinstance(v, (dict, list)) \
                                else js_string(v)
                            paths_o[i] = f"{base}.{f.name}"
                        fail |= ff
                    return fail, (paths_o, reprs_o)
                self._add(r, ev)
                continue
            q = prop.find("?")
            pname = prop[:q] if q != -1 else prop
            required = q == -1
            fpath = path + [pname]
            fdotted = ".".join(fpath)
            rt, prop_tp = self._resolve_path(proptype, f"{typepath}/{prop}")

            if required:
                major = self._next_major()
                r = Rule(major, 0, fdotted, typepath, "should be present",
                         "", no_value=True)

                def ev(tbl, path=tuple(path), pname=pname):
                    struct_ok = _target_struct_ok(tbl)
                    present = np.zeros(tbl.num_rows, dtype=bool)
                    arr, _ = _nested_field(tbl, list(path) + [pname])
                    if arr is not None:
                        present = _valid_mask(arr)
                    if len(path) == 1:
                        # a top-level map column carries props as entries
                        has, _mv = _map_entry_presence(tbl, path[0], pname)
                        present = present | has
                    return struct_ok & ~present, None
                self._add(r, ev)
            else:
                dv = self._default_violation(prop, q, proptype, typepath)
                if dv is not None:
                    what, repr_, tp = dv
                    major = self._next_major()
                    r = Rule(major, 0, fdotted, tp, what, "",
                             const_repr=repr_)

                    def ev(tbl, path=tuple(path), pname=pname):
                        struct_ok = _target_struct_ok(tbl)
                        return (struct_ok
                                & ~_nested_presence(tbl,
                                                    list(path) + [pname])
                                ), None
                    self._add(r, ev)

            if rt == "any":
                # nested any-typed field: interpret embedded @sjot
                # carriers (detected per batch; non-carriers free)
                self._compile_embedded_sjot_rule(fpath, prop_tp,
                                                 self._next_major())
                continue
            if rt in ("object", "array"):
                self._add_wildcard_shape_rule(fpath, rt, prop_tp,
                                              self._next_major())
                continue
            if isinstance(rt, (dict, list)) or (
                    isinstance(rt, str) and _is_container_type(rt)):
                # nested object / union / container / tuple: compile the
                # vectorized family, degrading this POSITION to one
                # row-engine value rule when its compiler rejects the
                # shape (the rest of the schema stays columnar)
                mark = len(self.rules)
                saved_major = self._major
                try:
                    if isinstance(rt, dict):
                        self._compile_struct_props(fpath, rt, prop_tp)
                    elif is_union(rt):
                        self._compile_union_rules(
                            fdotted, rt, prop_tp, self._next_major(),
                            path=tuple(fpath))
                    elif isinstance(rt, list):
                        self._compile_struct_tuple_prop(
                            fpath, rt, prop_tp, self._next_major())
                    else:
                        self._compile_struct_list_prop(
                            fpath, rt, prop_tp, self._next_major())
                except ColumnarCompileError:
                    del self.rules[mark:]
                    self._major = saved_major
                    self._add_rowengine_value_rule(fpath, rt, prop_tp)
                continue
            major = self._next_major()
            if rt.startswith("char[") and rt != "char[]":
                r = Rule(major, 0, fdotted, prop_tp, "length", rt)

                def ev(tbl, path=tuple(fpath), rt=rt):
                    arr, parent_valid = _nested_field(tbl, list(path))
                    if arr is None:
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    return _char_len_scalar_eval(arr, rt,
                                                 extra_valid=parent_valid)
                self._add(r, ev)
                continue
            r = Rule(major, 0, fdotted, prop_tp, "value", rt)

            def ev(tbl, path=tuple(fpath), rt=rt):
                arr, parent_valid = _nested_field(tbl, list(path))
                if arr is None:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                return _scalar_fail_mask(arr, rt) & parent_valid, arr
            self._add(r, ev)

        if len(path) == 1 and not map_owner:
            # map-layout companions: a top-level map column carries the
            # object as entries — validate scalar prop values and @final
            # extras against them (verdict parity for dict data stored
            # as map<string, T>). Objects beyond this surface set
            # ``map_owner`` above and run map rows through the
            # row-engine catch-all instead.
            col = path[0]
            for prop, proptype in obj_type.items():
                if prop.startswith("@") or prop.startswith("("):
                    continue
                pname = prop.split("?")[0]
                rt2, prop_tp2 = self._resolve_path(proptype,
                                                   f"{typepath}/{prop}")
                if not _is_scalar_str_type(rt2) or _is_char_len_type(rt2):
                    continue
                major = self._next_major()
                r = Rule(major, 0, f"{col}.{pname}", prop_tp2, "value",
                         rt2, child=True, list_col=col, map_entry=True)

                def ev(child_tbl, pname=pname, rt2=rt2):
                    if "key" not in child_tbl.column_names:
                        return np.zeros(child_tbl.num_rows,
                                        dtype=bool), None
                    keys = child_tbl["key"]
                    vals = child_tbl["value"]
                    km = _np(pc.fill_null(pc.equal(keys, pname),
                                          False)).astype(bool)
                    return km & _scalar_fail_mask(vals, rt2), (keys, vals)
                self._add(r, ev)
            if bool(obj_type.get("@final", False)):
                major = self._next_major()
                r = Rule(major, 0, col, typepath + "/@final",
                         "additional property should not be present", "",
                         no_value=True, child=True, list_col=col,
                         map_entry=True)

                def ev(child_tbl, props=frozenset(prop_names)):
                    if "key" not in child_tbl.column_names:
                        return np.zeros(child_tbl.num_rows,
                                        dtype=bool), None
                    keys = child_tbl["key"]
                    matched = ~_valid_mask(keys)
                    matched |= _np(pc.fill_null(pc.equal(keys, "@sjot"),
                                                False)).astype(bool)
                    for f in props:
                        matched |= _np(pc.fill_null(pc.equal(keys, f),
                                                    False)).astype(bool)
                    return ~matched, (keys, child_tbl["value"])
                self._add(r, ev)

        if bool(obj_type.get("@final", False)):
            from ..core.validator import compile_regex_type
            regex_matchers = tuple(compile_regex_type(p) for p in obj_type
                                   if p.startswith("("))
            major = self._next_major()
            r = Rule(major, 0, dotted, typepath + "/@final",
                     "additional property should not be present", "",
                     no_value=True)

            def ev(tbl, path=tuple(path), props=frozenset(prop_names),
                   rxs=regex_matchers):
                arr, parent_valid = _nested_field(tbl, list(path))
                if arr is None or not pa.types.is_struct(arr.type):
                    return np.zeros(tbl.num_rows, dtype=bool), None
                struct_ok = parent_valid & _valid_mask(arr)
                fail = np.zeros(tbl.num_rows, dtype=bool)
                first = np.full(tbl.num_rows, None, dtype=object)
                for f in arr.type:
                    if f.name in props or f.name == "@sjot" \
                            or any(m.fullmatch(f.name) for m in rxs):
                        continue
                    fv = _valid_mask(arr.field(f.name))
                    newly = fv & ~fail
                    first[newly] = ".".join(path) + "." + f.name
                    fail |= fv
                return fail & struct_ok, first
            self._add(r, ev)

    def _check_union_scalar_branches(self, rt):
        """Depth-1 unions are compiled as try-each SCALAR kernels; a
        union carrying container/object branches would need per-branch
        container rules the scalar evaluator can't express — fall back
        to the row engine at COMPILE time (never a runtime worker
        error)."""
        for branch in rt[0]:
            b = branch
            while isinstance(b, str) and "#" in b and not b.startswith("("):
                b = reftype(self.sjots, b, self.sjot)
            if isinstance(b, dict) or isinstance(b, list) or (
                    isinstance(b, str) and _is_container_type(b)):
                raise ColumnarCompileError(
                    "union with container/object branches: row engine")

    def _compile_map_object(self, name, obj_type, typepath):
        """Object type with regex property names over an Arrow map column
        (``map<string, T>``): per-entry rules on the flattened entry
        table. Reference semantics: regex props validate every matching
        data prop (index.js:388-405), fixed props validate by key
        equality, ``@final`` rejects entries matching nothing
        (index.js:448-451, ``@sjot`` exempt), propsets/@dep test key
        presence. Value types must be scalar; default INJECTION into map
        values is not performed (validation of present values only)."""
        if "@extends" in obj_type:
            extend_type(self.sjots, obj_type, self.sjot, typepath)
        from ..core.validator import valid as row_valid

        fixed_names = [p.split("?")[0] for p in obj_type
                       if not p.startswith("@") and not p.startswith("(")]
        regex_props = [p for p in obj_type if p.startswith("(")]

        def entry_presence(tbl, key_name):
            """(has_key per row, map-column validity per row)."""
            zeros = np.zeros(tbl.num_rows, dtype=bool)
            if name not in tbl.column_names:
                return zeros, zeros
            arr = tbl[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not pa.types.is_map(arr.type):
                return zeros, zeros
            lst = arr.cast(pa.list_(pa.struct(
                [("key", arr.type.key_type),
                 ("value", arr.type.item_type)])))
            valid = _valid_mask(lst)
            lengths = np.where(
                valid, np.nan_to_num(_np(pc.list_value_length(lst))),
                0).astype(np.int64)
            parent = np.repeat(np.arange(len(lst)), lengths)
            m = _np(pc.fill_null(pc.equal(lst.flatten().field("key"),
                                          key_name), False)).astype(bool)
            has = np.zeros(tbl.num_rows, dtype=bool)
            has[parent[m]] = True
            return has, valid

        def prop_presence(tbl, key_name):
            """(has_prop, object-valid) across BOTH layouts: map entry
            presence OR struct-field presence (propsets/@dep must see
            struct-layout objects too)."""
            has, valid_map = entry_presence(tbl, key_name)
            svalid = np.zeros(tbl.num_rows, dtype=bool)
            spresent = np.zeros(tbl.num_rows, dtype=bool)
            if name in tbl.column_names:
                a0 = tbl[name]
                if isinstance(a0, pa.ChunkedArray):
                    a0 = a0.combine_chunks()
                if pa.types.is_struct(a0.type):
                    svalid = _valid_mask(a0)
                    f, pv = _nested_field(tbl, [name, key_name])
                    if f is not None:
                        spresent = pv & _valid_mask(f)
            return has | spresent, valid_map | svalid

        def key_match_mask(keys, pattern):
            return _valid_mask(keys) & ~_fullmatch_mask(keys, pattern)

        # shape rule: anything that is not object data (neither a map
        # nor a struct column) fails every valid value ("value X is not
        # an object") — scalars AND list columns alike
        major = self._next_major()
        shape_rule = Rule(major, 0, name, typepath, "value", "")

        def ev_shape(tbl, name=name):
            if name not in tbl.column_names:
                return np.zeros(tbl.num_rows, dtype=bool), None
            arr = tbl[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_map(arr.type) or pa.types.is_struct(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            return _valid_mask(arr), arr
        self._add(shape_rule, ev_shape)

        for prop, proptype in obj_type.items():
            if prop.startswith("@"):
                if prop in ("@one", "@any", "@all"):
                    inj = self._injected_present(obj_type, prop)
                    for pset in proptype:
                        major = self._next_major()
                        r = Rule(major, 0, name, typepath + "/" + prop,
                                 f"requires {_PSET_WORD[prop]}"
                                 f" {','.join(pset)} properties", "",
                                 no_value=True)

                        def ev(tbl, pset=pset, kind=prop, inj=inj):
                            pres, valid = zip(*[prop_presence(tbl, p)
                                                for p in pset])
                            obj_ok = valid[0]
                            pres = [obj_ok if p in inj else pr
                                    for p, pr in zip(pset, pres)]
                            return (_pset_fail(kind, list(pres),
                                               tbl.num_rows)
                                    & obj_ok), None
                        self._add(r, ev)
                elif prop == "@dep":
                    inj = self._injected_present(obj_type, "@dep")
                    for dname, dep in proptype.items():
                        dlist = [dep] if isinstance(dep, str) else list(dep)
                        major = self._next_major()
                        r = Rule(major, 0, f"{name}.{dname}",
                                 typepath + "/@dep",
                                 f"requires {js_string(dep)}", "",
                                 no_value=True)

                        def ev(tbl, dname=dname, dlist=dlist, inj=inj):
                            has, obj_ok = prop_presence(tbl, dname)
                            if dname in inj:
                                has = obj_ok
                            ok = np.ones(tbl.num_rows, dtype=bool)
                            for d in dlist:
                                if d not in inj:
                                    h, _ = prop_presence(tbl, d)
                                    ok &= h
                            return has & ~ok, None
                        self._add(r, ev)
                continue

            rt, prop_tp = self._resolve_path(proptype, f"{typepath}/{prop}")
            container_prop = isinstance(rt, str) and _is_container_type(rt)
            charlen_prop = isinstance(rt, str) and _is_char_len_type(rt)
            obj_prop = isinstance(rt, dict)
            if not container_prop and not charlen_prop and not obj_prop \
                    and not _is_scalar_str_type(rt):
                raise ColumnarCompileError(
                    "non-scalar map value types: row engine")
            null_ok = False if (container_prop or obj_prop) else row_valid(
                None, rt,
                self.sjot if isinstance(self.sjot, dict) else None)

            if prop.startswith("("):
                if rt == "any":
                    # any-typed regex-prop values: carriers in matching
                    # map entries AND struct-layout matched fields
                    self._add_map_any_carrier_rule(
                        name, prop, prop_tp, self._next_major(),
                        pattern=prop)
                    self._add_struct_regex_any_carrier_rule(
                        name, prop, prop_tp)
                    continue
                if obj_prop:
                    # object-typed regex-prop values: map-entry rule +
                    # struct-layout companion (regex props validate
                    # explicit nulls like required, kind-2 semantics)
                    major = self._next_major()
                    self._add_map_object_value_rule(
                        name, prop, rt, prop_tp, True, major,
                        pattern=prop)
                    self._add_struct_regex_obj_rule(
                        name, prop, rt, prop_tp, major)
                    continue
                if container_prop:
                    # container-typed regex prop: per-entry container
                    # validation (map layout; explicit nulls validate
                    # like required) + the per-field struct companion
                    major = self._next_major()
                    self._add_map_container_value_rule(
                        name, prop, rt, prop_tp, True, major,
                        pattern=prop)
                    self._add_struct_regex_container_rule(
                        name, prop, rt, prop_tp, major)
                    continue
                if charlen_prop:
                    major = self._next_major()
                    self._add_map_charlen_value_rule(
                        name, prop, rt, prop_tp, True, major,
                        pattern=prop)
                    continue
                major = self._next_major()
                r = Rule(major, 0, name, f"{typepath}/{prop}", "value",
                         rt, child=True, list_col=name, map_entry=True)

                def ev(child_tbl, rx=prop, rt=rt, null_ok=null_ok):
                    if "key" not in child_tbl.column_names:
                        return np.zeros(child_tbl.num_rows,
                                        dtype=bool), None
                    keys = child_tbl["key"]
                    vals = child_tbl["value"]
                    km = key_match_mask(keys, rx)
                    vf = _scalar_fail_mask(vals, rt)
                    if not null_ok:
                        vf = vf | ~_valid_mask(vals)
                    return km & vf, (keys, vals)
                self._add(r, ev)

                r2 = Rule(major, 1, name, prop_tp, "value", rt, dyn=True)

                def ev_struct(tbl, rx=prop, rt=rt):
                    # struct-layout: physical field names matching the
                    # pattern validate against the prop type; field order
                    # = data-property order, first failing field wins
                    # (exact per-field datapath/value via the dyn
                    # mechanism)
                    if name not in tbl.column_names:
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    a0 = tbl[name]
                    if isinstance(a0, pa.ChunkedArray):
                        a0 = a0.combine_chunks()
                    if not pa.types.is_struct(a0.type):
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    from ..core.validator import compile_regex_type
                    matcher = compile_regex_type(rx)
                    svalid = _valid_mask(a0)
                    fail = np.zeros(tbl.num_rows, dtype=bool)
                    paths_o = np.full(tbl.num_rows, None, dtype=object)
                    reprs_o = np.full(tbl.num_rows, None, dtype=object)
                    for fld in a0.type:
                        if matcher.fullmatch(fld.name) is None:
                            continue
                        farr = a0.field(fld.name)
                        ff = _scalar_fail_mask(farr, rt) & svalid
                        newly = ff & ~fail
                        for i in np.nonzero(newly)[0]:
                            v = farr[int(i)].as_py()
                            reprs_o[i] = "" if isinstance(v, (dict, list)) \
                                else js_string(v)
                            paths_o[i] = f"{name}.{fld.name}"
                        fail |= ff
                    return fail, (paths_o, reprs_o)
                self._add(r2, ev_struct)
                continue

            q = prop.find("?")
            pname = prop[:q] if q != -1 else prop
            required = q == -1
            if required:
                major = self._next_major()
                r = Rule(major, 0, f"{name}.{pname}", typepath,
                         "should be present", "", no_value=True)

                def ev(tbl, pname=pname):
                    has, valid_map = entry_presence(tbl, pname)
                    # struct-layout objects carry the prop as a field
                    svalid = np.zeros(tbl.num_rows, dtype=bool)
                    spresent = np.zeros(tbl.num_rows, dtype=bool)
                    if name in tbl.column_names:
                        a0 = tbl[name]
                        if isinstance(a0, pa.ChunkedArray):
                            a0 = a0.combine_chunks()
                        if pa.types.is_struct(a0.type):
                            svalid = _valid_mask(a0)
                            f, pv = _nested_field(tbl, [name, pname])
                            if f is not None:
                                spresent = pv & _valid_mask(f)
                    return (valid_map | svalid) & ~(has | spresent), None
                self._add(r, ev)
            else:
                dv = self._default_violation(prop, q, proptype, typepath)
                if dv is not None:
                    what, repr_, tp = dv
                    major = self._next_major()
                    r = Rule(major, 0, f"{name}.{pname}", tp, what, "",
                             const_repr=repr_)

                    def ev(tbl, pname=pname):
                        has, valid = prop_presence(tbl, pname)
                        return valid & ~has, None
                    self._add(r, ev)

            if rt == "any":
                # any-typed values: interpret embedded @sjot carriers in
                # BOTH layouts (map entry values + struct-layout fields)
                self._add_map_any_carrier_rule(
                    name, pname, prop_tp, self._next_major())
                self._compile_embedded_sjot_rule(
                    [name, pname], prop_tp, self._next_major())
                continue
            if obj_prop:
                # object-typed map values: per-entry embedded
                # sub-validation on the flattened entry table, plus the
                # full nested-struct family for struct layouts — each
                # inert on the other layout
                major = self._next_major()
                self._add_map_object_value_rule(
                    name, pname, rt, prop_tp, required, major)
                self._compile_struct_props([name, pname], dict(rt),
                                           prop_tp)
                continue
            if container_prop:
                # list/set-typed map values: per-entry container
                # validation on the flattened entry table (set-dup →
                # bounds → first failing item, reference order), plus
                # the struct-layout family via the nested-list rules —
                # each family is inert on the other layout
                major = self._next_major()
                self._add_map_container_value_rule(
                    name, pname, rt, prop_tp, required, major)
                self._compile_struct_list_prop(
                    [name, pname], rt, prop_tp, self._next_major())
                continue
            if charlen_prop:
                # char[n,m] string-length map values: per-entry length
                # rule + the nested char-len rule for struct layouts
                major = self._next_major()
                self._add_map_charlen_value_rule(
                    name, pname, rt, prop_tp, required, major)
                major2 = self._next_major()
                r2 = Rule(major2, 0, f"{name}.{pname}", prop_tp,
                          "length", rt)

                def ev_struct_cl(tbl, pname=pname, rt=rt):
                    f, pv = _nested_field(tbl, [name, pname])
                    if f is None:
                        return np.zeros(tbl.num_rows, dtype=bool), None
                    return _char_len_scalar_eval(f, rt, extra_valid=pv)
                self._add(r2, ev_struct_cl)
                continue

            major = self._next_major()
            r = Rule(major, 0, name, prop_tp, "value", rt, child=True,
                     list_col=name, map_entry=True)

            def ev(child_tbl, pname=pname, rt=rt, null_ok=null_ok,
                   required=required):
                if "key" not in child_tbl.column_names:
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                keys = child_tbl["key"]
                vals = child_tbl["value"]
                km = _np(pc.fill_null(pc.equal(keys, pname),
                                      False)).astype(bool)
                vf = _scalar_fail_mask(vals, rt)
                if required and not null_ok:
                    # optional props treat a null value as absent
                    # (index.js:425); required props validate the null
                    vf = vf | ~_valid_mask(vals)
                return km & vf, (keys, vals)
            self._add(r, ev)

            r2 = Rule(major, 1, f"{name}.{pname}", prop_tp, "value", rt)

            def ev_struct(tbl, pname=pname, rt=rt):
                f, pv = _nested_field(tbl, [name, pname])
                if f is None:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                return _scalar_fail_mask(f, rt) & pv, f
            self._add(r2, ev_struct)

        if bool(obj_type.get("@final", False)):
            major = self._next_major()
            r = Rule(major, 0, name, typepath + "/@final",
                     "additional property should not be present", "",
                     no_value=True, child=True, list_col=name,
                     map_entry=True)

            def ev(child_tbl, fixed=tuple(fixed_names),
                   regexes=tuple(regex_props)):
                if "key" not in child_tbl.column_names:
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                keys = child_tbl["key"]
                matched = ~_valid_mask(keys)  # null keys can't be extras
                matched |= _np(pc.fill_null(pc.equal(keys, "@sjot"),
                                            False)).astype(bool)
                for f in fixed:
                    matched |= _np(pc.fill_null(pc.equal(keys, f),
                                                False)).astype(bool)
                for rx in regexes:
                    matched |= key_match_mask(keys, rx)
                return ~matched, (keys, child_tbl["value"])
            self._add(r, ev)

            r2 = Rule(major, 1, name, typepath + "/@final",
                      "additional property should not be present", "",
                      no_value=True)

            def ev_struct_final(tbl, fixed=frozenset(fixed_names),
                                regexes=tuple(regex_props)):
                if name not in tbl.column_names:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                a0 = tbl[name]
                if isinstance(a0, pa.ChunkedArray):
                    a0 = a0.combine_chunks()
                if not pa.types.is_struct(a0.type):
                    return np.zeros(tbl.num_rows, dtype=bool), None
                from ..core.validator import compile_regex_type
                matchers = [compile_regex_type(rx) for rx in regexes]
                svalid = _valid_mask(a0)
                fail = np.zeros(tbl.num_rows, dtype=bool)
                first = np.full(tbl.num_rows, None, dtype=object)
                for fld in a0.type:
                    if fld.name in fixed or fld.name == "@sjot":
                        continue
                    if any(m.fullmatch(fld.name) for m in matchers):
                        continue
                    fv = _valid_mask(a0.field(fld.name))
                    newly = fv & ~fail
                    first[newly] = f"{name}.{fld.name}"
                    fail |= fv
                return fail & svalid, first
            self._add(r2, ev_struct_final)

    def _add_struct_regex_any_carrier_rule(self, path, pattern, prop_tp):
        """``any``-typed REGEX props over STRUCT layouts: physical
        fields matched by the pattern that carry an embedded ``@sjot``
        (struct field / nested-map key) validate through the row engine;
        non-carriers are free. First-failing-field-wins in field order
        (= the reference's data-iteration order)."""
        from ..core.validator import compile_regex_type
        matcher = compile_regex_type(pattern)
        sjots, sjot = self.sjots, self.sjot
        path = [path] if isinstance(path, str) else list(path)
        dotted = ".".join(path)
        major = self._next_major()
        r = Rule(major, 0, dotted, prop_tp, "value", "", dyn=True)

        def ev(tbl, path=tuple(path), tp=prop_tp, dotted=dotted):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None:
                return zeros, None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not pa.types.is_struct(arr.type):
                return zeros, None
            base_ok = parent_ok & _valid_mask(arr)
            fail = np.zeros(n, dtype=bool)
            paths_o = np.full(n, None, dtype=object)
            reprs_o = np.full(n, None, dtype=object)
            whats_o = np.full(n, None, dtype=object)
            tps_o = np.full(n, None, dtype=object)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            for f in arr.type:
                if matcher.fullmatch(f.name) is None:
                    continue
                farr = arr.field(f.name)
                is_map = pa.types.is_map(farr.type)
                if pa.types.is_struct(farr.type):
                    fi = farr.type.get_field_index("@sjot")
                    if fi < 0:
                        continue
                    carriers = base_ok & _valid_mask(farr) \
                        & _valid_mask(farr.field(fi)) & ~fail
                elif is_map:
                    carriers = base_ok & _valid_mask(farr) & ~fail
                else:
                    continue
                for i in np.nonzero(carriers)[0]:
                    raw = farr[int(i)].as_py()
                    doc = {k: _py_doc(v) for k, v in raw} if is_map \
                        else _py_doc(raw)
                    if is_map and "@sjot" not in doc:
                        continue
                    try:
                        validate_value(sjots, doc, "any", sjot,
                                       f"$.{dotted}.{f.name}", tp, ctx)
                    except SJOTValidationError as e:
                        row = e.violation_row()
                        fail[i] = True
                        dp = row["datapath"]
                        paths_o[i] = dp[2:] if dp.startswith("$.") \
                            else f"{dotted}.{f.name}"
                        whats_o[i] = row["what"]
                        reprs_o[i] = row["value_repr"]
                        tps_o[i] = row["typepath"]
                    except SJOTSchemaError:
                        pass
            return fail, (paths_o, reprs_o, whats_o, tps_o)
        self._add(r, ev)

    def _add_map_any_carrier_rule(self, name, pname, prop_tp, major,
                                  pattern=None):
        """``any``-typed map values: interpret embedded ``@sjot``
        carriers in matching entries (reference index.js:111-131).
        Struct entry values detect carriers vectorized (the "@sjot"
        field's validity); nested-map entry values route every matching
        entry through ``validate_value(…, "any")`` (non-carriers are
        accepted immediately). Scalar/list value layouts cannot carry
        and add no cost."""
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, 0, name, prop_tp, "value", "", child=True,
                 list_col=name, map_entry=True, dyn=True)

        def ev(child_tbl, pname=pname, pattern=pattern):
            n = child_tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if "key" not in child_tbl.column_names:
                return zeros, None
            vals = child_tbl["value"]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            is_struct = pa.types.is_struct(vals.type)
            is_map = pa.types.is_map(vals.type)
            if not is_struct and not is_map:
                return zeros, None
            keys = child_tbl["key"]
            if pattern is not None:
                km = _valid_mask(keys) & ~_fullmatch_mask(keys, pattern)
            else:
                km = _np(pc.fill_null(pc.equal(keys, pname),
                                      False)).astype(bool)
            todo = km & _valid_mask(vals)
            if is_struct:
                fi = vals.type.get_field_index("@sjot")
                if fi < 0:
                    return zeros, None
                todo &= _valid_mask(vals.field(fi))
            if not todo.any():
                return zeros, None
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            pref = f"$.{name}."
            for i in np.nonzero(todo)[0]:
                raw = vals[int(i)].as_py()
                doc = {k: _py_doc(v) for k, v in raw} if is_map \
                    else _py_doc(raw)
                k = pname if pattern is None else keys[int(i)].as_py()
                try:
                    # full datapath base: the reference embeds it in the
                    # carrier typepath ({$.col.key.@sjot}); the rendered
                    # entry path strips the $.col. prefix again
                    validate_value(sjots, doc, "any", sjot,
                                   f"$.{name}.{k}", prop_tp, ctx)
                except SJOTValidationError as e:
                    row = e.violation_row()
                    fail[i] = True
                    dp = row["datapath"]
                    paths[i] = dp[len(pref):] if dp.startswith(pref) \
                        else k
                    whats[i] = row["what"]
                    reprs[i] = row["value_repr"]
                    tps[i] = row["typepath"]
                except SJOTSchemaError:
                    pass
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _add_map_object_value_rule(self, name, pname, rt, prop_tp,
                                   required, major, pattern=None):
        """Object-typed map values: one dyn map-entry rule for entries
        whose key equals ``pname`` (or fullmatches ``pattern`` for regex
        props). STRUCT entry values run a memoized embedded
        sub-validator over the flattened entries table (bound to the
        ``value`` column; the compile-time probe below guarantees the
        runtime compile cannot raise); any other value layout routes the
        matched valid entries through the ROW ENGINE inside the same
        pass. Explicit-null values fail for required/regex props and
        pass (≡ deleted) for optionals — the reference's kind-1/kind-2
        split (index.js:425)."""
        self._make_col_obj_sub("__mapprobe__", rt, prop_tp)
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, 0, name, prop_tp, "value", "", child=True,
                 list_col=name, map_entry=True, dyn=True)
        subs: dict = {}

        def ev(child_tbl, pname=pname, rt=rt, required=required,
               pattern=pattern):
            n = child_tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if "key" not in child_tbl.column_names:
                return zeros, None
            keys = child_tbl["key"]
            vals = child_tbl["value"]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if pattern is not None:
                km = _valid_mask(keys) & ~_fullmatch_mask(keys, pattern)
            else:
                km = _np(pc.fill_null(pc.equal(keys, pname),
                                      False)).astype(bool)
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)

            def pkey(i):
                return pname if pattern is None else keys[int(i)].as_py()

            valid = _valid_mask(vals)
            if required:
                nf = km & ~valid
                for i in np.nonzero(nf)[0]:
                    whats[i], reprs[i] = "value", "null"
                    paths[i], tps[i] = pkey(i), prop_tp
                fail |= nf
            if pa.types.is_struct(vals.type):
                sub = subs.get("value")
                if sub is None:
                    sub = subs["value"] = self._make_col_obj_sub(
                        "value", rt, prop_tp)
                sverdict, sviols, _ = sub.validate_batch(child_tbl)
                by_row = {v["row_idx"]: v for v in sviols}
                sf = ~np.asarray(sverdict, dtype=bool) & km & valid
                for i in np.nonzero(sf & ~fail)[0]:
                    v = by_row[int(i)]
                    dp = v["datapath"]
                    suffix = dp[len("$.value"):] \
                        if dp.startswith("$.value") else ""
                    paths[i] = f"{pkey(i)}{suffix}"
                    whats[i] = v["what"]
                    reprs[i] = v["value_repr"]
                    tps[i] = v["typepath"]
                fail |= sf
                return fail, (paths, reprs, whats, tps)
            todo = km & valid & ~fail
            if todo.any():
                from ..core import Context, SJOTValidationError
                from ..core.validator import validate_value
                ctx = Context()
                for i in np.nonzero(todo)[0]:
                    doc = _py_doc(vals[int(i)].as_py())
                    k = pkey(i)
                    try:
                        validate_value(sjots, doc, rt, sjot, f"$.{k}",
                                       prop_tp, ctx)
                    except SJOTValidationError as e:
                        row = e.violation_row()
                        fail[i] = True
                        dp = row["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") else k
                        reprs[i] = row["value_repr"]
                        whats[i] = row["what"]
                        tps[i] = row["typepath"]
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _add_struct_regex_obj_rule(self, name, pattern, rt, prop_tp,
                                   major):
        """Struct-layout companion for an OBJECT-typed regex prop:
        fields matching the pattern validate against the object type —
        struct fields through a memoized embedded sub-validator bound to
        [name, field], other field layouts through the row engine
        (first-failing-field wins, data order; null fields ≡ absent on
        struct layouts)."""
        self._make_col_obj_sub(["__p__", "__f__"], rt, prop_tp)
        from ..core.validator import compile_regex_type
        matcher = compile_regex_type(pattern)
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, 1, name, prop_tp, "value", "", dyn=True)
        subs: dict = {}

        def ev(tbl, rt=rt):
            zeros = np.zeros(tbl.num_rows, dtype=bool)
            if name not in tbl.column_names:
                return zeros, None
            a0 = tbl[name]
            if isinstance(a0, pa.ChunkedArray):
                a0 = a0.combine_chunks()
            if not pa.types.is_struct(a0.type):
                return zeros, None
            n = tbl.num_rows
            svalid = _valid_mask(a0)
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)
            for fld in a0.type:
                if matcher.fullmatch(fld.name) is None:
                    continue
                fp = f"{name}.{fld.name}"
                if pa.types.is_struct(fld.type):
                    sub = subs.get(fld.name)
                    if sub is None:
                        sub = subs[fld.name] = self._make_col_obj_sub(
                            [name, fld.name], rt, prop_tp)
                    sverdict, sviols, _ = sub.validate_batch(tbl)
                    by_row = {v["row_idx"]: v for v in sviols}
                    sf = ~np.asarray(sverdict, dtype=bool) & svalid
                    for i in np.nonzero(sf & ~fail)[0]:
                        v = by_row[int(i)]
                        dp = v["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") \
                            else fp
                        whats[i] = v["what"]
                        reprs[i] = v["value_repr"]
                        tps[i] = v["typepath"]
                    fail |= sf
                    continue
                farr = a0.field(fld.name)
                todo = _valid_mask(farr) & svalid & ~fail
                if not todo.any():
                    continue
                from ..core import Context, SJOTValidationError
                from ..core.validator import validate_value
                ctx = Context()
                for i in np.nonzero(todo)[0]:
                    doc = _py_doc(farr[int(i)].as_py())
                    try:
                        validate_value(sjots, doc, rt, sjot, f"$.{fp}",
                                       prop_tp, ctx)
                    except SJOTValidationError as e:
                        row = e.violation_row()
                        fail[i] = True
                        dp = row["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") else fp
                        reprs[i] = row["value_repr"]
                        whats[i] = row["what"]
                        tps[i] = row["typepath"]
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _add_map_container_value_rule(self, name, pname, rt, prop_tp,
                                      required, major, pattern=None):
        """One dyn map-entry rule validating list/set-typed values of
        entries whose key equals ``pname`` (or fullmatches ``pattern``
        for regex props — those validate explicit nulls like required
        props, reference kind-2 semantics): shape (scalar value against
        the container type), set duplicates, length bounds, first
        failing item — row-engine order, exact per-entry datapaths
        ($.col.key / $.col.key[pos])."""
        is_set = rt.endswith("}")
        j = rt.rfind("{" if is_set else "[")
        bounds = compile_bounds(rt, j + 1)
        itemtype, _tp = self._resolve_path(rt[:j], prop_tp)
        if not _is_scalar_str_type(itemtype):
            raise ColumnarCompileError(
                "doubly-nested map value types: row engine")
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, 0, name, prop_tp, "value", rt, child=True,
                 list_col=name, map_entry=True, dyn=True)

        def ev(child_tbl, pname=pname, rt=rt, itemtype=itemtype,
               is_set=is_set, bounds=bounds, required=required,
               pattern=pattern):
            n = child_tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if "key" not in child_tbl.column_names:
                return zeros, None
            keys = child_tbl["key"]
            vals = child_tbl["value"]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if pattern is not None:
                km = _valid_mask(keys) & ~_fullmatch_mask(keys, pattern)
            else:
                km = _np(pc.fill_null(pc.equal(keys, pname),
                                      False)).astype(bool)
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)

            def pkey(i):
                return pname if pattern is None else keys[int(i)].as_py()

            if not _is_list_type(vals.type):
                # scalar entry values against a container type: the
                # scalar-shape kernel (incl. the number range-scan and
                # char-prefixed dualities) decides per entry
                vf = _scalar_fail_mask(vals, rt) & km
                if required:
                    vf |= km & ~_valid_mask(vals)
                for i in np.nonzero(vf)[0]:
                    v = vals[int(i)].as_py()
                    whats[i] = "value"
                    reprs[i] = js_string(v) \
                        if not isinstance(v, (dict, list)) else ""
                    paths[i] = pkey(i)
                return vf, (paths, reprs, whats)
            valid = _valid_mask(vals)
            if required:
                nf = km & ~valid
                for i in np.nonzero(nf)[0]:
                    whats[i], reprs[i], paths[i] = "value", "null", pkey(i)
                fail |= nf
            sel = km & valid
            if is_set:
                dup = _set_dup_mask(vals) & sel & ~fail
                for i in np.nonzero(dup)[0]:
                    whats[i], reprs[i], paths[i] = "value", "", pkey(i)
                fail |= dup
            if bounds is not None:
                lengths = np.where(valid, np.nan_to_num(
                    _np(pc.list_value_length(vals))), 0).astype(np.int64)
                lf = _length_fail_mask(lengths, sel, bounds) & sel & ~fail
                for i in np.nonzero(lf)[0]:
                    whats[i] = "length"
                    paths[i] = pkey(i)
                    reprs[i] = str(int(lengths[i]))
                fail |= lf
            svals = _sort_sets(vals) if is_set else vals
            ones = np.ones(n, dtype=bool)
            ifail, ival = _list_item_first_fail(svals, itemtype, ones,
                                                sjots, sjot)
            ifail = ifail & sel & ~fail
            if ifail.any() and ival is not None:
                flat, vidx, fpos = ival[0], ival[1], ival[2]
                iwhats = ival[3] if len(ival) > 3 else None
                for i in np.nonzero(ifail)[0]:
                    paths[i] = f"{pkey(i)}[{int(fpos[i])}]"
                    whats[i] = str(iwhats[int(vidx[i])]) \
                        if iwhats is not None else "value"
                    if isinstance(flat, np.ndarray):
                        reprs[i] = str(flat[int(vidx[i])])
                    else:
                        v = flat[int(vidx[i])].as_py()
                        reprs[i] = "" if isinstance(v, (dict, list)) \
                            else js_string(v)
                fail |= ifail
            return fail, (paths, reprs, whats)
        self._add(r, ev)

    def _add_tuple_charlen_slot_rule(self, access, dotted, pos, it,
                                     it_tp, major, minor):
        """char[n,m] tuple slot: length violations report "length" +
        the length; null items are NOT defaulted (char[…] is array-ish
        to sjot_default) and fail "value" null. ``access(tbl)`` yields
        (list array | None, parent_ok)."""
        r = Rule(major, minor, dotted, it_tp, "length", it, inner=True)

        def ev(tbl, pos=pos, it=it):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            arr, parent_ok = access(tbl)
            if arr is None:
                return zeros, None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type):
                return zeros, None
            valid = _valid_mask(arr) & parent_ok
            lengths = np.where(_valid_mask(arr), np.nan_to_num(
                _np(pc.list_value_length(arr))), 0).astype(np.int64)
            starts = np.cumsum(lengths) - lengths
            sel = valid & (lengths > pos)
            if not sel.any():
                return zeros, None
            flat = arr.flatten()
            vsel = starts[sel] + pos
            elem = flat.take(pa.array(vsel, pa.int64()))
            fail = np.zeros(n, dtype=bool)
            reprs = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            e_null = ~_valid_mask(elem)
            ef, evals = _char_len_scalar_eval(elem, it)
            ef = ef | e_null
            rows_sel = np.nonzero(sel)[0]
            for k in np.nonzero(ef)[0]:
                i = int(rows_sel[k])
                fail[i] = True
                if e_null[k]:
                    whats[i], reprs[i] = "value", "null"
                elif isinstance(evals, np.ndarray):
                    whats[i] = "length"
                    reprs[i] = str(int(evals[int(k)]))
                else:
                    v = evals[int(k)].as_py()
                    whats[i] = "length"
                    reprs[i] = js_string(v) \
                        if not isinstance(v, (dict, list)) else ""
            fpos = np.full(n, pos, dtype=np.int64)
            return fail, (reprs, np.arange(n), fpos, whats)
        self._add(r, ev)

    def _add_tuple_container_slot_rule(self, access, dotted, pos, it,
                                       it_tp, major, minor):
        """Container-typed tuple slot (e.g. ``["int", "string[1,3]"]``
        over a list<list<…>> column): the slot's value is gathered per
        row from the tuple's flattened items and validated with full
        container semantics — a null item defaults to null for array
        types and fails "value" null (reference index.js:246-251 then
        1195), a scalar item fails "value" (not an array), then set-dup,
        bounds and first-failing-item in the reference's order. One dyn
        rule per slot: internal precedence replaces per-family minors,
        and the dyn paths carry the doubled ``[pos][j]`` suffix the
        single-suffix ``inner`` mechanism cannot express. ``access(tbl)``
        yields (tuple list array | None, parent_ok)."""
        is_set = it.endswith("}")
        bi = it.rfind("{" if is_set else "[")
        bounds = compile_bounds(it, bi + 1)
        itemtype, items_tp = self._resolve_path(it[:bi], it_tp)
        if not _is_scalar_str_type(itemtype):
            raise ColumnarCompileError(
                f"tuple slot {pos}: doubly-nested container {it!r}:"
                " use the row engine")
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, minor, dotted, it_tp, "value", it, dyn=True)

        def ev(tbl, dotted=dotted, pos=pos, it=it, is_set=is_set,
               bounds=bounds, itemtype=itemtype, it_tp=it_tp,
               items_tp=items_tp):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            arr, parent_ok = access(tbl)
            if arr is None:
                return zeros, None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type):
                return zeros, None
            valid = _valid_mask(arr) & parent_ok
            lengths = np.where(_valid_mask(arr), np.nan_to_num(
                _np(pc.list_value_length(arr))), 0).astype(np.int64)
            starts = np.cumsum(lengths) - lengths
            sel = valid & (lengths > pos)
            if not sel.any():
                return zeros, None
            flat = arr.flatten()
            vidx = np.where(sel, starts + pos, 0).astype(np.int64)
            flat_ok = _valid_mask(flat)[vidx] & sel if len(flat) \
                else np.zeros(n, dtype=bool)

            fail = np.zeros(n, dtype=bool)
            paths = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)
            base = f"{dotted}[{pos}]"

            def put(mask, what, rvals, path_suffix=None, tp=None):
                newly = mask & ~fail
                for i in np.nonzero(newly)[0]:
                    paths[i] = base if path_suffix is None \
                        else f"{base}{path_suffix[i]}"
                    whats[i] = what if isinstance(what, str) \
                        else what[i]
                    reprs[i] = rvals if isinstance(rvals, str) \
                        else rvals[i]
                    tps[i] = tp
                fail[newly] = True

            # 1. null item → sjot_default(array type) = null → "value"
            put(sel & ~flat_ok, "value", "null")
            if not _is_list_type(flat.type):
                # 2. scalar payload at the slot: the reference's type
                # duality validates the scalar against the container
                # type string's range scan ("value X is not an array
                # T[]" only when out of range — a scalar 1 against
                # "0..9[]" PASSES, index.js number branch)
                sf = _scalar_fail_mask(flat, it)[vidx] & flat_ok
                srep = np.full(n, "", dtype=object)
                for i in np.nonzero(sf)[0]:
                    v = flat[int(vidx[i])].as_py()
                    srep[i] = "" if isinstance(v, (dict, list)) \
                        else js_string(v)
                put(sf, "value", srep)
                return fail, (paths, reprs, whats, tps)
            take = pa.array(vidx, pa.int64(),
                            mask=~(sel & flat_ok))
            slot = flat.take(take)          # list array aligned to rows
            if is_set:
                # 3. set duplicates (reference order: dup before bounds)
                put(_set_dup_mask(slot) & flat_ok, "value", "")
                slot_items = _sort_sets(slot)
            else:
                slot_items = slot
            if bounds is not None:
                # 4. bounds → "length" with the actual length as datum
                slens = np.where(_valid_mask(slot), np.nan_to_num(
                    _np(pc.list_value_length(slot))), 0).astype(np.int64)
                lf = _length_fail_mask(slens, flat_ok & ~fail, bounds)
                put(lf, "length",
                    np.asarray([str(int(x)) for x in slens], dtype=object))
            # 5. first failing item → doubled [pos][j] suffix
            row_fail, vals = _list_item_first_fail(
                slot_items, itemtype, flat_ok & ~fail, sjots, sjot)
            if vals is not None and row_fail.any():
                iflat, ividx, ifpos = vals[0], vals[1], vals[2]
                iwhats = vals[3] if len(vals) > 3 else None
                suffix = np.full(n, None, dtype=object)
                irep = np.full(n, "", dtype=object)
                for i in np.nonzero(row_fail)[0]:
                    suffix[i] = f"[{int(ifpos[i])}]"
                    if isinstance(iflat, np.ndarray):
                        irep[i] = str(iflat[int(ividx[i])])
                    else:
                        v = iflat[int(ividx[i])].as_py()
                        irep[i] = "" if isinstance(v, (dict, list)) \
                            else js_string(v)
                put(row_fail,
                    np.asarray([str(iwhats[int(ividx[i])])
                                if iwhats is not None else "value"
                                for i in range(n)], dtype=object),
                    irep, path_suffix=suffix, tp=items_tp)
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _add_rowengine_value_rule(self, path, rt, typepath):
        """Generic per-POSITION row-engine value rule: validate one
        column / nested field's non-null cells against ANY type
        expression via the row engine (full reference grammar). Used as
        the degradation target when a position's type is beyond the
        vectorized compilers — the REST of the schema stays columnar,
        replacing the old whole-schema fallbacks. Presence/default
        rules for the position are emitted by the callers as usual;
        null ≡ absent, so null cells are skipped here."""
        sjots, sjot = self.sjots, self.sjot
        dotted = ".".join(path)
        major = self._next_major()
        r = Rule(major, 0, dotted, typepath, "value", "", dyn=True)

        def ev(tbl, path=tuple(path), rt=rt, tp=typepath, dotted=dotted):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None:
                return zeros, None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            valid = _valid_mask(arr) & parent_ok
            if not valid.any():
                return zeros, None
            is_map = pa.types.is_map(arr.type)
            fail = np.zeros(n, dtype=bool)
            paths_o = np.full(n, None, dtype=object)
            reprs_o = np.full(n, None, dtype=object)
            whats_o = np.full(n, None, dtype=object)
            tps_o = np.full(n, None, dtype=object)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            for i in np.nonzero(valid)[0]:
                cell = arr[int(i)].as_py()
                data = {k: _py_doc(v) for k, v in cell} if is_map \
                    else _py_doc(cell)
                try:
                    validate_value(sjots, data, rt, sjot,
                                   f"$.{dotted}", tp, ctx)
                except SJOTValidationError as e:
                    row = e.violation_row()
                    fail[i] = True
                    dp = row["datapath"]
                    paths_o[i] = dp[2:] if dp.startswith("$.") else dotted
                    reprs_o[i] = row["value_repr"]
                    whats_o[i] = row["what"]
                    tps_o[i] = row["typepath"]
                except SJOTSchemaError:
                    pass
            return fail, (paths_o, reprs_o, whats_o, tps_o)
        self._add(r, ev)

    def _add_nonscalar_tuple_slot(self, access, dotted, pos, it, it_tp,
                                  major, minor):
        """Dispatch one non-plain-scalar tuple slot to its rule family:
        char[n,m] → length rule; container with scalar items →
        vectorized container rule; everything else (object / union /
        nested tuple / doubly-nested container) → row-engine slot
        rule."""
        if isinstance(it, str) and _is_char_len_type(it):
            self._add_tuple_charlen_slot_rule(access, dotted, pos, it,
                                              it_tp, major, minor)
            return
        if isinstance(it, str) and _is_container_type(it):
            try:
                self._add_tuple_container_slot_rule(
                    access, dotted, pos, it, it_tp, major, minor)
                return
            except ColumnarCompileError:
                pass        # doubly-nested items: row engine per slot
        self._add_tuple_rowengine_slot_rule(access, dotted, pos, it,
                                            it_tp, major, minor)

    def _add_tuple_rowengine_slot_rule(self, access, dotted, pos, it,
                                       it_tp, major, minor):
        """Object / union / nested-tuple typed tuple slot: gather the
        slot's value per row and validate it through the row engine
        (exact reference semantics for the full type grammar). Null
        items are replaced by the slot type's default first (reference
        index.js:246-251 — null for non-primitive types, so they fail
        "value" null). Rare shapes; per-row cost proportional to rows
        actually carrying the slot."""
        sjots, sjot = self.sjots, self.sjot
        null_default = default_value("null", sjots, None, it, sjot)
        r = Rule(major, minor, dotted, it_tp, "value", "", dyn=True)

        def ev(tbl, dotted=dotted, pos=pos, it=it, it_tp=it_tp,
               null_default=null_default):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            arr, parent_ok = access(tbl)
            if arr is None:
                return zeros, None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type):
                return zeros, None
            valid = _valid_mask(arr) & parent_ok
            lengths = np.where(_valid_mask(arr), np.nan_to_num(
                _np(pc.list_value_length(arr))), 0).astype(np.int64)
            starts = np.cumsum(lengths) - lengths
            sel = valid & (lengths > pos)
            if not sel.any():
                return zeros, None
            flat = arr.flatten()
            # an EMPTY map cell as_py()s to [] — force dict conversion
            # so it reads as {} (the map-vs-empty-list ambiguity)
            is_map_items = pa.types.is_map(flat.type)
            fail = np.zeros(n, dtype=bool)
            paths = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            tps = np.full(n, None, dtype=object)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            base = f"{dotted}[{pos}]"
            for i in np.nonzero(sel)[0]:
                cell = flat[int(starts[i] + pos)]
                if not cell.is_valid:
                    data = null_default
                elif is_map_items:
                    data = {k: _py_doc(v) for k, v in cell.as_py()}
                else:
                    data = _py_doc(cell.as_py())
                try:
                    validate_value(sjots, data, it, sjot, f"$.{base}",
                                   it_tp, ctx)
                except SJOTValidationError as e:
                    row = e.violation_row()
                    fail[i] = True
                    dp = row["datapath"]
                    paths[i] = dp[2:] if dp.startswith("$.") else base
                    reprs[i] = row["value_repr"]
                    whats[i] = row["what"]
                    tps[i] = row["typepath"]
                except SJOTSchemaError:
                    pass
            return fail, (paths, reprs, whats, tps)
        self._add(r, ev)

    def _add_map_charlen_value_rule(self, name, pname, rt, prop_tp,
                                    required, major, pattern=None):
        """char[n,m] string-length map values: per-entry length rule
        (what="length", the LENGTH as datum; explicit nulls fail "value"
        null for required/regex props), plus — for regex props — a
        struct-layout per-field companion."""
        r = Rule(major, 0, name, prop_tp, "length", rt, child=True,
                 list_col=name, map_entry=True, dyn=True)

        def ev(child_tbl, pname=pname, rt=rt, required=required,
               pattern=pattern):
            n = child_tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if "key" not in child_tbl.column_names:
                return zeros, None
            keys = child_tbl["key"]
            vals = child_tbl["value"]
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            if pattern is not None:
                km = _valid_mask(keys) & ~_fullmatch_mask(keys, pattern)
            else:
                km = _np(pc.fill_null(pc.equal(keys, pname),
                                      False)).astype(bool)
            lf, lens = _char_len_scalar_eval(vals, rt)
            fail = lf & km
            paths = np.full(n, None, dtype=object)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            for i in np.nonzero(fail)[0]:
                paths[i] = pname if pattern is None \
                    else keys[int(i)].as_py()
                whats[i] = "length"
                if isinstance(lens, np.ndarray):
                    reprs[i] = str(int(lens[int(i)]))
                else:   # shape-mismatch branch: values are the array
                    v = lens[int(i)].as_py()
                    reprs[i] = js_string(v) \
                        if not isinstance(v, (dict, list)) else ""
            if required:
                nf = km & ~_valid_mask(vals) & ~fail
                for i in np.nonzero(nf)[0]:
                    paths[i] = pname if pattern is None \
                        else keys[int(i)].as_py()
                    whats[i], reprs[i] = "value", "null"
                fail |= nf
            return fail, (paths, reprs, whats)
        self._add(r, ev)

        if pattern is not None:
            from ..core.validator import compile_regex_type
            matcher = compile_regex_type(pattern)
            r2 = Rule(major, 1, name, prop_tp, "length", rt, dyn=True)

            def ev_struct(tbl, rt=rt):
                zeros = np.zeros(tbl.num_rows, dtype=bool)
                if name not in tbl.column_names:
                    return zeros, None
                a0 = tbl[name]
                if isinstance(a0, pa.ChunkedArray):
                    a0 = a0.combine_chunks()
                if not pa.types.is_struct(a0.type):
                    return zeros, None
                n = tbl.num_rows
                svalid = _valid_mask(a0)
                fail = np.zeros(n, dtype=bool)
                paths = np.full(n, None, dtype=object)
                whats = np.full(n, None, dtype=object)
                reprs = np.full(n, None, dtype=object)
                for fld in a0.type:
                    if matcher.fullmatch(fld.name) is None:
                        continue
                    farr = a0.field(fld.name)
                    ff, lens = _char_len_scalar_eval(
                        farr, rt, extra_valid=svalid)
                    for i in np.nonzero(ff & ~fail)[0]:
                        paths[i] = f"{name}.{fld.name}"
                        whats[i] = "length"
                        if isinstance(lens, np.ndarray):
                            reprs[i] = str(int(lens[int(i)]))
                        else:
                            v = lens[int(i)].as_py()
                            reprs[i] = js_string(v) \
                                if not isinstance(v, (dict, list)) else ""
                    fail |= ff
                return fail, (paths, reprs, whats)
            self._add(r2, ev_struct)

    def _add_struct_regex_container_rule(self, name, pattern, rt,
                                         prop_tp, major):
        """Struct-layout companion for a container-typed regex prop:
        fields matching the pattern validate as lists/sets
        (first-failing-field wins, data order; null fields ≡ absent on
        struct layouts)."""
        is_set = rt.endswith("}")
        j = rt.rfind("{" if is_set else "[")
        bounds = compile_bounds(rt, j + 1)
        itemtype, _tp = self._resolve_path(rt[:j], prop_tp)
        if not _is_scalar_str_type(itemtype):
            raise ColumnarCompileError(
                "doubly-nested regex-prop value types: row engine")
        from ..core.validator import compile_regex_type
        matcher = compile_regex_type(pattern)
        sjots, sjot = self.sjots, self.sjot
        r = Rule(major, 1, name, prop_tp, "value", rt, dyn=True)

        def ev(tbl, rt=rt, itemtype=itemtype, is_set=is_set,
               bounds=bounds):
            zeros = np.zeros(tbl.num_rows, dtype=bool)
            if name not in tbl.column_names:
                return zeros, None
            a0 = tbl[name]
            if isinstance(a0, pa.ChunkedArray):
                a0 = a0.combine_chunks()
            if not pa.types.is_struct(a0.type):
                return zeros, None
            n = tbl.num_rows
            svalid = _valid_mask(a0)
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)
            for fld in a0.type:
                if matcher.fullmatch(fld.name) is None:
                    continue
                farr = a0.field(fld.name)
                fp = f"{name}.{fld.name}"
                if not _is_list_type(farr.type):
                    ff = _scalar_fail_mask(farr, rt) & svalid
                    for i in np.nonzero(ff & ~fail)[0]:
                        v = farr[int(i)].as_py()
                        whats[i] = "value"
                        reprs[i] = js_string(v) \
                            if not isinstance(v, (dict, list)) else ""
                        paths[i] = fp
                    fail |= ff
                    continue
                fvalid = _valid_mask(farr) & svalid
                ffail = np.zeros(n, dtype=bool)
                if is_set:
                    dup = _set_dup_mask(farr) & fvalid
                    for i in np.nonzero(dup & ~fail & ~ffail)[0]:
                        whats[i], reprs[i], paths[i] = "value", "", fp
                    ffail |= dup
                if bounds is not None:
                    lengths = np.where(fvalid, np.nan_to_num(
                        _np(pc.list_value_length(farr))),
                        0).astype(np.int64)
                    lf = _length_fail_mask(lengths, fvalid, bounds) \
                        & fvalid & ~ffail
                    for i in np.nonzero(lf & ~fail)[0]:
                        whats[i] = "length"
                        paths[i] = fp
                        reprs[i] = str(int(lengths[i]))
                    ffail |= lf
                sarr = _sort_sets(farr) if is_set else farr
                ifail, ival = _list_item_first_fail(
                    sarr, itemtype, fvalid, sjots, sjot)
                ifail = ifail & ~ffail
                if ifail.any() and ival is not None:
                    flat, vidx, fpos = ival[0], ival[1], ival[2]
                    iwhats = ival[3] if len(ival) > 3 else None
                    for i in np.nonzero(ifail & ~fail)[0]:
                        paths[i] = f"{fp}[{int(fpos[i])}]"
                        whats[i] = str(iwhats[int(vidx[i])]) \
                            if iwhats is not None else "value"
                        if isinstance(flat, np.ndarray):
                            reprs[i] = str(flat[int(vidx[i])])
                        else:
                            v = flat[int(vidx[i])].as_py()
                            reprs[i] = "" if isinstance(v, (dict, list)) \
                                else js_string(v)
                    ffail |= ifail
                fail |= ffail
            return fail, (paths, reprs, whats)
        self._add(r, ev)

    def _compile_tuple_rules(self, name, rt, typepath, major):
        """Tuple [type, type, ...] over a list column: a length rule
        (reference "array of length", index.js:240-244 — typepath without
        "[]", the ACTUAL length as the datum) then one positional rule per
        tuple slot on the flattened child table, selected by item index
        (index.js:246-251 validates data[i] against type[i] under
        typepath+"[]"; null items are replaced by type[i]'s default)."""
        minor = 0
        shape_rule = Rule(major, minor, name, typepath, "value",
                          js_string(rt))

        def ev_shape(tbl, name=name):
            if name not in tbl.column_names:
                return np.zeros(tbl.num_rows, dtype=bool), None
            arr = tbl[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            return _valid_mask(arr), arr
        self._add(shape_rule, ev_shape)
        minor += 1
        want = len(rt)
        rule = Rule(major, minor, name, typepath, "array of length",
                    js_string(rt))

        def ev_len(tbl, name=name, want=want):
            if name not in tbl.column_names:
                return np.zeros(tbl.num_rows, dtype=bool), None
            arr = tbl[name]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            valid = _valid_mask(arr)
            lengths = np.where(valid, _np(pc.list_value_length(arr)),
                               want).astype(np.int64)
            return valid & (lengths != want), lengths
        self._add(rule, ev_len)
        minor += 1

        for pos, t in enumerate(rt):
            it, it_tp = self._resolve_path(t, typepath + "[]")
            if not _is_scalar_str_type(it) or _is_char_len_type(it):
                def access(tbl, name=name):
                    if name not in tbl.column_names:
                        return None, None
                    a = tbl[name]
                    if isinstance(a, pa.ChunkedArray):
                        a = a.combine_chunks()
                    return a, np.ones(tbl.num_rows, dtype=bool)
                self._add_nonscalar_tuple_slot(access, name, pos, it,
                                               it_tp, major, minor)
                minor += 1
                continue
            r = Rule(major, minor, name, it_tp, "value", it,
                     child=True, list_col=name)
            null_item_fails = not _null_item_ok(self.sjots, self.sjot, it)
            null_default = default_value("null", self.sjots, None, it,
                                         self.sjot) if null_item_fails \
                else None

            def ev_child(child_tbl, pos=pos, it=it,
                         null_item_fails=null_item_fails,
                         null_default=null_default):
                at_pos = _np(child_tbl["__idx__"]) == pos
                arr = child_tbl["__item__"]
                fail = _scalar_fail_mask(arr, it)
                if null_item_fails:
                    fail = fail | ~_valid_mask(arr)
                    arr = _fill_item_default(arr, null_default)
                return fail & at_pos, arr
            self._add(r, ev_child)
            minor += 1

    def _compile_child_object(self, list_col, obj_type, typepath, major,
                              minor_start):
        if "@extends" in obj_type:
            extend_type(self.sjots, obj_type, self.sjot, typepath)
        minor = minor_start

        # MAP-typed ITEMS (list<map<string, …>> against an item-object
        # type): the struct-field rules below are blind to entry-keyed
        # items (they false-FAILed valid ones before r4), so one parent-
        # level dyn rule routes each valid map item through the row
        # engine (full object semantics) — first failing item wins; it
        # stops at the first NULL item so the null-item rule's ordering
        # key keeps winning there. All struct-field rules gate on
        # _struct_items_ok, so this rule fully owns map items.
        sjots_, sjot_ = self.sjots, self.sjot
        r_map = Rule(major, minor, list_col, typepath, "value", "",
                     dyn=True)

        def ev_map_items(tbl, obj=dict(obj_type), tp=typepath,
                         list_col=list_col):
            n = tbl.num_rows
            zeros = np.zeros(n, dtype=bool)
            if list_col not in tbl.column_names:
                return zeros, None
            arr = tbl[list_col]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if not _is_list_type(arr.type) \
                    or not pa.types.is_map(arr.type.value_type):
                return zeros, None
            valid = _valid_mask(arr)
            fail = np.zeros(n, dtype=bool)
            paths_o = np.full(n, None, dtype=object)
            reprs_o = np.full(n, None, dtype=object)
            whats_o = np.full(n, None, dtype=object)
            tps_o = np.full(n, None, dtype=object)
            if not valid.any():
                return fail, (paths_o, reprs_o, whats_o, tps_o)
            from ..core import Context, SJOTValidationError
            from ..core.validator import validate_value
            ctx = Context()
            for i in np.nonzero(valid)[0]:
                cell = arr[int(i)].as_py()
                for j, item in enumerate(cell or ()):
                    if item is None:
                        break       # the null-item rule owns this slot
                    doc = {k: _py_doc(v) for k, v in item}
                    try:
                        validate_value(sjots_, doc, obj, sjot_,
                                       f"$.{list_col}[{j}]", tp, ctx)
                    except SJOTValidationError as e:
                        row = e.violation_row()
                        fail[i] = True
                        dp = row["datapath"]
                        paths_o[i] = dp[2:] if dp.startswith("$.") \
                            else f"{list_col}[{j}]"
                        reprs_o[i] = row["value_repr"]
                        whats_o[i] = row["what"]
                        tps_o[i] = row["typepath"]
                        break
                    except SJOTSchemaError:
                        break
            return fail, (paths_o, reprs_o, whats_o, tps_o)
        self._add(r_map, ev_map_items)
        minor += 1

        # a null struct item → replaced by the item default (null) → fails
        # the object type (reference index.js:234-236 then 154-159)
        rule = Rule(major, minor, list_col, typepath, "value",
                    "[object Object]", child=True, list_col=list_col)

        def ev_null(child_tbl):
            return ~_valid_mask(child_tbl["__item__"]), child_tbl["__item__"]
        self._add(rule, ev_null)
        minor += 1

        for prop, proptype in obj_type.items():
            if prop.startswith("@"):
                if prop in ("@one", "@any", "@all"):
                    for pset in proptype:
                        r = Rule(major, minor, list_col,
                                 typepath + "/" + prop,
                                 f"requires {_PSET_WORD[prop]}"
                                 f" {','.join(pset)} properties", "",
                                 no_value=True, child=True, list_col=list_col)

                        def ev(child_tbl, pset=pset, kind=prop):
                            ok_parent = _struct_items_ok(child_tbl)
                            present = [_presence(child_tbl, p) for p in pset]
                            return (_pset_fail(kind, present,
                                               child_tbl.num_rows)
                                    & ok_parent), None
                        self._add(r, ev)
                        minor += 1
                elif prop == "@dep":
                    for dname, dep in proptype.items():
                        dlist = [dep] if isinstance(dep, str) else list(dep)
                        r = Rule(major, minor, list_col, typepath + "/@dep",
                                 f"requires {js_string(dep)}", "",
                                 no_value=True, child=True, list_col=list_col,
                                 field_name=dname)

                        def ev(child_tbl, dname=dname, dlist=dlist):
                            has = _presence(child_tbl, dname)
                            ok = np.ones(child_tbl.num_rows, dtype=bool)
                            for d in dlist:
                                ok &= _presence(child_tbl, d)
                            return (has & ~ok
                                    & _struct_items_ok(child_tbl)), None
                        self._add(r, ev)
                        minor += 1
                continue
            if prop.startswith("("):
                # regex property name over item-struct fields: same
                # treatment as nested structs — matching fields found per
                # batch from the item struct's Arrow type, field order =
                # data order, first-failing-field-wins; exact per-item
                # datapath/value via the dyn mechanism. Scalar value
                # types only.
                rt, prop_tp = self._resolve_path(proptype,
                                                 f"{typepath}/{prop}")
                if not _is_scalar_str_type(rt) or _is_char_len_type(rt):
                    raise ColumnarCompileError(
                        "non-scalar regex-prop value types in item"
                        " objects: row engine")
                from ..core.validator import compile_regex_type
                matcher = compile_regex_type(prop)
                r = Rule(major, minor, list_col, prop_tp, "value", rt,
                         child=True, list_col=list_col, dyn=True)

                def ev(child_tbl, matcher=matcher, rt=rt):
                    items = child_tbl["__item__"]
                    if isinstance(items, pa.ChunkedArray):
                        items = items.combine_chunks()
                    n = child_tbl.num_rows
                    if not pa.types.is_struct(items.type):
                        return np.zeros(n, dtype=bool), None
                    ok_parent = _valid_mask(items)
                    fail = np.zeros(n, dtype=bool)
                    paths_o = np.full(n, None, dtype=object)
                    reprs_o = np.full(n, None, dtype=object)
                    for f in items.type:
                        if matcher.fullmatch(f.name) is None:
                            continue
                        farr = items.field(f.name)
                        ff = _scalar_fail_mask(farr, rt) & ok_parent
                        newly = ff & ~fail
                        for i in np.nonzero(newly)[0]:
                            v = farr[int(i)].as_py()
                            reprs_o[i] = "" \
                                if isinstance(v, (dict, list)) \
                                else js_string(v)
                            paths_o[i] = f.name
                        fail |= ff
                    return fail, (paths_o, reprs_o)
                self._add(r, ev)
                minor += 1
                continue
            q = prop.find("?")
            pname = prop[:q] if q != -1 else prop
            required = q == -1
            rt, prop_tp = self._resolve_path(proptype, f"{typepath}/{prop}")

            if required:
                r = Rule(major, minor, list_col, typepath,
                         "should be present", "", no_value=True, child=True,
                         list_col=list_col, field_name=pname)

                def ev(child_tbl, pname=pname):
                    ok_parent = _struct_items_ok(child_tbl)
                    return ok_parent & ~_presence(child_tbl, pname), None
                self._add(r, ev)
                minor += 1
            else:
                dv = self._default_violation(prop, q, proptype, typepath)
                if dv is not None:
                    what, repr_, tp = dv
                    r = Rule(major, minor, list_col, tp, what, "",
                             child=True, list_col=list_col,
                             field_name=pname, const_repr=repr_)

                    def ev(child_tbl, pname=pname):
                        ok_parent = _struct_items_ok(child_tbl)
                        return (ok_parent
                                & ~_presence(child_tbl, pname)), None
                    self._add(r, ev)
                    minor += 1

            if isinstance(rt, str) and _is_container_type(rt):
                minor = self._compile_child_list_prop(
                    list_col, pname, rt, prop_tp, major, minor)
                continue
            if isinstance(rt, dict):
                # nested OBJECT field inside an item object (e.g.
                # spans[i].meta.{…}): the flattened child table carries
                # the item struct's fields as columns, so the nested
                # compile machinery applies verbatim — compile it, then
                # REBASE the produced rules into this item object's major
                # with sequential minors (all rules of one item object
                # must share a major: the per-item ordering term sits
                # between major and minor, and the reference validates
                # item 0 completely before item 1).
                minor = self._compile_item_object_field(
                    list_col, pname, rt, prop_tp, major, minor)
                continue
            if is_union(rt):
                # union field inside an item object: the generalized
                # union kernel runs over the child table (the field is a
                # child-table column), rebased like object fields
                mark = len(self.rules)
                saved_major = self._major
                self._compile_union_rules(pname, rt, prop_tp,
                                          self._next_major(),
                                          path=(pname,))
                self._major = saved_major
                for r, _ev in self.rules[mark:]:
                    r.major = major
                    r.minor = minor
                    minor += 1
                    r.child = True
                    r.list_col = list_col
                    if not r.dyn:
                        r.field_name = r.prop
                continue
            if isinstance(rt, list):
                # tuple field inside an item object: the nested-struct
                # tuple compiler binds via _nested_field, which resolves
                # the field as a child-table column — rebase like the
                # other item-field kinds
                mark = len(self.rules)
                saved_major = self._major
                self._compile_struct_tuple_prop([pname], rt, prop_tp,
                                                self._next_major())
                self._major = saved_major
                for r, _ev in self.rules[mark:]:
                    r.major = major
                    r.minor = minor
                    minor += 1
                    r.child = True
                    r.list_col = list_col
                    if not r.dyn:
                        r.field_name = r.prop
                continue
            if not isinstance(rt, str):
                raise ColumnarCompileError(
                    "unsupported item field type: row engine")
            if rt == "any":
                # any-typed item field: interpret embedded @sjot
                # carriers (rebased like the other item-field kinds)
                mark = len(self.rules)
                saved_major = self._major
                self._compile_embedded_sjot_rule([pname], prop_tp,
                                                 self._next_major())
                self._major = saved_major
                for r, _ev in self.rules[mark:]:
                    r.major = major
                    r.minor = minor
                    minor += 1
                    r.child = True
                    r.list_col = list_col
                continue
            if _is_char_len_type(rt):
                # char[n,m] string-length type: "length" label + the
                # LENGTH as the datum (reference index.js:679-690)
                r = Rule(major, minor, list_col, prop_tp, "length", rt,
                         child=True, list_col=list_col, field_name=pname)

                def ev_len(child_tbl, pname=pname, rt=rt):
                    if pname not in child_tbl.column_names:
                        return (np.zeros(child_tbl.num_rows, dtype=bool),
                                None)
                    arr = child_tbl[pname]
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                    return _char_len_scalar_eval(
                        arr, rt,
                        extra_valid=_valid_mask(child_tbl["__item__"]))
                self._add(r, ev_len)
                minor += 1
                continue
            r = Rule(major, minor, list_col, prop_tp, "value", rt,
                     child=True, list_col=list_col, field_name=pname)

            def ev(child_tbl, pname=pname, rt=rt):
                if pname not in child_tbl.column_names:
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                return _scalar_fail_mask(child_tbl[pname], rt), child_tbl[pname]
            self._add(r, ev)
            minor += 1

        if bool(obj_type.get("@final", False)):
            # runtime @final against the item struct's physical fields
            # (reference index.js:448-451; @sjot and regex-matched
            # fields exempt)
            from ..core.validator import compile_regex_type
            prop_names = frozenset(
                p.split("?")[0] for p in obj_type
                if not p.startswith("@") and not p.startswith("("))
            regex_matchers = tuple(compile_regex_type(p) for p in obj_type
                                   if p.startswith("("))
            r = Rule(major, minor, list_col, typepath + "/@final",
                     "additional property should not be present", "",
                     no_value=True, child=True, list_col=list_col)

            def ev(child_tbl, props=prop_names, rxs=regex_matchers):
                items = child_tbl["__item__"]
                if isinstance(items, pa.ChunkedArray):
                    items = items.combine_chunks()
                n = child_tbl.num_rows
                if not pa.types.is_struct(items.type):
                    return np.zeros(n, dtype=bool), None
                ok_parent = _valid_mask(items)
                fail = np.zeros(n, dtype=bool)
                first = np.full(n, None, dtype=object)
                for f in items.type:
                    if f.name in props or f.name == "@sjot" \
                            or any(m.fullmatch(f.name) for m in rxs):
                        continue
                    fv = _valid_mask(items.field(f.name))
                    newly = fv & ~fail
                    first[newly] = f.name
                    fail |= fv
                return fail & ok_parent, first
            self._add(r, ev)
            minor += 1

    def _compile_child_list_prop(self, list_col, pname, rt, typepath,
                                 major, minor) -> int:
        """List/set-typed field inside a list-item object (e.g.
        ``spans[i].tags``): set-dup, bounds, then first-failing-item
        rules over the second-level flatten. Returns the next minor."""
        is_set = rt.endswith("}")
        i = rt.rfind("{" if is_set else "[")
        bounds = compile_bounds(rt, i + 1)
        itemtype, items_tp = self._resolve_path(rt[:i], typepath)
        if not _is_scalar_str_type(itemtype):
            raise ColumnarCompileError(
                "doubly-nested containers inside list items: row engine")
        r0 = Rule(major, minor, list_col, typepath, "value", rt,
                  child=True, list_col=list_col, field_name=pname)

        def ev_shape(child_tbl, pname=pname, rt_s=rt):
            if pname not in child_tbl.column_names:
                return np.zeros(child_tbl.num_rows, dtype=bool), None
            arr = child_tbl[pname]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if _is_list_type(arr.type):
                return np.zeros(child_tbl.num_rows, dtype=bool), None
            ok = _valid_mask(child_tbl["__item__"])
            return _scalar_fail_mask(arr, rt_s) & ok, arr
        self._add(r0, ev_shape)
        minor += 1
        if is_set:
            r = Rule(major, minor, list_col, typepath, "value", rt,
                     child=True, list_col=list_col, field_name=pname)

            def ev(child_tbl, pname=pname):
                if pname not in child_tbl.column_names:
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                ok = _valid_mask(child_tbl["__item__"])
                return (_set_dup_mask(child_tbl[pname]) & ok,
                        child_tbl[pname])
            self._add(r, ev)
            minor += 1
        if bounds is not None:
            r = Rule(major, minor, list_col, typepath, "length", rt,
                     child=True, list_col=list_col, field_name=pname)

            def ev(child_tbl, pname=pname, bounds=bounds):
                if pname not in child_tbl.column_names:
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                ok = _valid_mask(child_tbl["__item__"])
                arr = child_tbl[pname]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if not _is_list_type(arr.type):
                    return np.zeros(child_tbl.num_rows, dtype=bool), None
                valid = _valid_mask(arr) & ok
                lengths = np.where(
                    valid, np.nan_to_num(_np(pc.list_value_length(arr))),
                    0).astype(np.int64)
                return _length_fail_mask(lengths, valid, bounds), lengths
            self._add(r, ev)
            minor += 1
        r = Rule(major, minor, list_col, items_tp,
                 "length" if _is_char_len_type(itemtype) else "value",
                 itemtype, child=True, list_col=list_col, field_name=pname,
                 inner=True)
        sjots, sjot = self.sjots, self.sjot

        def ev(child_tbl, pname=pname, itemtype=itemtype, is_set=is_set):
            if pname not in child_tbl.column_names:
                return np.zeros(child_tbl.num_rows, dtype=bool), None
            ok = _valid_mask(child_tbl["__item__"])
            arr = child_tbl[pname]
            if is_set:  # items validated in String()-sorted order
                arr = _sort_sets(arr)
            return _list_item_first_fail(arr, itemtype, ok, sjots, sjot)
        self._add(r, ev)
        return minor + 1

    def _compile_struct_list_prop(self, fpath, rt, typepath, major):
        """List/set-typed field inside a nested struct (e.g.
        ``meta.tags``): same rule family, accessed via the struct path."""
        is_set = rt.endswith("}")
        i = rt.rfind("{" if is_set else "[")
        bounds = compile_bounds(rt, i + 1)
        itemtype, items_tp = self._resolve_path(rt[:i], typepath)
        if not _is_scalar_str_type(itemtype):
            raise ColumnarCompileError(
                "doubly-nested containers inside structs: row engine")
        dotted = ".".join(fpath)
        minor = 0
        # shape rule: non-list field against an array/set type (same
        # scalar-data quirks as the top-level shape rule)
        r0 = Rule(major, minor, dotted, typepath, "value", rt)

        def ev_shape(tbl, path=tuple(fpath), rt_s=rt):
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None or _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            return _scalar_fail_mask(arr, rt_s) & parent_ok, arr
        self._add(r0, ev_shape)
        minor += 1
        if is_set:
            r = Rule(major, minor, dotted, typepath, "value", rt)

            def ev(tbl, path=tuple(fpath)):
                arr, parent_ok = _nested_field(tbl, list(path))
                if arr is None:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                return _set_dup_mask(arr) & parent_ok, arr
            self._add(r, ev)
            minor += 1
        if bounds is not None:
            r = Rule(major, minor, dotted, typepath, "length", rt)

            def ev(tbl, path=tuple(fpath), bounds=bounds):
                arr, parent_ok = _nested_field(tbl, list(path))
                if arr is None or not _is_list_type(arr.type):
                    return np.zeros(tbl.num_rows, dtype=bool), None
                valid = _valid_mask(arr) & parent_ok
                lengths = np.where(
                    valid, np.nan_to_num(_np(pc.list_value_length(arr))),
                    0).astype(np.int64)
                return _length_fail_mask(lengths, valid, bounds), lengths
            self._add(r, ev)
            minor += 1
        r = Rule(major, minor, dotted, items_tp,
                 "length" if _is_char_len_type(itemtype) else "value",
                 itemtype, inner=True)
        sjots, sjot = self.sjots, self.sjot

        def ev(tbl, path=tuple(fpath), itemtype=itemtype, is_set=is_set):
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None:
                return np.zeros(tbl.num_rows, dtype=bool), None
            if is_set:  # items validated in String()-sorted order
                arr = _sort_sets(arr)
            return _list_item_first_fail(arr, itemtype, parent_ok,
                                         sjots, sjot)
        self._add(r, ev)

    def _compile_union_rules(self, name, rt, typepath, major, path=None):
        """Union over a top-level column, both data shapes:

        * scalar column (reference depth n=1): try-each-branch — the
          n==1 runtime is a try-loop over all branches
          (core/validator.py:_validate_union), and non-matching-kind
          scalar masks reject everything, so the conjunction reproduces
          the dispatch.
        * flat LIST column (depth n=2): the reference's per-depth
          dispatch (build_union_dispatch) picks at most ONE branch per
          item kind; the kernel classifies rows (empty list /
          list-of-list / null first item / scalar first item) and
          validates each class against its dispatched CONTAINER branch
          — set-dup, bounds, first-failing-item order, exactly the row
          engine's array validator. Branches resolving to objects or
          tuples, or nested deeper than one container suffix, stay on
          the row engine (compile-time fallback).
        """
        sjots, sjot = self.sjots, self.sjot

        def access(tbl):
            """(array, parent_ok) for the union's payload — a top-level
            column or a nested struct field (``path``)."""
            if path is None:
                if name not in tbl.column_names:
                    return None, None
                arr = tbl[name]
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                return arr, np.ones(tbl.num_rows, dtype=bool)
            return _nested_field(tbl, list(path))

        # compile-time dispatch table (raises SJOTSchemaError on
        # ambiguous unions exactly like the row engine)
        from ..core.validator import build_union_dispatch
        table: dict = {}
        supported_list = True
        for i, branch in enumerate(rt[0]):
            build_union_dispatch(sjots, branch, branch, sjot,
                                 f"{typepath}[[{i}]]", table, 1)
            b = branch
            while isinstance(b, str) and "#" in b \
                    and not b.startswith("(") and not b.endswith("]") \
                    and not b.endswith("}"):
                b = reftype(sjots, b, sjot)
            if isinstance(b, list):
                supported_list = False  # tuple branches: row path
            # dict branches don't participate in list-depth dispatch —
            # they are handled by the object-branch rule below
        cutoff = table.get(0)
        if not isinstance(cutoff, int):
            cutoff = None     # a slots object parked by a bare "char"
        slots2 = table.get(2)
        if slots2 is not None and (slots2.o is not None
                                   or slots2.t is not None
                                   or slots2.p is not None):
            supported_list = False
        if table.get(3) is not None:
            supported_list = False  # depth>2 branches: row engine

        # depth-1 OBJECT branches: the reference's dispatch slots drive
        # everything — slots.o (wildcard/empty object), slots.t/v/d
        # (@if/@then discriminator triples), slots.p (prop-name →
        # branch). All three compile below; each distinct target object
        # gets an embedded sub-validator.
        obj_dispatch = None
        _slots1 = table.get(1)
        has_obj = _slots1 is not None and (
            _slots1.o is not None or _slots1.t is not None
            or _slots1.p is not None)
        if has_obj and path is not None:
            # nested-payload object branches: the embedded sub-compiler
            # binds top-level columns only — row engine
            raise ColumnarCompileError(
                "union with object branches on a nested payload:"
                " row engine")
        if has_obj:
            # Generalized object-branch dispatch (reference runtime
            # core/validator.py:_validate_union, index.js:878-900):
            #   1. slots.o set → EVERY object row validates against it
            #      ("object" accepts all; a dict branch gets a compiled
            #      sub-validator) — @if/prop dispatch is unreachable;
            #   2. else @if/@then triples in declaration order: disc
            #      prop present AND its value valid against the @then
            #      prop's type → dispatch to that @then object;
            #   3. else first data property (field/entry order) naming
            #      a slots.p branch selects that branch;
            #   4. no match → the union's "value" error.
            # Each distinct target object compiles to an embedded
            # sub-validator run once per batch, masked to its rows.
            slots1 = table.get(1)

            def _resolve_branch(b):
                while isinstance(b, str) and "#" in b \
                        and not b.startswith("(") and not b.endswith("]") \
                        and not b.endswith("}"):
                    b = reftype(sjots, b, sjot)
                return b

            def _compile_sub(bdict):
                if "@extends" in bdict:
                    extend_type(sjots, bdict, sjot, typepath)
                # the full _compile_struct_props surface is admitted
                # (regex props, char-length/container/nested/union/tuple
                # prop values, propsets/@dep) — map-layout payloads of
                # branches beyond the scalar companions are owned by the
                # embedded row-engine catch-all via the map_owner gate;
                # genuinely unsupported shapes raise from the nested
                # compilers and fall the whole schema back as before
                sub = TableValidator.__new__(TableValidator)
                sub.sjots, sub.sjot = self.sjots, self.sjot
                sub.extras_column = None
                sub.root_value_column = None
                sub._major = -1
                sub.rules = []
                sub._compile_struct_props([name], bdict, typepath)
                # drop the sub shape rule (rule 0): other layouts are
                # dispatched by the scalar/list kernels, not this branch
                sub.rules = sub.rules[1:]
                return sub

            o_target = None          # None | ("any",) | ("sub", sub)
            if_specs: list[tuple] = []   # (disc, scalar_type, sub)
            prop_specs: dict = {}        # prop name → target index
            targets: list = []           # sub validators (None = accept)
            if slots1 is not None and slots1.o is not None:
                ob = _resolve_branch(slots1.o)
                if ob == "object":
                    o_target = ("any",)
                elif isinstance(ob, dict):
                    o_target = ("sub",)
                    targets.append(_compile_sub(ob))
                else:
                    raise ColumnarCompileError(
                        "union object-slot branch shape: row engine")
            if o_target is None and slots1 is not None \
                    and slots1.t is not None:
                for disc, vt, d in zip(slots1.t, slots1.v, slots1.d):
                    rvt, _tp = self._resolve_path(vt, typepath)
                    if not _is_scalar_str_type(rvt) \
                            or _is_char_len_type(rvt):
                        raise ColumnarCompileError(
                            "@if discriminator value type beyond plain"
                            " scalars: row engine")
                    if_specs.append((disc, rvt, len(targets)))
                    targets.append(_compile_sub(d))
            if o_target is None and slots1 is not None \
                    and slots1.p is not None:
                by_branch: dict[int, int] = {}
                for pname, br in slots1.p.items():
                    key = id(br)
                    ti = by_branch.get(key)
                    if ti is None:
                        bd = _resolve_branch(br)
                        if not isinstance(bd, dict):
                            raise ColumnarCompileError(
                                "union prop-dispatch branch shape:"
                                " row engine")
                        ti = len(targets)
                        targets.append(_compile_sub(bd))
                        by_branch[key] = ti
                    prop_specs[pname] = ti
            obj_dispatch = (o_target, if_specs, prop_specs, targets)

        rule = Rule(major, 0, name, typepath, "value", js_string(rt))

        _cutoff = table.get(0)
        if not isinstance(_cutoff, int):
            _cutoff = None    # a slots object parked by a bare "char"
        _s1 = table.get(1)

        def ev_scalar(tbl, rt=rt):
            arr, pok = access(tbl)
            if arr is None:
                return np.zeros(tbl.num_rows, dtype=bool), None
            if _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            kind = _scalar_kind_of_arrow(arr.type)
            if kind is None:
                if obj_dispatch is not None:
                    # object layouts dispatch to the object-branch rule
                    return np.zeros(tbl.num_rows, dtype=bool), None
                # struct/map payload, no object branch admitted here:
                # every valid value fails
                return _valid_mask(arr) & pok, arr
            if _cutoff is not None and _cutoff <= 1:
                return np.zeros(tbl.num_rows, dtype=bool), None
            # the reference dispatches BEFORE trying branches: the datum's
            # kind must have a DEPTH-1 slot (core/validator.py:1032-1039);
            # container branches register at depth ≥ 2, so a scalar never
            # reaches them via the array duality inside a union — without
            # this gate a float wrongly passed ["boolean", "0..100[]"]
            slot = None if _s1 is None else (
                _s1.b if kind == "boolean"
                else _s1.x if kind == "number"
                else _s1.s if kind == "string" else _s1.n)
            if slot is None:
                return _valid_mask(arr) & pok, arr
            fail = np.ones(tbl.num_rows, dtype=bool)
            for branch in rt[0]:
                b = branch
                while isinstance(b, str) and "#" in b \
                        and not b.startswith("("):
                    b = reftype(sjots, b, sjot)
                if not isinstance(b, str):
                    continue
                try:
                    fail &= _scalar_fail_mask(arr, b)
                except ColumnarCompileError:
                    continue
            return fail & _valid_mask(arr) & pok, arr
        self._add(rule, ev_scalar)

        if obj_dispatch is not None:
            o_target, if_specs, prop_specs, targets = obj_dispatch
            r_obj = Rule(major, 2, name, typepath, "value",
                         js_string(rt), dyn=True)

            def ev_obj(tbl):
                n = tbl.num_rows
                zeros = np.zeros(n, dtype=bool)
                arr, pok = access(tbl)
                if arr is None:
                    return zeros, None
                is_map_col = pa.types.is_map(arr.type)
                if not (pa.types.is_struct(arr.type) or is_map_col):
                    return zeros, None
                valid_obj = _valid_mask(arr) & pok
                # per-row selected target index; -2 = accept (the
                # "object" wildcard slot), -1 = no branch → union fail
                sel = np.full(n, -1, dtype=np.int64)
                if o_target is not None:
                    # slots.o claims every object row
                    if o_target[0] == "any":
                        sel[valid_obj] = -2
                    else:
                        sel[valid_obj] = 0
                else:
                    # @if/@then triples in declaration order: disc
                    # present AND disc value valid vs the @then prop's
                    # type → that @then object (present-but-invalid
                    # falls through to later triples / prop dispatch)
                    for disc, rvt, ti in if_specs:
                        if is_map_col:
                            present, vals_al = _map_key_gather(
                                tbl, name, disc)
                            if present is None:
                                continue
                            ok = ~_scalar_fail_mask(vals_al, rvt)
                            ok &= _valid_mask(vals_al) | (rvt == "null")
                        else:
                            fi = arr.type.get_field_index(disc)
                            if fi < 0:
                                continue
                            farr = arr.field(disc)
                            present = _valid_mask(farr)
                            ok = ~_scalar_fail_mask(farr, rvt)
                        m = valid_obj & present & np.asarray(ok) \
                            & (sel == -1)
                        sel[m] = ti
                    # first data property naming a slots.p branch
                    # (data order = field/entry order)
                    if prop_specs:
                        if is_map_col:
                            e = _map_entries_of(tbl, name)
                            if e is not None:
                                keys, _v, parent, _valid = e
                                pnames = list(prop_specs)
                                ki = pc.index_in(
                                    keys, value_set=pa.array(pnames))
                                kv = _np(pc.fill_null(ki, -1)).astype(
                                    np.int64)
                                mm = np.nonzero(kv >= 0)[0]
                                if len(mm):
                                    # flatten order is (row, entry pos):
                                    # the first matching entry per row
                                    # is each parent's first occurrence
                                    p = parent[mm]
                                    up, first = np.unique(
                                        p, return_index=True)
                                    tsel = np.asarray(
                                        [prop_specs[pnames[k]]
                                         for k in kv[mm[first]]],
                                        dtype=np.int64)
                                    open_rows = valid_obj[up] \
                                        & (sel[up] == -1)
                                    sel[up[open_rows]] = \
                                        tsel[open_rows]
                        else:
                            for f in arr.type:
                                ti = prop_specs.get(f.name)
                                if ti is None:
                                    continue
                                m = valid_obj \
                                    & _valid_mask(arr.field(f.name)) \
                                    & (sel == -1)
                                sel[m] = ti
                fail = np.zeros(n, dtype=bool)
                paths = np.full(n, None, dtype=object)
                whats = np.full(n, None, dtype=object)
                reprs = np.full(n, None, dtype=object)
                tps = np.full(n, None, dtype=object)
                nd = valid_obj & (sel == -1)
                for i in np.nonzero(nd)[0]:
                    paths[i], whats[i], reprs[i] = name, "value", ""
                fail |= nd
                for ti in np.unique(sel[sel >= 0]):
                    # run each dispatched embedded validator in full
                    # (it owns child/map-entry rules, first-error
                    # ordering and violation rendering); mask to rows
                    # that selected it
                    sub = targets[int(ti)]
                    sverdict, sviols, _ = sub.validate_batch(tbl)
                    by_row = {v["row_idx"]: v for v in sviols}
                    sf = (sel == ti) & ~np.asarray(sverdict, dtype=bool)
                    for i in np.nonzero(sf & ~fail)[0]:
                        v = by_row[int(i)]
                        dp = v["datapath"]
                        paths[i] = dp[2:] if dp.startswith("$.") else dp
                        whats[i] = v["what"]
                        reprs[i] = v["value_repr"]
                        tps[i] = v["typepath"]
                    fail |= sf
                return fail, (paths, reprs, whats, tps)
            self._add(r_obj, ev_obj)

        if not supported_list:
            # the table shape is unknown at compile, so a union whose
            # list path we cannot express forces the conservative
            # whole-schema fallback (never a runtime worker raise)
            raise ColumnarCompileError(
                "union with object/tuple/deep container branches:"
                " row engine")

        def _branch_container_eval(arr, branch, lengths, class_mask):
            """(fail, whats, reprs, paths) for ``arr`` rows in
            ``class_mask`` against one dispatched container branch —
            reference order: set-dup, bounds, first failing item."""
            n = len(arr)
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)
            b = branch
            while isinstance(b, str) and "#" in b \
                    and not b.startswith("(") and not b.endswith("]") \
                    and not b.endswith("}"):
                b = reftype(sjots, b, sjot)
            if not isinstance(b, str) or not _is_container_type(b):
                # scalar branch dispatched for list data cannot accept
                sel = class_mask & ~fail
                fail |= sel
                whats[sel], reprs[sel], paths[sel] = "value", "", name
                return fail, whats, reprs, paths
            is_set = b.endswith("}")
            j = b.rfind("{" if is_set else "[")
            bounds = compile_bounds(b, j + 1)
            itemtype, _tp = self._resolve_path(b[:j], typepath)
            # 1. set duplicates
            if is_set:
                dup = _set_dup_mask(arr) & class_mask
                newly = dup & ~fail
                whats[newly], reprs[newly], paths[newly] = "value", "", name
                fail |= dup
            # 2. length bounds
            if bounds is not None:
                lf = _length_fail_mask(lengths, class_mask, bounds) \
                    & class_mask & ~fail
                whats[lf] = "length"
                paths[lf] = name
                for i in np.nonzero(lf)[0]:
                    reprs[i] = str(int(lengths[i]))
                fail |= lf
            # 3. items, first failing (sorted order for sets)
            sarr = _sort_sets(arr) if is_set else arr
            ones = np.ones(n, dtype=bool)
            ifail, ival = _list_item_first_fail(sarr, itemtype, ones,
                                                sjots, sjot)
            ifail = ifail & class_mask & ~fail
            if ifail.any() and ival is not None:
                flat, vidx, fpos = ival[0], ival[1], ival[2]
                iwhats = ival[3] if len(ival) > 3 else None
                for i in np.nonzero(ifail)[0]:
                    paths[i] = f"{name}[{int(fpos[i])}]"
                    whats[i] = str(iwhats[int(vidx[i])]) \
                        if iwhats is not None else "value"
                    if isinstance(flat, np.ndarray):
                        reprs[i] = str(flat[int(vidx[i])])
                    else:
                        v = flat[int(vidx[i])].as_py()
                        reprs[i] = "" if isinstance(v, (dict, list)) \
                            else js_string(v)
                fail |= ifail
            return fail, whats, reprs, paths

        r2 = Rule(major, 1, name, typepath, "value", js_string(rt),
                  dyn=True)

        def ev_list(tbl, name=name):
            zeros = np.zeros(tbl.num_rows, dtype=bool)
            arr, pok = access(tbl)
            if arr is None or not _is_list_type(arr.type):
                return zeros, None
            n = tbl.num_rows
            valid = _valid_mask(arr) & pok
            lengths = np.where(valid, np.nan_to_num(
                _np(pc.list_value_length(arr))), 0).astype(np.int64)
            flat = arr.flatten()
            starts = np.cumsum(lengths) - lengths
            fail = np.zeros(n, dtype=bool)
            whats = np.full(n, None, dtype=object)
            reprs = np.full(n, None, dtype=object)
            paths = np.full(n, None, dtype=object)

            def _mark(mask):
                newly = mask & ~fail
                whats[newly], reprs[newly], paths[newly] = "value", "", name
                return newly

            empty = valid & (lengths == 0)
            if not (cutoff is not None and cutoff <= 2) and slots2 is None:
                fail |= _mark(empty)
            nonempty = valid & (lengths > 0)
            item_is_list = _is_listish(flat.type)
            if item_is_list:
                # list-of-list data: depth ≥3 — valid iff the any-cutoff
                # admits it (no depth-3 branches on this compile path)
                if not (cutoff is not None and cutoff <= 3):
                    fail |= _mark(nonempty)
                return fail, (paths, reprs, whats)
            if cutoff is not None and cutoff <= 2:
                return fail, (paths, reprs, whats)
            if slots2 is None:
                fail |= _mark(nonempty)
                return fail, (paths, reprs, whats)
            first_valid = np.zeros(n, dtype=bool)
            fv = _valid_mask(flat)
            first_valid[nonempty] = fv[starts[nonempty]] \
                if len(fv) else False
            null_first = nonempty & ~first_valid
            if null_first.any():
                if slots2.n is None:
                    fail |= _mark(null_first)
                else:
                    bf, bw, br, bp = _branch_container_eval(
                        arr, slots2.n, lengths, null_first)
                    newly = bf & ~fail
                    whats[newly] = bw[newly]
                    reprs[newly] = br[newly]
                    paths[newly] = bp[newly]
                    fail |= bf
            kind_first = nonempty & first_valid
            if kind_first.any():
                k = _scalar_kind_of_arrow(flat.type)
                branch = {"boolean": slots2.b, "number": slots2.x,
                          "string": slots2.s,
                          "null": None}.get(k)
                if branch is None:
                    fail |= _mark(kind_first)
                else:
                    bf, bw, br, bp = _branch_container_eval(
                        arr, branch, lengths, kind_first)
                    newly = bf & ~fail
                    whats[newly] = bw[newly]
                    reprs[newly] = br[newly]
                    paths[newly] = bp[newly]
                    fail |= bf
            return fail, (paths, reprs, whats)
        self._add(r2, ev_list)

    def _compile_item_object_field(self, list_col, pname, obj_type,
                                   typepath, major, minor) -> int:
        """Nested object field of an item object, via the nested-struct
        compiler evaluated over the CHILD table (its columns are the
        item struct's fields). Produced rules are rebased to this item
        object's ``major`` (sequential minors, creation order — which
        is the nested compiler's rule order) and flipped to child rules;
        their dotted paths become the child datapath suffix. Returns the
        next minor."""
        mark = len(self.rules)
        saved_major = self._major
        self._compile_struct_props([pname], obj_type, typepath)
        self._major = saved_major
        for r, _ev in self.rules[mark:]:
            r.major = major
            r.minor = minor
            minor += 1
            r.child = True
            r.list_col = list_col
            if not r.dyn:
                r.field_name = r.prop
        if minor >= (1 << _MINOR_BITS):
            raise ColumnarCompileError(
                "item object rule count exceeds the minor-key space:"
                " row engine")
        return minor

    def _compile_struct_tuple_prop(self, fpath, rt, typepath, major):
        """Tuple [type, type, …] field inside a nested struct (e.g.
        ``meta.pair``): shape + exact-length rules, then one positional
        rule per slot over the list's flattened items (reference
        index.js:240-254), located via the struct path. Scalar slot
        types only — same restriction as top-level tuples."""
        dotted = ".".join(fpath)
        minor = 0
        shape_rule = Rule(major, minor, dotted, typepath, "value",
                          js_string(rt))

        def ev_shape(tbl, path=tuple(fpath)):
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None or _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            return _valid_mask(arr) & parent_ok, arr
        self._add(shape_rule, ev_shape)
        minor += 1
        want = len(rt)
        rule = Rule(major, minor, dotted, typepath, "array of length",
                    js_string(rt))

        def ev_len(tbl, path=tuple(fpath), want=want):
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None or not _is_list_type(arr.type):
                return np.zeros(tbl.num_rows, dtype=bool), None
            valid = _valid_mask(arr) & parent_ok
            lengths = np.where(valid, np.nan_to_num(
                _np(pc.list_value_length(arr))), want).astype(np.int64)
            return valid & (lengths != want), lengths
        self._add(rule, ev_len)
        minor += 1

        for pos, t in enumerate(rt):
            it, it_tp = self._resolve_path(t, typepath + "[]")
            if not _is_scalar_str_type(it) or _is_char_len_type(it):
                def access(tbl, path=tuple(fpath)):
                    return _nested_field(tbl, list(path))
                self._add_nonscalar_tuple_slot(access, dotted, pos, it,
                                               it_tp, major, minor)
                minor += 1
                continue
            r = Rule(major, minor, dotted, it_tp, "value", it, inner=True)
            null_item_fails = not _null_item_ok(self.sjots, self.sjot, it)
            null_default = default_value("null", self.sjots, None, it,
                                         self.sjot) if null_item_fails \
                else None

            def ev_slot(tbl, path=tuple(fpath), pos=pos, it=it,
                        null_item_fails=null_item_fails,
                        null_default=null_default):
                arr, parent_ok = _nested_field(tbl, list(path))
                if arr is None:
                    return np.zeros(tbl.num_rows, dtype=bool), None
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                if not _is_list_type(arr.type):
                    return np.zeros(tbl.num_rows, dtype=bool), None
                n = tbl.num_rows
                valid = _valid_mask(arr) & parent_ok
                lengths = np.where(_valid_mask(arr), np.nan_to_num(
                    _np(pc.list_value_length(arr))), 0).astype(np.int64)
                flat = arr.flatten()
                f_fail = _scalar_fail_mask(flat, it)
                if null_item_fails:
                    f_fail = f_fail | ~_valid_mask(flat)
                    flat = _fill_item_default(flat, null_default)
                starts = np.cumsum(lengths) - lengths
                has_pos = lengths > pos
                vidx = np.where(has_pos, starts + pos, 0)
                fail = np.zeros(n, dtype=bool)
                sel = has_pos & valid
                if sel.any() and len(f_fail):
                    fail[sel] = f_fail[vidx[sel]]
                fpos = np.full(n, pos, dtype=np.int64)
                return fail, (flat, vidx, fpos)
            self._add(r, ev_slot)
            minor += 1

    # -- execution ---------------------------------------------------------

    def validate_batch(self, batch: pa.Table):
        """Evaluate all rules over one Arrow batch.

        Returns ``(verdict, violations, first_key)`` where ``verdict`` is a
        bool ndarray (row passes), ``violations`` a list of dicts (one per
        failing row — first error wins, reference ordering) and
        ``first_key`` the int64 ordering key (INF = valid).
        """
        n = batch.num_rows
        best = np.full(n, _KEY_INF, dtype=np.int64)
        best_info: dict[int, tuple] = {}
        child_cache: dict[str, tuple] = {}

        def child_table(list_col):
            cached = child_cache.get(list_col)
            if cached is None:
                arr = batch[list_col] if list_col in batch.column_names else None
                if arr is None:
                    cached = (pa.table({"__item__": pa.array([], pa.null()),
                                        "__idx__": pa.array([], pa.int64())}),
                              np.zeros(0, np.int64), np.zeros(0, np.int64))
                elif not _is_listish(
                        arr.type if not isinstance(arr, pa.ChunkedArray)
                        else arr.type):
                    # shape mismatch: no child rows (shape rules fail the
                    # parent rows; the list kernels must not crash)
                    cached = (pa.table({"__item__": pa.array([], pa.null()),
                                        "__idx__": pa.array([], pa.int64())}),
                              np.zeros(0, np.int64), np.zeros(0, np.int64))
                else:
                    if isinstance(arr, pa.ChunkedArray):
                        arr = arr.combine_chunks()
                    if pa.types.is_map(arr.type):
                        # maps flatten through their list<struct> form
                        arr = arr.cast(pa.list_(pa.struct(
                            [("key", arr.type.key_type),
                             ("value", arr.type.item_type)])))
                    lengths = np.where(
                        _valid_mask(arr),
                        _np(pc.list_value_length(arr)), 0).astype(np.int64)
                    parent = np.repeat(np.arange(n), lengths)
                    total = int(lengths.sum())
                    starts = np.cumsum(lengths) - lengths
                    idx_in_parent = (np.arange(total)
                                     - np.repeat(starts, lengths)).astype(np.int64)
                    items = arr.flatten()
                    cols = {"__item__": items,
                            "__idx__": pa.array(idx_in_parent)}
                    if pa.types.is_struct(items.type):
                        for f in items.type:
                            cols[f.name] = items.field(f.name)
                    cached = (pa.table(cols), parent.astype(np.int64),
                              idx_in_parent)
                child_cache[list_col] = cached
            return cached

        for rule, ev in self.rules:
            if not rule.child:
                mask, values = ev(batch)
                if not mask.any():
                    continue
                key = rule.key_base()
                idx = np.nonzero(mask)[0]
                improved = idx[key < best[idx]]
                best[improved] = key
                for i in improved:
                    best_info[int(i)] = (rule, None, values)
            else:
                ct, parent, idx_in_parent = child_table(rule.list_col)
                if ct.num_rows == 0:
                    continue
                mask, values = ev(ct)
                if not mask.any():
                    continue
                hit = np.nonzero(mask)[0]
                keys = (rule.key_base()
                        + (idx_in_parent[hit] << _MINOR_BITS))
                rows = parent[hit]
                # descending-key scan: the smallest key per row writes last
                order = np.argsort(keys, kind="stable")[::-1]
                for j in order:
                    r_ = int(rows[j])
                    if keys[j] < best[r_]:
                        best[r_] = keys[j]
                        best_info[r_] = (rule, int(hit[j]), values)

        verdict = best == _KEY_INF
        violations = []
        for row in sorted(best_info):
            if best[row] == _KEY_INF:
                continue
            rule, child_idx, values = best_info[row]
            item_idx = int((best[row] >> _MINOR_BITS)
                           & ((1 << _ITEM_BITS) - 1)) if rule.child else None
            violations.append(
                self._violation(row, rule, item_idx, child_idx, values))
        return verdict, violations, best

    def _violation(self, row, rule, item_idx, child_idx, values):
        v = self._violation_inner(row, rule, item_idx, child_idx, values)
        vc = self.root_value_column
        if vc is not None:
            # non-object root: the synthetic "$.<col>" prefix renders
            # back to the reference's root datapath "$"
            pref = f"$.{vc}"
            dp = v["datapath"]
            if dp == pref:
                v["datapath"] = "$"
            elif dp.startswith(pref + ".") or dp.startswith(pref + "["):
                v["datapath"] = "$" + dp[len(pref):]
        return v

    def _violation_inner(self, row, rule, item_idx, child_idx, values):
        if rule.child:
            base = f"$.{rule.list_col}[{item_idx}]"
            datapath = f"{base}.{rule.field_name}" if rule.field_name else base
        else:
            datapath = f"$.{rule.prop}" if rule.prop else "$"
        if rule.const_repr is not None:
            return {
                "row_idx": int(row),
                "datapath": datapath,
                "typepath": rule.typepath,
                "what": rule.what,
                "value_repr": rule.const_repr,
                "rule": f"{rule.major}.{rule.minor}",
            }
        if rule.dyn and values is not None:
            paths, reprs = values[0], values[1]
            whats = values[2] if len(values) > 2 else None
            tps = values[3] if len(values) > 3 else None
            i = child_idx if rule.child and child_idx is not None else row
            if rule.child and rule.map_entry:
                # map-entry dyn rules carry the key(+item) suffix
                datapath = f"$.{rule.list_col}.{paths[i]}"
            elif rule.child:
                # child dyn rules carry the item-struct FIELD name
                datapath = f"$.{rule.list_col}[{item_idx}].{paths[i]}"
            else:
                datapath = f"$.{paths[i]}"
            return {
                "row_idx": int(row),
                "datapath": datapath,
                "typepath": tps[i] if tps is not None
                and tps[i] is not None else rule.typepath,
                "what": whats[i] if whats is not None
                and whats[i] is not None else rule.what,
                "value_repr": reprs[i],
                "rule": f"{rule.major}.{rule.minor}",
            }
        if rule.map_entry and values is not None:
            keys_arr, vals_arr = values
            i = child_idx
            key = keys_arr[i].as_py()
            datapath = f"$.{rule.list_col}.{key}"
            if rule.no_value:
                value_repr = ""
            else:
                v = vals_arr[i].as_py()
                value_repr = "" if isinstance(v, (dict, list)) \
                    else js_string(v)
            return {
                "row_idx": int(row),
                "datapath": datapath,
                "typepath": rule.typepath,
                "what": rule.what,
                "value_repr": value_repr,
                "rule": f"{rule.major}.{rule.minor}",
            }
        if rule.inner and values is not None:
            flat, vidx, fpos = values[0], values[1], values[2]
            whats = values[3] if len(values) > 3 else None
            i = child_idx if child_idx is not None else row
            datapath += f"[{int(fpos[i])}]"
            j = int(vidx[i])
            if isinstance(flat, np.ndarray):  # precomputed reprs
                value_repr = str(flat[j])
            else:
                v = flat[j].as_py()
                value_repr = "" if isinstance(v, (dict, list)) \
                    else js_string(v)
            return {
                "row_idx": int(row),
                "datapath": datapath,
                "typepath": rule.typepath,
                "what": str(whats[j]) if whats is not None else rule.what,
                "value_repr": value_repr,
                "rule": f"{rule.major}.{rule.minor}",
            }
        if rule.no_value or values is None:
            value_repr = ""
        else:
            i = child_idx if child_idx is not None else row
            if isinstance(values, np.ndarray):
                v = values[i]
                if isinstance(v, (float, np.floating)) and float(v) == int(v):
                    v = int(v)
                elif isinstance(v, np.integer):
                    v = int(v)
            else:
                v = values[i].as_py()
            value_repr = js_string(v) if not isinstance(v, (dict, list)) else ""
        if rule.what == "additional property should not be present" \
                and not isinstance(values, np.ndarray) and values is not None:
            # the reference names the offending extra property in the
            # datapath (index.js:448-451)
            extras = values[row].as_py()
            if extras:
                datapath = f"$.{extras[0]}"
            value_repr = ""
        elif rule.what == "additional property should not be present" \
                and isinstance(values, np.ndarray):
            # @final with per-row extra names: nested structs carry the
            # dotted path; item objects carry the field name
            i = child_idx if child_idx is not None else row
            if values[i] is not None:
                if rule.child:
                    datapath = f"$.{rule.list_col}[{item_idx}].{values[i]}"
                else:
                    datapath = f"$.{values[i]}"
            value_repr = ""
        return {
            "row_idx": int(row),
            "datapath": datapath,
            "typepath": rule.typepath,
            "what": rule.what,
            "value_repr": value_repr,
            "rule": f"{rule.major}.{rule.minor}",
        }

    # -- normalization ----------------------------------------------------

    def normalize_batch(self, batch: pa.Table) -> pa.Table:
        """Inject optional-property defaults (SURVEY.md §1.3) on typed
        columns. Arrow null ≡ absent, so no-default optionals need no
        work, and set sorting applies only to set-typed list columns.

        Non-object roots (``value_column`` mode) have no optional
        properties to default — scalar documents normalize to
        themselves; container-root item normalization (null→default,
        set sort) is a row-engine concern (``ValidateJsonColumn``) and
        the batch passes through unchanged."""
        if self.root_value_column is not None:
            return batch
        out = batch
        for prop, proptype in self.root_type.items():
            if prop.startswith("("):
                # regex props with OBJECT value types: inject nested
                # optional defaults into every matching struct column
                rt, _ = self._resolve_path(proptype, "")
                if isinstance(rt, dict):
                    from ..core.validator import compile_regex_type
                    if "@extends" in rt:
                        rt = dict(rt)
                        extend_type(self.sjots, rt, self.sjot, "")
                    matcher = compile_regex_type(prop)
                    for idx, cname in enumerate(out.column_names):
                        if cname == self.extras_column \
                                or matcher.fullmatch(cname) is None:
                            continue
                        col = out[cname]
                        if isinstance(col, pa.ChunkedArray):
                            col = col.combine_chunks()
                        if pa.types.is_struct(col.type):
                            out = out.set_column(
                                idx, cname,
                                self._normalize_struct(col, rt))
                continue
            if prop.startswith("@"):
                continue
            q = prop.find("?")
            name = prop[:q] if q != -1 else prop
            if name not in out.column_names:
                continue
            rt, _ = self._resolve_path(proptype, "")
            if isinstance(rt, dict):
                # recurse into struct columns (nested optional defaults)
                i = out.column_names.index(name)
                out = out.set_column(
                    i, name, self._normalize_struct(out[name], rt))
                continue
            it = self._container_item_obj(rt)
            if it is not None:
                # containers of ITEM OBJECTS: inject item defaults
                i = out.column_names.index(name)
                out = out.set_column(
                    i, name, self._normalize_list_items(out[name], it))
                continue
            if not isinstance(rt, str):
                continue
            if q == -1 or q >= len(prop) - 1:
                continue
            d = default_value(prop[q + 1:], self.sjots, None, rt, self.sjot)
            if d is None:
                continue
            i = out.column_names.index(name)
            out = out.set_column(i, name, pc.fill_null(out[name], d))

        # sets are re-sorted in place by the reference (index.js:297, JS
        # String() order) — normalized output mirrors that
        for prop, proptype in self.root_type.items():
            if prop.startswith("@") or prop.startswith("("):
                continue
            name = prop.split("?")[0]
            rt, _ = self._resolve_path(proptype, "")
            if isinstance(rt, str) and rt.endswith("}") \
                    and name in out.column_names:
                i = out.column_names.index(name)
                out = out.set_column(i, name, _sort_sets(out[name]))
        return out

    def _add_wildcard_shape_rule(self, path, rt, typepath, major):
        """``object`` / ``array`` wildcard types constrain only the
        data's SHAPE (reference: "is not an object" / "is not an
        array"): struct and map layouts carry objects, list layouts
        arrays; every valid value of any other layout fails "value"."""
        dotted = ".".join(path)
        r = Rule(major, 0, dotted, typepath, "value", rt)

        def ev(tbl, path=tuple(path), rt=rt):
            arr, parent_ok = _nested_field(tbl, list(path))
            if arr is None:
                return np.zeros(tbl.num_rows, dtype=bool), None
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if rt == "object":
                ok_shape = pa.types.is_struct(arr.type) \
                    or pa.types.is_map(arr.type)
            else:
                ok_shape = _is_list_type(arr.type)
            if ok_shape:
                return np.zeros(tbl.num_rows, dtype=bool), None
            return _valid_mask(arr) & parent_ok, arr
        self._add(r, ev)

    def _container_item_obj(self, rt):
        """The item OBJECT type of a list-of-objects position, else
        None: the one-element array form ``[{…}]`` (directly or via a
        ref) and container strings ``#T[]`` / ``#T[n,m]`` whose item
        resolves to a dict. Set forms are excluded — set normalization
        (String()-order sort) interacts with item mutation and stays on
        the row engine."""
        if isinstance(rt, list) and len(rt) == 1:
            it = rt[0]
            while isinstance(it, str) and "#" in it \
                    and not it.startswith("("):
                it = reftype(self.sjots, it, self.sjot)
            return it if isinstance(it, dict) else None
        if isinstance(rt, str) and _is_container_type(rt) \
                and not rt.endswith("}"):
            it, _tp = self._resolve_path(rt[:rt.rfind("[")], "")
            return it if isinstance(it, dict) else None
        return None

    def _normalize_list_items(self, arr, item_obj_type):
        """Inject optional-with-default values into a list<struct>
        column's ITEM objects (the reference mutates each item during
        validation, index.js:246-251 → 407-460). Offsets and the list
        null mask are preserved; non-list / non-struct-item layouts are
        returned untouched."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not _is_list_type(arr.type) \
                or not pa.types.is_struct(arr.type.value_type):
            return arr
        values = arr.values
        new_values = self._normalize_struct(values, item_obj_type)
        if new_values is values:
            return arr
        return pa.ListArray.from_arrays(
            arr.offsets, new_values, mask=pc.is_null(arr))

    def _normalize_struct(self, arr, obj_type):
        """Inject optional-with-default values into a struct column's
        children (recursively), preserving the struct's null mask."""
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not pa.types.is_struct(arr.type):
            return arr
        plans = {}
        for prop, proptype in obj_type.items():
            if prop.startswith("@") or prop.startswith("("):
                continue
            q = prop.find("?")
            plans[prop[:q] if q != -1 else prop] = (prop, q, proptype)
        children, names, changed = [], [], False
        for f in arr.type:
            child = arr.field(f.name)
            plan = plans.get(f.name)
            if plan is not None:
                prop, q, proptype = plan
                rt, _ = self._resolve_path(proptype, "")
                if isinstance(rt, dict):
                    new = self._normalize_struct(child, rt)
                    changed = changed or new is not child
                    child = new
                elif self._container_item_obj(rt) is not None:
                    new = self._normalize_list_items(
                        child, self._container_item_obj(rt))
                    changed = changed or new is not child
                    child = new
                elif isinstance(rt, str) and rt.endswith("}"):
                    child = _sort_sets(child)
                    changed = True
                elif q != -1 and q < len(prop) - 1:
                    d = default_value(prop[q + 1:], self.sjots, None, rt,
                                      self.sjot)
                    if d is not None:
                        child = pc.fill_null(child, d)
                        changed = True
            children.append(child)
            names.append(f.name)
        if not changed:
            return arr
        return pa.StructArray.from_arrays(children, names,
                                          mask=pc.is_null(arr))


def _sort_sets(arr) -> pa.ListArray:
    """Sort each list's members by JS ``String()`` order (set
    normalization). Vectorized permutation + take."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not _is_list_type(arr.type):  # shape mismatch: nothing to sort
        return arr
    valid = _valid_mask(arr)
    lengths = np.where(valid, _np(pc.list_value_length(arr)), 0).astype(np.int64)
    parent = np.repeat(np.arange(len(arr)), lengths)
    flat = arr.flatten()
    if len(flat) == 0:
        return arr
    if pa.types.is_string(flat.type) or pa.types.is_large_string(flat.type):
        vals = np.asarray(_np(flat), dtype=object)
        if flat.null_count:
            # JS sorts null members by String(null) == "null"
            vals = np.where(_np(pc.is_valid(flat)), vals, "null")
    else:
        vals = np.asarray([js_string(v) for v in flat.to_pylist()],
                          dtype=object)
    order = np.lexsort((vals, parent))
    sorted_flat = flat.take(pa.array(order, pa.int64()))
    offsets = np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32)
    out = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), sorted_flat)
    if not valid.all():
        # re-apply null lists
        mask = pa.array(~valid)
        out = pc.if_else(mask, pa.nulls(len(arr), out.type), out)
    return out


def _list_item_first_fail(arr, itemtype, parent_ok, sjots, sjot):
    """Per-row FIRST failing item of a list column against a scalar item
    type. Returns ``(row_fail, (flat, value_idx, first_pos))`` where
    ``flat`` is the (default-filled) flattened item array and, for each
    failing row, ``value_idx``/``first_pos`` locate the first bad item
    globally / within the row. Alignment lengths use Arrow validity only
    (flatten() drops null rows' ranges); ``parent_ok`` masks the verdict.
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if not _is_list_type(arr.type):  # shape mismatch handled by shape rule
        return np.zeros(n, dtype=bool), None
    arrow_valid = _valid_mask(arr)
    lengths = np.where(arrow_valid,
                       np.nan_to_num(_np(pc.list_value_length(arr))),
                       0).astype(np.int64)
    flat = arr.flatten()
    f_fail = _scalar_fail_mask(flat, itemtype)
    if not _null_item_ok(sjots, sjot, itemtype):
        f_fail = f_fail | ~_valid_mask(flat)
        flat = _fill_item_default(
            flat, default_value("null", sjots, None, itemtype, sjot))
    rows = np.repeat(np.arange(n), lengths)
    starts = np.cumsum(lengths) - lengths
    pos = np.arange(len(rows)) - np.repeat(starts, lengths)
    ok_rows = arrow_valid & parent_ok
    f_fail = f_fail & ok_rows[rows] if len(rows) else f_fail
    first_pos = np.full(n, -1, dtype=np.int64)
    if f_fail.any():
        fr, fp = rows[f_fail], pos[f_fail]
        order = np.argsort(-fp)  # descending: smallest pos assigned last
        first_pos[fr[order]] = fp[order]
    row_fail = first_pos >= 0
    value_idx = np.where(row_fail, starts + np.maximum(first_pos, 0), 0)
    if _is_char_len_type(itemtype):
        # char[n,m] items: a short/long string reports what="length" with
        # the length as datum; a null item is NOT defaulted (sjot_default
        # treats char[…] as array-ish and returns null, index.js:1195) and
        # reports what="value" value null — whats vary per item
        valid_flat = _valid_mask(flat)
        if pa.types.is_string(flat.type) \
                or pa.types.is_large_string(flat.type):
            lens = np.nan_to_num(
                _np(pc.utf8_length(pc.fill_null(flat, "")))) \
                .astype(np.int64)
            reprs = lens.astype("U21").astype(object)
            reprs[~valid_flat] = "null"
            whats = np.where(valid_flat, "length", "value").astype(object)
        else:
            # schema-table mismatch (non-string items vs char[n,m]):
            # every valid item already failed via _scalar_fail_mask; the
            # reference reports these as what="value" with the raw value
            reprs = np.asarray(
                ["null" if v is None else js_string(v)
                 for v in flat.to_pylist()], dtype=object)
            whats = np.full(len(flat), "value", dtype=object)
        return row_fail, (reprs, value_idx, first_pos, whats)
    return row_fail, (flat, value_idx, first_pos)


def _fill_item_default(arr, d):
    """Replace null list items with the item-type default for diagnostic
    value_repr parity (the reference substitutes the default BEFORE
    validating, index.js:185-187, so the error carries the default)."""
    if d is None:
        return arr
    try:
        return pc.fill_null(arr, d)
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        return arr


def _null_item_ok(sjots, sjot, itemtype: str) -> bool:
    """Is a null list item (replaced by the item-type default,
    index.js:185-187) valid for this item type?"""
    from ..core.validator import valid as row_valid

    d = default_value("null", sjots, None, itemtype, sjot)
    return row_valid(d, itemtype, sjot if sjot else None)
