"""Numeric range / enumeration types and size-bound suffixes, compiled once.

The reference re-parses range strings character by character on every visit
(index.js:543-659, with an in-source TODO at :545 flagging the cost) and
re-parses ``[n,m]``/``{n,m}`` bound suffixes per visit (index.js:920-966).
We parse each distinct type string exactly once into an ``Alt`` list /
``Bounds`` tuple and evaluate those — same observable semantics, including:

* comma-separated alternatives tried left to right, first match accepts;
* a fractional data value hitting an alternative whose relevant endpoint(s)
  carry no ``"."`` aborts the whole scan (the reference ``break``s out of the
  loop, index.js:566-573/592-599/642-648) — later float-friendly
  alternatives are NOT tried;
* ``<`` prefix = exclusive lower bound, ``>`` suffix = exclusive upper bound;
* endpoints parsed with JS ``parseFloat`` (trailing garbage ignored).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

from .jsutil import parse_float_js, parse_int_js

# Alternative kinds
_LE = 0      # ..m        (upper bound only)
_GE = 1      # n..        (lower bound only)
_BETWEEN = 2 # n..m
_CONST = 3   # n


@dataclass(frozen=True)
class Alt:
    kind: int
    lo: float
    hi: float
    lo_excl: bool
    hi_excl: bool
    # whether the lexical endpoint text contains a "." (controls the
    # float-data rejection described in the module docstring)
    lo_dot: bool
    hi_dot: bool


@lru_cache(maxsize=4096)
def compile_range(type_str: str) -> tuple[Alt, ...]:
    """Parse ``n..m,<n..m>,..m,n..,n,…`` into alternatives (schema-order)."""
    alts = []
    i = 0
    s = type_str
    L = len(s)
    while i < L:
        lo_excl = False
        if i < L and s[i] == "<":
            lo_excl = True
            i += 1
        j = s.find("..", i)
        k = s.find(",", i)
        if k == -1:
            k = L
        if i == j:
            # ..m or ..m>
            if k - 1 > j + 1 and s[k - 1] == ">":
                seg = s[j + 2 : k - 1]
                hi_excl = True
            else:
                seg = s[j + 2 : k]
                hi_excl = False
            alts.append(
                Alt(_LE, -math.inf, parse_float_js(seg), False, hi_excl,
                    False, "." in s[j + 2 : k])
            )
        elif j != -1 and j < k:
            lo_seg = s[i:j]
            lo_dot = "." in lo_seg
            if j + 2 == k:
                # n.. / <n..
                alts.append(
                    Alt(_GE, parse_float_js(lo_seg), math.inf, lo_excl, False,
                        lo_dot, False)
                )
            else:
                if s[k - 1] == ">":
                    hi_seg = s[j + 2 : k - 1]
                    hi_excl = True
                else:
                    hi_seg = s[j + 2 : k]
                    hi_excl = False
                alts.append(
                    Alt(_BETWEEN, parse_float_js(lo_seg), parse_float_js(hi_seg),
                        lo_excl, hi_excl, lo_dot, "." in s[j + 2 : k])
                )
        else:
            seg = s[i:k]
            alts.append(
                Alt(_CONST, parse_float_js(seg), parse_float_js(seg),
                    False, False, "." in seg, False)
            )
        i = k + 1
    return tuple(alts)


def range_check(alts: tuple[Alt, ...], data: float, isfloat: bool) -> bool:
    """Evaluate a compiled range type against one number."""
    for a in alts:
        if a.kind == _LE:
            if isfloat and not a.hi_dot:
                return False
            if (data < a.hi) if a.hi_excl else (data <= a.hi):
                return True
        elif a.kind == _GE:
            if isfloat and not a.lo_dot:
                return False
            if data > a.lo or (not a.lo_excl and data == a.lo):
                return True
        elif a.kind == _BETWEEN:
            if isfloat and not a.lo_dot:
                return False
            if isfloat and not a.hi_dot:
                return False
            lo_ok = data > a.lo or (not a.lo_excl and data == a.lo)
            hi_ok = (data < a.hi) if a.hi_excl else (data <= a.hi)
            if lo_ok and hi_ok:
                return True
        else:  # _CONST
            if isfloat and not a.lo_dot:
                return False
            if data == a.lo:
                return True
    return False


def range_grammar_errors(type_str: str) -> str | None:
    """Schema-admission grammar check (mirrors index.js:1611-1694).

    Returns an error message or None. Distinguishes "is not a valid range"
    (NaN endpoint in a dotted form), "has an empty range n..m", and
    "is not a valid type" (NaN constant) exactly as the reference does.
    """
    i = 0
    s = type_str
    L = len(s)
    while i < L:
        e = False
        if s[i] == "<":
            e = True
            i += 1
        j = s.find("..", i)
        k = s.find(",", i)
        if k == -1:
            k = L
        if i == j:
            if k >= 1 and s[k - 1] == ">":
                if math.isnan(parse_float_js(s[j + 2 : k - 1])):
                    return "is not a valid range"
            else:
                if math.isnan(parse_float_js(s[j + 2 : k])):
                    return "is not a valid range"
        elif j != -1 and j < k:
            if j + 2 == k:
                if math.isnan(parse_float_js(s[i:j])):
                    return "is not a valid range"
            else:
                n = parse_float_js(s[i:j])
                if math.isnan(n):
                    return "is not a valid range"
                if k >= 1 and s[k - 1] == ">":
                    e = True
                    m = parse_float_js(s[j + 2 : k - 1])
                else:
                    m = parse_float_js(s[j + 2 : k])
                if math.isnan(m):
                    return "is not a valid range"
                if n > m or (e and n == m):
                    from .jsutil import js_num_str

                    return f"has an empty range {js_num_str(n)}..{js_num_str(m)}"
        else:
            if math.isnan(parse_float_js(s[i:k])):
                return "is not a valid type"
        i = k + 1
    return None


@lru_cache(maxsize=4096)
def compile_bounds(type_str: str, start: int) -> tuple | None:
    """Parse the ``[n]``/``[n,]``/``[,m]``/``[n,m]`` (or ``{…}``) suffix that
    begins at ``start`` (index position just past the ``[``/``{``).

    Returns a tagged tuple (``("exact", n)`` / ``("min", n)`` / ``("max", m)``
    / ``("minmax", n, m)``) or None for ``[]``/``{}``/no bounds. Mirrors
    index.js:920-966 including parseInt + NaN-comparison semantics: a NaN
    endpoint in the exact form rejects every length (``len !== NaN``), while
    NaN in the open forms rejects nothing (``len < NaN`` is false).
    """
    s = type_str
    j = s.find("]", start)
    k = s.find(",", start)
    if j == -1:
        j = s.find("}", start)
    if j == -1 or start == j:
        return None
    if k == -1:
        return ("exact", parse_int_js(s[start:j]))
    if k + 1 == j:
        return ("min", parse_int_js(s[start:k]))
    if start == k:
        return ("max", parse_int_js(s[k + 1 : j]))
    return ("minmax", parse_int_js(s[start:k]), parse_int_js(s[k + 1 : j]))


def bounds_check(b: tuple | None, length: int) -> bool:
    """True when ``length`` satisfies the compiled bounds."""
    if b is None:
        return True
    kind = b[0]
    if kind == "exact":
        return length == b[1]  # NaN → False → invalid, as in JS len !== NaN
    if kind == "min":
        return not (length < b[1])  # NaN compare False → valid, as in JS
    if kind == "max":
        return not (length > b[1])
    return not (length < b[1]) and not (length > b[2])
