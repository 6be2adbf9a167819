"""JavaScript value-model helpers.

The reference engine (/root/reference/index.js) is ES5 JavaScript; several of
its observable behaviors depend on JS value coercions:

* ``Array.prototype.sort()`` with no comparator orders elements by their
  ``String()`` conversion (index.js:297 sorts set members this way);
* diagnostic messages embed ``String(value)`` (index.js:1262-1267);
* range endpoints are parsed with ``parseFloat`` which ignores trailing
  garbage (index.js:578 etc).

These helpers reproduce those coercions for Python values so verdicts,
normalized output, and diagnostics match the reference bit-for-bit.
"""

from __future__ import annotations

import math
import re

_FLOAT_PREFIX = re.compile(r"^\s*[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?")


def parse_float_js(s: str) -> float:
    """``parseFloat``: longest numeric prefix, NaN when none."""
    m = _FLOAT_PREFIX.match(s)
    if not m:
        return math.nan
    return float(m.group(0))


def parse_int_js(s: str) -> float:
    """``parseInt(s, 10)``: longest signed-digit prefix, NaN when none."""
    m = re.match(r"^\s*[+-]?\d+", s)
    if not m:
        return math.nan
    return int(m.group(0))


def js_num_str(v) -> str:
    """JS ``String(number)`` (shortest round-trip decimal; integers beyond
    2^53 go through the double representation first, as JSON.parse does)."""
    if isinstance(v, bool):  # pragma: no cover - callers route bools elsewhere
        return "true" if v else "false"
    if isinstance(v, int):
        if abs(v) <= 2**53:
            return str(v)
        v = float(v)
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e21:
        # fixed notation built from the shortest round-trip digits
        # (2^64 prints as 18446744073709552000, not its exact binary value)
        s = repr(v)
        if "e" in s or "E" in s:
            mant, _, exp = s.lower().partition("e")
            exp = int(exp)
            neg = mant.startswith("-")
            mant = mant.lstrip("-")
            ipart, _, fpart = mant.partition(".")
            out = ipart + fpart + "0" * (exp - len(fpart))
            return ("-" + out) if neg else out
        return str(int(v))
    r = repr(v)
    # JS prints exponents as 1e+21 / 1e-7; Python repr matches for most.
    return r


def js_string(v) -> str:
    """JS ``String(value)`` for sort keys and messages."""
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return js_num_str(v)
    if isinstance(v, str):
        return v
    if isinstance(v, list):
        return ",".join("" if e is None else js_string(e) for e in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def is_float_value(data) -> bool:
    """Reference ``Math.floor(data) !== data`` (index.js:472): True only for
    numbers with a fractional part; 1.0 counts as integral."""
    if isinstance(data, bool) or isinstance(data, int):
        return False
    return not float(data).is_integer()
