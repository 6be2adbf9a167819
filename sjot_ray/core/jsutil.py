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
    """JS ``String(number)`` per ECMAScript Number::toString (radix 10):
    shortest round-trip digits s with decimal exponent n, then decimal
    notation for -6 < n <= 21 and unpadded exponential otherwise. Python's
    repr diverges in [1e-6, 1e-4) ('1e-05' where JS prints '0.00001') and
    zero-pads exponents ('1e-07' vs JS '1e-7'), so the thresholds are
    applied explicitly. Integers beyond 2^53 go through the double
    representation first, as JSON.parse does."""
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
    if v == 0:
        return "0"  # String(-0) is "0" in JS
    r = repr(abs(v))  # shortest round-trip digits
    if "e" in r:
        mant, _, exp_s = r.partition("e")
        exp = int(exp_s)
    else:
        mant, exp = r, 0
    ipart, _, fpart = mant.partition(".")
    digits = (ipart + fpart).lstrip("0")
    lead = len(ipart.lstrip("0"))
    if lead > 0:
        n = lead + exp  # decimal point sits n digits into the significand
    else:
        n = exp - (len(fpart) - len(fpart.lstrip("0")))
    digits = digits.rstrip("0") or "0"
    k = len(digits)
    if k <= n <= 21:
        out = digits + "0" * (n - k)
    elif 0 < n <= 21:
        out = digits[:n] + "." + digits[n:]
    elif -6 < n <= 0:
        out = "0." + "0" * (-n) + digits
    else:
        e = n - 1
        tail = f"e+{e}" if e >= 0 else f"e-{-e}"
        out = digits if k == 1 else digits[0] + "." + digits[1:]
        out += tail
    return "-" + out if v < 0 else out


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
