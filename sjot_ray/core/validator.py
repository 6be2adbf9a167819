"""SJOT validation walker — full reference semantics, compile-once caches.

Reimplements the behavior of the reference validator
(/root/reference/index.js:109-757 ``sjot_validate``, :760-917 union runtime,
:920-966 bounds, :969-1065 ``@extends``, :1068-1099 root type, :1102-1163
type refs, :1194-1244 defaults, :1247-1269 errors) in Python — NOT a port of
its execution strategy: where the reference re-parses range strings and
re-builds ``RegExp`` objects and union dispatch tables on every visit
(index.js:392, 545, 676, 764-766), we parse/compile each distinct type
string once and cache union dispatch tables per union object. Observable
semantics preserved, including the quirks:

* ``long`` bounds are ±2^47 (index.js:508-512), ``ulong`` upper bound
  compares as an IEEE double;
* ``date``/``time``/``datetime`` are lexical-only regexes (no calendar);
* ``base64`` does not require length ≡ 0 mod 4;
* sets are sorted **in place** by JS ``String()`` order, duplicates detected
  by strict equality of adjacent elements (index.js:294-299);
* optional-with-default properties are injected, absent no-default optionals
  are deleted, null array/tuple/set items are replaced by item-type defaults
  (mutation semantics, index.js:185-187, 248-250, 306-308, 429-437);
* first error wins — validation stops at the first violation;
* a document carrying ``"@sjot"`` under an ``any``/``object`` context is
  validated against its embedded schema (index.js:111-131);
* object data against ``date``/``time``/``datetime`` always fails (the
  reference's ``!data.constructor.name != "Date"`` coercion, index.js:333).
"""

from __future__ import annotations

import json
import os
import re
from functools import lru_cache

from .errors import SJOTSchemaError, SJOTValidationError
from .jsutil import is_float_value, js_string
from .ranges import bounds_check, compile_bounds, compile_range, range_check

# ---------------------------------------------------------------------------
# string-format regexes (specs from the reference, index.js:696-743)

FORMAT_PATTERNS = {
    "base64": r"[0-9A-Za-z+/]*=?=?",
    "hex": r"[0-9A-Fa-f]*",
    "uuid": r"(urn:uuid:)?[0-9A-Fa-f]{8}-[0-9A-Fa-f]{4}-[0-9A-Fa-f]{4}-"
            r"[0-9A-Fa-f]{4}-[0-9A-Fa-f]{12}",
    "date": r"\d{4}-\d{2}-\d{2}",
    "time": r"\d{2}:\d{2}:\d{2}(\.\d{1,6})?([-+]\d{2}:?\d{2}|Z)?",
    "datetime": r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,6})?"
                r"([-+]\d{2}:?\d{2}|Z)?",
    "duration": r"-?P(-?[0-9,.]*Y)?(-?[0-9,.]*M)?(-?[0-9,.]*W)?(-?[0-9,.]*D)?"
                r"(T(-?[0-9,.]*H)?(-?[0-9,.]*M)?(-?[0-9,.]*S)?)?",
}
FORMAT_RES = {k: re.compile(v) for k, v in FORMAT_PATTERNS.items()}

_NUMERIC_TYPES = frozenset(
    ["byte", "short", "int", "long", "ubyte", "ushort", "uint", "ulong",
     "integer", "float", "double", "number"]
)
_STRINGY_TYPES = frozenset(
    ["string", "base64", "hex", "uuid", "date", "time", "datetime",
     "duration", "char"]
)
# JS doubles: 2^64-1 rounds to 2^64; long bounds are exact in doubles.
_ULONG_MAX = float(18446744073709551615)
_INT_BOUNDS = {
    "byte": (-128, 127),
    "short": (-32768, 32767),
    "int": (-2147483648, 2147483647),
    "long": (-140737488355328, 140737488355327),  # ±2^47 quirk
    "ubyte": (0, 255),
    "ushort": (0, 65535),
    "uint": (0, 4294967295),
    "ulong": (0, _ULONG_MAX),
}


_JS_QUANT = re.compile(r"\{\d+(,\d*)?\}")


def js_regex_to_py(pattern: str, dollar: str = "\\Z") -> str:
    """Translate a JS regex into Python-``re`` (or RE2 with
    ``dollar="$"``) form, enforcing JS ``RegExp`` VALIDITY where Python
    is more permissive. Differences handled:

    * ``[]`` never matches in JS (→ ``(?!)``); ``[^]`` matches anything
      (→ ``[\\s\\S]``); ``]`` right after ``[`` is a literal in Python
      but closes the class in JS.
    * unescaped ``$`` = END OF TEXT in JS; Python ``$`` also matches
      before a trailing newline → ``\\Z`` (``$`` for RE2, whose ``$``
      is already text-end).
    * a quantifier directly after a quantifier (``a*+``, ``a{1,2}+``,
      ``a*??``, ``a*{1,2}``) or with nothing to repeat is a JS
      SyntaxError, while Python 3.11 reads possessive quantifiers —
      raise ``re.error``.
    * ``{m,n}`` with ``m > n`` is a JS SyntaxError; a brace NOT shaped
      like a quantifier is an Annex-B LITERAL in JS but may be a
      quantifier in Python (``a{,2}``) — escape it.
    * Python-only group syntax ``(?i…)``, ``(?#…)``, ``(?P…)``,
      ``(?(…)``, ``(?>…)`` is a JS "Invalid group" — raise
      ``re.error`` (JS admits ``(?:``, ``(?=``, ``(?!``, ``(?<=``,
      ``(?<!``, ``(?<name>``)."""
    out = []
    i = 0
    n = len(pattern)
    in_class = False
    cls_esc = False  # last in-class token was a class escape (\d …)
    # prev: what the previous token was, for JS quantifier validity —
    # "atom" (quantifiable), "quant", "lazy" (quantifier + ?), None
    prev = None
    while i < n:
        c = pattern[i]
        if c == "\\":
            if not in_class and pattern.startswith("\\k<", i):
                # JS named backreference \k<name> → Python (?P=name)
                j = pattern.find(">", i + 3)
                if j > 0:
                    out.append(f"(?P={pattern[i + 3:j]})")
                    i = j + 1
                    prev = "atom"
                    continue
            e = pattern[i + 1:i + 2]
            if e == "" :
                raise re.error("\\ at end of pattern (JS)", pattern, i)
            if e in "dDsSwWbBfnrtv0123456789":
                out.append(pattern[i:i + 2])
                cls_esc = in_class and e in "dDsSwW"
            elif e == "x" and re.fullmatch(r"[0-9A-Fa-f]{2}",
                                           pattern[i + 2:i + 4]):
                out.append(pattern[i:i + 4])
                i += 4
                if not in_class:
                    prev = "atom"
                continue
            elif e == "u" and re.fullmatch(r"[0-9A-Fa-f]{4}",
                                           pattern[i + 2:i + 6] or ""):
                out.append(pattern[i:i + 6])
                i += 6
                if not in_class:
                    prev = "atom"
                continue
            elif e == "c" and pattern[i + 2:i + 3].isalpha():
                # JS control escape \cX
                out.append(re.escape(
                    chr(ord(pattern[i + 2].upper()) - 64)))
                i += 3
                if not in_class:
                    prev = "atom"
                continue
            else:
                # JS Annex B: any other escaped char is a LITERAL
                # (\q → "q", bare \x/\u/\c too); Python rejects unknown
                # letter escapes
                out.append(re.escape(e))
            i += 2
            if not in_class:
                prev = "atom"
            continue
        if in_class:
            if c == "]":
                in_class = False
                cls_esc = False
                prev = "atom"
            elif c == "-" and (cls_esc or (
                    pattern[i + 1:i + 2] == "\\"
                    and pattern[i + 2:i + 3] in "dDsSwW")):
                # Annex B: a class range with a class-escape endpoint
                # ([q-\w], [\d-x]) reads the dash as a LITERAL in JS;
                # Python raises "bad character range"
                out.append("\\-")
                cls_esc = False
                i += 1
                continue
            else:
                cls_esc = False
            out.append(c)
            i += 1
            continue
        if c == "[":
            if pattern.startswith("[]", i):
                out.append("(?!)")
                i += 2
                prev = "atom"
                continue
            if pattern.startswith("[^]", i):
                out.append("[\\s\\S]")
                i += 3
                prev = "atom"
                continue
            in_class = True
            out.append(c)
            i += 1
            continue
        if c in "*+":
            if prev in ("quant", "lazy"):
                raise re.error("Nothing to repeat (JS)", pattern, i)
            out.append(c)
            prev = "quant"
            i += 1
            continue
        if c == "?":
            if prev == "quant":
                prev = "lazy"
            elif prev == "lazy":
                raise re.error("Nothing to repeat (JS)", pattern, i)
            else:
                prev = "quant"
            out.append(c)
            i += 1
            continue
        if c == "{":
            m = _JS_QUANT.match(pattern, i)
            if m is not None:
                if prev in ("quant", "lazy") or prev != "atom":
                    raise re.error("Nothing to repeat (JS)", pattern, i)
                body = m.group(0)[1:-1]
                if "," in body:
                    lo, hi = body.split(",", 1)
                    if hi and int(lo) > int(hi):
                        raise re.error(
                            "numbers out of order in {} quantifier (JS)",
                            pattern, i)
                out.append(m.group(0))
                i = m.end()
                prev = "quant"
                continue
            # Annex B: non-quantifier braces are literals in JS; escape
            # so Python cannot read shapes like {,2} as quantifiers
            out.append("\\{")
            prev = "atom"
            i += 1
            continue
        if c == "(":
            if pattern.startswith("(?", i):
                nxt = pattern[i + 2:i + 3]
                if nxt in (":", "=", "!"):
                    pass
                elif nxt == "<":
                    nxt2 = pattern[i + 3:i + 4]
                    if nxt2 in ("=", "!"):
                        pass
                    elif nxt2.isalpha() or nxt2 == "_":
                        # JS named group (?<name> → Python (?P<name>
                        out.append("(?P<")
                        prev = None
                        i += 3
                        continue
                    else:
                        raise re.error("Invalid group (JS)", pattern, i)
                else:
                    raise re.error("Invalid group (JS)", pattern, i)
            out.append(c)
            prev = None
            i += 1
            continue
        if c == ")":
            out.append(c)
            prev = "atom"
            i += 1
            continue
        if c in "|^":
            out.append(c)
            prev = None
            i += 1
            continue
        if c == "$":
            out.append(dollar)
            prev = None
            i += 1
            continue
        out.append(c)
        prev = "atom"
        i += 1
    return "".join(out)


class _JsMatcher:
    """JS ``RegExp("^" + pattern + "$").test`` semantics: the anchors
    are CONCATENATED, not grouped, so a top-level alternation splits
    them (``(\\d])\\w|()`` accepts every string via the empty-at-end
    branch — node-verified). Exposes ``fullmatch`` so call sites read
    naturally."""

    __slots__ = ("_rx", "pattern")

    def __init__(self, rx, pattern):
        self._rx = rx
        self.pattern = pattern

    def fullmatch(self, s):
        return self._rx.search(s)


@lru_cache(maxsize=8192)
def compile_regex_type(pattern: str):
    """Compile a ``(regex)`` type / property matcher once (vs per visit,
    index.js:392, 676). Anchored EXACTLY like the reference's
    ``RegExp("^" + pattern + "$")`` — concatenated anchors that a
    top-level alternation splits — evaluated via search."""
    try:
        rx = re.compile("^" + js_regex_to_py(pattern) + r"\Z")
        return _JsMatcher(rx, pattern)
    except re.error as e:
        raise SJOTSchemaError(str(e), pattern) from None


def js_strict_eq(a, b) -> bool:
    """JS ``===`` for JSON values (1 === 1.0 but 1 !== true, 1 !== "1")."""
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a == b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b  # objects/arrays compare by identity in JS


def _is_ref(type_str: str) -> bool:
    """A string type containing ``#`` that is not a regex, array, or set is a
    type reference (index.js:137)."""
    return (
        "#" in type_str
        and not type_str.startswith("(")
        and not type_str.endswith("]")
        and not type_str.endswith("}")
    )


def is_union(type_) -> bool:
    """``[[t1, t2, …]]`` with at least two branches (index.js:1717-1726)."""
    return (
        isinstance(type_, list)
        and len(type_) == 1
        and isinstance(type_[0], list)
        and len(type_[0]) > 1
    )


class _ExternalLoadDisabled(Exception):
    pass


# URL → schema dict, pre-registered on the driver (compile-time prefetch;
# ship the resolved schema list to workers via ray.put — workers never do
# load-time I/O)
_SCHEMA_URL_REGISTRY: dict[str, dict] = {}


def register_schema_url(url: str, schema: dict) -> None:
    """Pre-register the schema served at ``url`` so ``URI#type`` refs
    resolve without I/O (the scale path: resolve once on the driver,
    broadcast the schema list)."""
    _SCHEMA_URL_REGISTRY[url] = schema


def load_external_schema(url: str, allow_local: bool = False):
    """External ``URI#type`` schema fetch (reference: synchronous XHR,
    index.js:1166-1191). Resolves from the URL registry
    (:func:`register_schema_url`); with ``allow_local=True`` — passed
    ONLY by the driver-side compile-time prefetcher
    (:func:`resolve_external_refs`) — also ``file://`` URLs and plain
    local paths. Validation-time resolution (``reftype``) is
    registry-only: a ref string arriving in untrusted DATA (embedded
    ``@sjot``) must never read worker-local files (arbitrary-path read
    / file-existence oracle). Network URLs are disabled by design:
    register or prefetch them up front. File read/parse errors surface
    as :class:`SJOTSchemaError` (so a bad ref fails the document, not
    the Ray task)."""
    import copy
    import json

    hit = _SCHEMA_URL_REGISTRY.get(url)
    if hit is not None:
        return copy.deepcopy(hit)
    if allow_local:
        path = url[len("file://"):] if url.startswith("file://") else url
        if "://" not in path and os.path.exists(path):
            try:
                with open(path) as f:
                    loaded = json.load(f)
            except (OSError, UnicodeDecodeError, ValueError) as e:
                raise SJOTSchemaError(
                    f'schema "{url}" load error: {e}', f"/{url}") from None
            if not isinstance(loaded, dict):
                raise SJOTSchemaError(
                    f'schema "{url}" load error: not a JSON object',
                    f"/{url}")
            return loaded
    raise _ExternalLoadDisabled(
        f"external schema loading disabled for unregistered URL: {url}")


def resolve_external_refs(schema) -> list:
    """Compile-time prefetch: walk a schema (or schema list) for
    ``URI#type`` refs whose URI is not yet in the ``@id`` registry, load
    each (registry/file), and return the extended schema list — call once
    on the driver, then broadcast the result with ``ray.put``."""
    sjots = list(schema) if isinstance(schema, list) else [schema]
    seen = {s.get("@id") for s in sjots if isinstance(s, dict)}

    def walk(t):
        if isinstance(t, str):
            # container-suffixed refs ("URI#type[]", "URI#type{2,}") are
            # array/set types whose ITEM type is the external ref — strip
            # the suffixes before resolving (char[...] stays a scalar)
            base = t
            while base and (base.endswith("]") or base.endswith("}")) \
                    and not (base.startswith("char")
                             and base.find("]") == len(base) - 1):
                i = base.rfind("{" if base.endswith("}") else "[")
                if i <= 0:
                    break
                base = base[:i]
            t = base
            h = t.find("#")
            if h > 0 and not t.startswith("(") and not t.endswith("]") \
                    and not t.endswith("}"):
                uri = t[:h]
                if uri not in seen:
                    seen.add(uri)
                    loaded = load_external_schema(uri, allow_local=True)
                    if loaded.get("@id", uri) != uri:
                        raise SJOTSchemaError(
                            f'schema "{uri}" load error due to @id URL'
                            " mismatch", f"/{t}")
                    loaded["@id"] = uri
                    sjots.append(loaded)
                    walk_obj(loaded)
        elif isinstance(t, list):
            for x in t:
                walk(x)
        elif isinstance(t, dict):
            walk_obj(t)

    def walk_obj(obj):
        for k, v in obj.items():
            if k in ("@one", "@any", "@all", "@dep", "@id", "@note"):
                continue
            walk(v)

    for s in list(sjots):
        if isinstance(s, dict):
            walk_obj(s)
    return sjots


def roottype(sjot):
    """``@root`` or the unique non-@ named type (index.js:1068-1099)."""
    if isinstance(sjot, dict) and "@root" in sjot:
        t = sjot["@root"]
        if not (isinstance(t, str) and t.endswith("#")):
            return t
        raise SJOTSchemaError("root refers to a root", "schema")
    root = None
    for prop in sjot:
        if not prop.startswith("@"):
            if root is not None:
                raise SJOTSchemaError(
                    f"has no unique root {root}, also found {prop}", "schema")
            root = prop
    if root is not None:
        return sjot[root]
    raise SJOTSchemaError("has no @root", "schema")


def reftype(sjots, type_str, sjot, typepath=""):
    """Resolve ``[URI]#[name]`` (index.js:1102-1163); rejects ref-to-ref
    ("spaghetti"); cross-schema refs resolved from the ``@id`` registry."""
    h = type_str.find("#")
    prop = type_str[h + 1:]
    if h <= 0:
        if prop == "":
            return roottype(sjot)
        if not (isinstance(sjot, dict) and prop in sjot):
            raise SJOTSchemaError(
                f"missing named type referenced by {prop}",
                f"{typepath}/{type_str}")
        t = sjot[prop]
        if isinstance(t, str) and _is_ref(t):
            raise SJOTSchemaError(
                "spaghetti references to named types not permitted",
                f"{typepath}/{t}")
        return t
    uri = type_str[:h]
    for s in sjots:
        if isinstance(s, dict) and s.get("@id") == uri:
            if prop == "":
                return roottype(s)
            if prop not in s:
                raise SJOTSchemaError(
                    f"schema {uri} missing named type referenced by {prop}",
                    f"{typepath}/{type_str}")
            t = s[prop]
            if isinstance(t, str) and _is_ref(t):
                raise SJOTSchemaError(
                    "spaghetti references to named types not permitted",
                    f"{typepath}/{t}")
            return t
    try:
        loaded = load_external_schema(uri)
        if loaded.get("@id", uri) != uri:
            raise SJOTSchemaError(
                f'schema "{uri}" load error due to @id URL mismatch',
                f"{typepath}/{type_str}")
        loaded["@id"] = uri
        sjots.append(loaded)
        return reftype(sjots, type_str, sjot, typepath)
    except _ExternalLoadDisabled as e:
        raise SJOTSchemaError(
            f'no type {prop} found in "{uri}" {e}',
            f"{typepath}/{type_str}") from None


def extend_type(sjots, type_, sjot, typepath=""):
    """Expand ``@extends`` into the type in place, once (index.js:969-1065).

    ``@one/@any/@all`` propsets concatenate; ``@dep`` entries merge; final
    bases cannot be extended; property overrides are rejected. ``@extends``
    is set to None afterward to mark the expansion memoized.
    """
    if "@extends" not in type_:
        return
    basename = type_["@extends"]
    type_["@extends"] = None
    if basename is None:
        return
    if not isinstance(basename, str):
        raise SJOTSchemaError("@extends does not refer to an object", typepath)
    base = reftype(sjots, basename, sjot, typepath)
    if not isinstance(base, dict):
        raise SJOTSchemaError("@extends does not refer to an object", typepath)
    extend_type(sjots, base, sjot, typepath)
    for prop in list(base.keys()):
        if prop.startswith("@"):
            if prop == "@final":
                if base[prop]:
                    raise SJOTSchemaError(
                        f"@extends {basename} that is final", typepath)
            elif prop in ("@one", "@any", "@all"):
                if prop in type_:
                    type_[prop] = type_[prop] + base[prop]
                else:
                    type_[prop] = base[prop]
            elif prop == "@dep":
                if "@dep" not in type_:
                    type_[prop] = {}
                for name, deps in base[prop].items():
                    if name in type_[prop]:
                        cur = type_[prop][name]
                        if isinstance(cur, str):
                            cur = [cur]
                        if isinstance(deps, str):
                            cur = cur + [deps]
                        else:
                            cur = cur + deps
                        type_[prop][name] = cur
                    else:
                        type_[prop][name] = deps
        else:
            if prop in type_:
                raise SJOTSchemaError(
                    f"overriding of {basename}/{prop} is not permitted",
                    f"{typepath}/{prop}")
            type_[prop] = base[prop]


def default_value(value, sjots, data, type_, sjot, datapath="", typepath=""):
    """Default for ``"prop?default"`` / null replacement (index.js:1194-1244):
    numbers parse the default text (0 for ``"null"``), strings take it
    literally ("" for ``"null"``), booleans compare to ``"true"``; arrays,
    sets, objects, and non-string types default to null."""
    from .jsutil import parse_float_js

    if not isinstance(type_, str) or type_.endswith("]") or type_.endswith("}"):
        return None
    if "#" in type_ and not type_.startswith("("):
        type_ = reftype(sjots, type_, sjot, typepath)
    if not isinstance(type_, str) or type_.endswith("]") or type_.endswith("}"):
        return None
    if type_ == "null":
        return None
    if type_ in ("boolean", "true", "false"):
        return value == "true"
    if type_ in _NUMERIC_TYPES:
        if value == "null":
            return 0
        return _as_json_number(parse_float_js(value))
    if type_ in ("object", "array"):
        return None
    if not type_.startswith("(") and re.search(r"\d", type_):
        if value == "null":
            return 0
        return _as_json_number(parse_float_js(value))
    return "" if value == "null" else value


def _as_json_number(f: float):
    """Collapse integral floats to ints (JS has one number type)."""
    import math as _math

    if _math.isnan(f) or _math.isinf(f):
        return f
    return int(f) if f == int(f) else f


# ---------------------------------------------------------------------------
# union dispatch (compiled once per union object and cached, vs rebuilt on
# every validation call in the reference — index.js:764-766, TODO at :1729)

class _UnionSlots:
    __slots__ = ("n", "b", "x", "s", "o", "p", "t", "v", "d")

    def __init__(self):
        self.n = None; self.b = None; self.x = None; self.s = None
        self.o = None; self.p = None
        self.t = None; self.v = None; self.d = None


def build_union_dispatch(sjots, branch, itemtype, sjot, typepath, union, n):
    """Accumulate one union branch into the per-depth dispatch table
    (mirrors index.js:1730-2043). ``union`` maps depth→_UnionSlots; key 0
    holds the ``any`` cut-off depth."""
    if isinstance(itemtype, str):
        i = len(itemtype)
        while i > 0:
            if itemtype[i - 1] == "]":
                i = itemtype.rfind("[", 0, i - 1)
            elif itemtype[i - 1] == "}":
                i = itemtype.rfind("{", 0, i - 1)
            else:
                break
            n += 1
        itemtype = itemtype[:i]
        if "#" in itemtype and not itemtype.startswith("("):
            return build_union_dispatch(
                sjots, branch, reftype(sjots, itemtype, sjot, typepath),
                sjot, typepath, union, n)

    if itemtype == "char" and n > 0:
        n -= 1
        itemtype = "string"
    elif itemtype == "array":
        n += 1
        itemtype = "any"
    elif isinstance(itemtype, list):
        if len(itemtype) == 0:
            n += 1
            itemtype = "any"
        elif len(itemtype) == 1 or (len(itemtype) > 1
                                    and isinstance(itemtype[1], (int, float))
                                    and not isinstance(itemtype[1], bool)):
            if is_union(itemtype):
                raise SJOTSchemaError("nested unions are not permitted", typepath)
            n += 1
            if isinstance(itemtype[0], (int, float)) and not isinstance(itemtype[0], bool):
                itemtype = "any"
            else:
                return build_union_dispatch(
                    sjots, branch, itemtype[0], sjot, typepath, union, n)
        elif isinstance(itemtype[0], (int, float)) and not isinstance(itemtype[0], bool):
            n += 1
            if isinstance(itemtype[1], (int, float)) and not isinstance(itemtype[1], bool):
                itemtype = "any"
            else:
                return build_union_dispatch(
                    sjots, branch, itemtype[1], sjot, typepath, union, n)
        else:
            n += 1
            itemtype = "any"  # tuples are represented by "any[]"

    # union[0] doubles as the "any" cutoff (an int) AND the slot bucket
    # for the reference's bare-"char" depth decrement (index.js:1764-1768
    # lands n=0, so union[0] holds a SLOTS object — JS compares
    # n >= object as false and property-writes on a number silently
    # no-op, making a bare "char" union branch dead; node-oracle
    # verified: "c" does NOT match [["true","char","string[]"]])
    cutoff = union.get(0)
    if isinstance(cutoff, int) and n >= cutoff:
        raise SJOTSchemaError("union requires distinct types", typepath)
    slots = union.get(n)
    if slots is None:
        slots = union[n] = _UnionSlots()
    if isinstance(slots, int):
        # n == 0 (a bare "char" branch) with union[0] already an int
        # cutoff (an earlier "any" branch): the reference's strict-mode
        # `union[0].s = type` THROWS TypeError ("Cannot create property
        # 's' on number") — the schema is unusable; surface it as a
        # schema error (the node differential maps the TypeError here)
        raise SJOTSchemaError("union requires distinct types", typepath)

    if isinstance(itemtype, str):
        if itemtype == "null":
            if slots.n is not None:
                raise SJOTSchemaError("union has multiple null types", typepath)
            slots.n = branch
        elif itemtype in ("boolean", "true", "false"):
            if n > 1 and slots.b is not None:
                raise SJOTSchemaError("union has multiple boolean types", typepath)
            slots.b = branch
        elif itemtype in _NUMERIC_TYPES:
            if n > 1 and slots.x is not None:
                raise SJOTSchemaError("union has multiple numeric types", typepath)
            slots.x = branch
        elif itemtype in _STRINGY_TYPES:
            if n > 1 and slots.s is not None:
                raise SJOTSchemaError("union has multiple string types", typepath)
            slots.s = branch
        elif itemtype == "any":
            for depth, sl in union.items():
                if depth != 0 and depth >= n and sl is not None and (
                        sl.n is not None or sl.b is not None or sl.x is not None
                        or sl.s is not None or sl.o is not None or sl.p is not None):
                    raise SJOTSchemaError("union requires distinct types", typepath)
            union[0] = n
        elif itemtype == "atom":
            if slots.b is not None or slots.x is not None or slots.s is not None:
                raise SJOTSchemaError("union has multiple atomic types", typepath)
            slots.b = branch
            slots.x = branch
            slots.s = branch
        elif itemtype == "object":
            if slots.o is not None or slots.p is not None:
                raise SJOTSchemaError("union requires distinct object types", typepath)
            slots.o = branch
        elif itemtype.startswith("("):
            if n > 1 and slots.s is not None:
                raise SJOTSchemaError("union has multiple string array types", typepath)
            slots.s = branch
        else:
            if n > 1 and slots.x is not None:
                raise SJOTSchemaError("union has multiple numeric array types", typepath)
            slots.x = branch
    elif isinstance(itemtype, dict):
        if "@if" in itemtype:
            when = itemtype["@if"]
            if not isinstance(when, str):
                raise SJOTSchemaError("@if value is not a property name", typepath)
            if "@then" not in itemtype:
                raise SJOTSchemaError(f'@if "{when}" has no @then object', typepath)
            then = itemtype["@then"]
            if isinstance(then, str) and _is_ref(then):
                then = reftype(sjots, then, sjot, typepath)
            if not isinstance(then, dict):
                raise SJOTSchemaError("@then value is not an object type", typepath)
            found = None
            for prop in then:
                if not prop.startswith("@") and not prop.startswith("("):
                    q = prop.find("?")
                    name = prop[:q] if q != -1 else prop
                    if name == when:
                        found = prop
                        break
            if found is None:
                raise SJOTSchemaError(
                    f'@if "{when}" is not a property of @then object', typepath)
            if slots.t is None:
                slots.t, slots.v, slots.d = [when], [then[found]], [then]
            else:
                slots.t.append(when)
                slots.v.append(then[found])
                slots.d.append(then)
        else:
            if slots.o is not None:
                raise SJOTSchemaError("union requires distinct object types", typepath)
            prevp = slots.p
            empty = True
            for prop in itemtype:
                if prop.startswith("@"):
                    continue
                if prop.startswith("("):
                    # a regex-prop object claims the whole object slot
                    if slots.o is not None:
                        raise SJOTSchemaError(
                            "union requires distinct object types", typepath)
                    slots.o = branch
                    empty = False
                    break
                q = prop.find("?")
                name = prop[:q] if q != -1 else prop
                if q == -1:
                    empty = False
                if prevp is not None and name in prevp:
                    raise SJOTSchemaError(
                        "union requires distinct object types", typepath)
                if slots.p is None:
                    slots.p = {}
                slots.p[name] = branch
            if empty:
                if slots.o is not None or prevp is not None:
                    raise SJOTSchemaError(
                        "union requires distinct object types", typepath)
                slots.o = branch


class Context:
    """Per-validation-session caches (compiled once, reused across calls)."""

    def __init__(self):
        # id(union_list) → (union_list strong ref, dispatch table). Like
        # obj_plans below, the strong ref pins the list so CPython cannot
        # reuse its id while cached (union lists inside embedded @sjot
        # schemas come from per-document data; without the pin a later
        # document's list could collide on id and read a stale table).
        self.union_cache: dict[int, tuple] = {}
        # id(type_dict) → (type_dict strong ref, _ObjPlan). The strong ref
        # pins the dict so CPython cannot reuse its id while cached
        # (embedded @sjot schemas come from data and would otherwise be
        # garbage-collected under a colliding id).
        self.obj_plans: dict[int, tuple] = {}

    def obj_plan(self, type_: dict) -> "_ObjPlan":
        key = id(type_)
        hit = self.obj_plans.get(key)
        if hit is not None:
            return hit[1]
        plan = _compile_obj_plan(type_)
        if len(self.obj_plans) > 10000:  # adversarial embedded-@sjot bound
            self.obj_plans.clear()
        self.obj_plans[key] = (type_, plan)
        return plan

    def union_dispatch(self, sjots, type_, sjot, typepath):
        key = id(type_[0])
        hit = self.union_cache.get(key)
        if hit is not None:
            return hit[1]
        table = {}
        for i, branch in enumerate(type_[0]):
            build_union_dispatch(
                sjots, branch, branch, sjot,
                f"{typepath}[[{i}]]", table, 1)
        if len(self.union_cache) > 10000:  # adversarial embedded-@sjot bound
            self.union_cache.clear()
        self.union_cache[key] = (type_[0], table)
        return table


class _ObjPlan:
    __slots__ = ("isfinal", "entries")

    def __init__(self, isfinal, entries):
        self.isfinal = isfinal
        self.entries = entries


def _compile_obj_plan(type_: dict) -> _ObjPlan:
    """Member plan for one object type, in dict order (entry kinds:
    0 required, 1 optional, 2 regex-prop, 3 propset, 4 @dep)."""
    entries = []
    for prop, proptype in type_.items():
        if prop.startswith("@"):
            if prop in ("@one", "@any", "@all"):
                entries.append((3, prop[1:], proptype))
            elif prop == "@dep":
                entries.append((4, list(proptype.items())))
        elif prop.startswith("("):
            entries.append((2, prop, compile_regex_type(prop), proptype))
        else:
            q = prop.find("?")
            if q == -1:
                entries.append((0, prop, proptype))
            else:
                tail = prop[q + 1:] if q < len(prop) - 1 else None
                entries.append((1, prop[:q], prop, proptype, tail))
    return _ObjPlan(bool(type_.get("@final", False)), entries)


# ---------------------------------------------------------------------------
# the walker

def _err(what, data, type_, datapath, typepath):
    raise SJOTValidationError(what, data, type_, datapath, typepath)


def validate_value(sjots, data, type_, sjot, datapath="$", typepath="/@root",
                   ctx: Context | None = None):
    """Validate (and normalize, in place) one JSON value against a type.

    Raises SJOTValidationError on the first violation; returns the possibly
    replaced value (callers writing container slots use the return).
    """
    if ctx is None:
        ctx = Context()

    if type_ == "any":
        if isinstance(data, dict) and "@sjot" in data:
            sjoot = data["@sjot"]
            if isinstance(sjoot, list):
                return validate_value(
                    sjots + sjoot, data, roottype(sjoot[0]), sjoot[0],
                    datapath, typepath + "{" + datapath + ".@sjot}", ctx)
            if isinstance(sjoot, str) and sjoot not in ("any", "object"):
                return validate_value(
                    sjots, data, sjoot, sjot,
                    datapath, typepath + "{" + datapath + ".@sjot}", ctx)
            if isinstance(sjoot, dict):
                return validate_value(
                    sjots + [sjoot], data, roottype(sjoot), sjoot,
                    datapath, typepath + "{" + datapath + ".@sjot}", ctx)
            raise SJOTSchemaError(f"Invalid @sjot schema {datapath}")
        return data

    if isinstance(type_, str) and _is_ref(type_):
        return validate_value(
            sjots, data, reftype(sjots, type_, sjot, typepath), sjot,
            datapath, f"{typepath}/{type_}", ctx)

    if is_union(type_):
        return _validate_union(sjots, data, type_, sjot, datapath, typepath, ctx)

    # --- null -------------------------------------------------------------
    if data is None:
        if type_ == "null":
            return data
        _err("value", data, type_, datapath, typepath)

    # --- arrays -----------------------------------------------------------
    if isinstance(data, list):
        return _validate_array(sjots, data, type_, sjot, datapath, typepath, ctx)

    # --- objects ----------------------------------------------------------
    if isinstance(data, dict):
        return _validate_object(sjots, data, type_, sjot, datapath, typepath, ctx)

    # --- booleans ---------------------------------------------------------
    if isinstance(data, bool):
        if (type_ == "boolean" or type_ == "atom"
                or (data and type_ == "true")
                or (not data and type_ == "false")):
            return data
        _err("value", data, type_, datapath, typepath)

    # --- numbers ----------------------------------------------------------
    if isinstance(data, (int, float)):
        if isinstance(data, int) and abs(data) > 2**53:
            # JS numbers are doubles: JSON.parse loses integer precision
            # beyond 2^53, and comparisons happen on the rounded value
            data = float(data)
        isfloat = is_float_value(data)
        if type_ in ("atom", "number", "float", "double"):
            return data
        if type_ == "integer":
            if isfloat:
                _err("value", data, type_, datapath, typepath)
            return data
        b = _INT_BOUNDS.get(type_) if isinstance(type_, str) else None
        if b is not None:
            if data < b[0] or data > b[1] or isfloat:
                _err("value", data, type_, datapath, typepath)
            return data
        if not isinstance(type_, str):
            _err("value", data, type_, datapath, typepath)
        if range_check(compile_range(type_), data, isfloat):
            return data
        _err("value", data, type_, datapath, typepath)

    # --- strings ----------------------------------------------------------
    if isinstance(data, str):
        if type_ in ("string", "char[]", "atom"):
            return data
        if not isinstance(type_, str):
            _err("value", data, type_, datapath, typepath)
        if type_.startswith("("):
            if compile_regex_type(type_).fullmatch(data):
                return data
        elif type_[:4] == "char":
            if type_ == "char":
                if len(data) == 1:
                    return data
            else:
                if not bounds_check(compile_bounds(type_, 5), len(data)):
                    _err("length", len(data), type_, datapath, typepath)
                return data
        else:
            fmt = FORMAT_RES.get(type_)
            if fmt is not None and fmt.fullmatch(data):
                return data
        _err("value", data, type_, datapath, typepath)

    # anything else (non-JSON value, e.g. Python object) mirrors the
    # reference's typeof-default branch (index.js:751-753)
    raise SJOTSchemaError("is not a valid type", f"{typepath}/{type_}")


def _validate_array(sjots, data, type_, sjot, datapath, typepath, ctx):
    if type_ == "array" or type_ == "any[]":
        return data

    if isinstance(type_, list):
        n_type = len(type_)
        if n_type == 0:
            return data

        def _num(x):
            return isinstance(x, (int, float)) and not isinstance(x, bool)

        def _item_pass(i, itemtype, tp):
            if data[i] is None:
                data[i] = default_value(
                    "null", sjots, None, itemtype, sjot,
                    f"{datapath}[{i}]", tp)
            validate_value(sjots, data[i], itemtype, sjot,
                           f"{datapath}[{i}]", tp, ctx)

        def _resolve_item(itemtype, tp):
            # hoist the per-item type-ref deref out of the loop (the
            # dispatcher would re-resolve for every element; the resolved
            # type and extended typepath are loop-invariant)
            while isinstance(itemtype, str) and _is_ref(itemtype):
                resolved = reftype(sjots, itemtype, sjot, tp)
                tp = f"{tp}/{itemtype}"
                itemtype = resolved
            return itemtype, tp

        if n_type == 1:
            if _num(type_[0]):
                if len(data) != type_[0]:
                    _err("length", type_[0], "any", datapath, typepath + "[]")
            else:
                it, tp = _resolve_item(type_[0], typepath + "[]")
                for i in range(len(data)):
                    _item_pass(i, it, tp)
            return data
        if _num(type_[1]):
            # [type,m] or [n,m]
            if len(data) > type_[1]:
                _err("length", type_[1], type_[0], datapath, typepath + "[]")
            if _num(type_[0]):
                if len(data) < type_[0]:
                    _err("length", type_[0], "any", datapath, typepath + "[]")
            else:
                it, tp = _resolve_item(type_[0], typepath + "[]")
                for i in range(len(data)):
                    _item_pass(i, it, tp)
            return data
        if _num(type_[0]):
            # [n,type] or [n,type,m]
            if len(data) < type_[0]:
                _err("length", type_[0], type_[1], datapath, typepath + "[]")
            if n_type > 2 and _num(type_[2]) and len(data) > type_[2]:
                _err("length", type_[2], type_[1], datapath, typepath + "[]")
            it, tp = _resolve_item(type_[1], typepath + "[]")
            for i in range(len(data)):
                _item_pass(i, it, tp)
            return data
        # tuple
        if len(data) != n_type:
            _err("array of length", len(data), type_, datapath, typepath)
        for i in range(len(data)):
            if data[i] is None:
                data[i] = default_value(
                    "null", sjots, None, type_[i], sjot,
                    f"{datapath}[{i}]", typepath + "[]")
            validate_value(sjots, data[i], type_[i], sjot,
                           f"{datapath}[{i}]", typepath + "[]", ctx)
        return data

    if isinstance(type_, str):
        if type_.endswith("]"):
            i = type_.rfind("[")
            itemtype = type_[:i]
            if not bounds_check(compile_bounds(type_, i + 1), len(data)):
                _err("length", len(data), type_, datapath, typepath)
            it = itemtype
            tp = typepath
            while isinstance(it, str) and _is_ref(it):
                resolved = reftype(sjots, it, sjot, tp)
                tp = f"{tp}/{it}"
                it = resolved
            for j in range(len(data)):
                if data[j] is None:
                    data[j] = default_value(
                        "null", sjots, None, it, sjot,
                        f"{datapath}[{j}]", tp)
                validate_value(sjots, data[j], it, sjot,
                               f"{datapath}[{j}]", tp, ctx)
            return data
        if type_.endswith("}"):
            # set: array of unique atoms; reference sorts the input in place
            # by String() order then rejects adjacent strict-equal duplicates
            i = type_.rfind("{")
            itemtype = type_[:i]
            if _is_ref(itemtype):
                itemtype = reftype(sjots, itemtype, sjot, typepath)
                if not isinstance(itemtype, str):
                    _err("value", data, type_, datapath, typepath)
            orig_len = len(data)
            data.sort(key=js_string)
            deduped = [e for k, e in enumerate(data)
                       if k == 0 or not js_strict_eq(e, data[k - 1])]
            if len(deduped) != orig_len:
                _err("value", data, type_, datapath, typepath)
            if not bounds_check(compile_bounds(type_, i + 1), len(deduped)):
                _err("length", len(deduped), type_, datapath, typepath)
            for j in range(len(deduped)):
                item = deduped[j]
                if item is None:
                    item = default_value(
                        "null", sjots, None, itemtype, sjot,
                        f"{datapath}[{j}]", typepath)
                validate_value(sjots, item, itemtype, sjot,
                               f"{datapath}[{j}]", typepath, ctx)
            return data

    _err("value", data, type_, datapath, typepath)


def _validate_object(sjots, data, type_, sjot, datapath, typepath, ctx):
    if type_ == "object":
        # any object; may carry an embedded @sjot schema
        return validate_value(sjots, data, "any", sjot, datapath, typepath, ctx)

    if type_ in ("date", "time", "datetime"):
        # reference quirk: objects always fail here (index.js:330-335)
        _err("value", data, type_, datapath, typepath)

    if isinstance(type_, list):
        # JS typeof [] === "object": the reference's object-property walk
        # iterates a list type's indices as string props ("0", "1", …), so
        # object data against an array type demands those keys be present
        type_ = {str(i): t for i, t in enumerate(type_)}
    if not isinstance(type_, dict):
        _err("value", data, type_, datapath, typepath)

    if "@extends" in type_:
        extend_type(sjots, type_, sjot, typepath)

    # per-type-dict member plan, compiled on first visit and cached (the
    # reference re-inspects every property name on every visit; we keep
    # the same iteration order/semantics with the string parsing hoisted)
    plan = ctx.obj_plan(type_)
    isfinal = plan.isfinal
    matched_props = {} if isfinal else None

    for entry in plan.entries:
        kind = entry[0]
        if kind == 0:  # required prop
            _, prop, proptype = entry
            if prop not in data:
                _err("should be present", data, "",
                     f"{datapath}.{prop}", typepath)
            validate_value(sjots, data[prop], proptype, sjot,
                           f"{datapath}.{prop}", f"{typepath}/{prop}", ctx)
            if isfinal:
                matched_props[prop] = None
        elif kind == 1:  # optional prop (with/without default)
            _, name, prop, proptype, default_tail = entry
            if name in data and data[name] is not None:
                validate_value(sjots, data[name], proptype, sjot,
                               f"{datapath}.{name}",
                               f"{typepath}/{prop}", ctx)
            elif default_tail is not None:
                data[name] = default_value(
                    default_tail, sjots, data, proptype, sjot,
                    f"{datapath}.{name}", f"{typepath}/{prop}")
                validate_value(sjots, data[name], proptype, sjot,
                               f"{datapath}.{name}",
                               f"{typepath}/{prop}", ctx)
            elif name in data:
                del data[name]
            if isfinal:
                matched_props[name] = None
        elif kind == 2:  # regex property name
            _, prop, matcher, proptype = entry
            for name in list(data.keys()):
                if matcher.fullmatch(name):
                    validate_value(sjots, data[name], proptype, sjot,
                                   f"{datapath}.{name}",
                                   f"{typepath}/{prop}", ctx)
                    if isfinal:
                        matched_props[name] = None
        elif kind == 3:  # @one / @any / @all
            _, mode, psets = entry
            for pset in psets:
                n_present = sum(1 for p in pset if p in data)
                if mode == "one" and n_present != 1:
                    _err(f"requires one of {','.join(pset)} properties",
                         data, "", datapath, typepath + "/@one")
                if mode == "any" and n_present == 0:
                    _err(f"requires any of {','.join(pset)} properties",
                         data, "", datapath, typepath + "/@any")
                if mode == "all" and 0 < n_present < len(pset):
                    _err(f"requires all or none of {','.join(pset)}"
                         " properties",
                         data, "", datapath, typepath + "/@all")
        else:  # kind == 4: @dep
            _, deps_items = entry
            for name, deps in deps_items:
                if name in data and \
                        (not isinstance(deps, str) or deps not in data) and \
                        (not isinstance(deps, list)
                         or not all(p in data for p in deps)):
                    _err(f"requires {js_string(deps)}", data, "",
                         f"{datapath}.{name}", typepath + "/@dep")

    if isfinal:
        for prop in data:
            if prop != "@sjot" and prop not in matched_props:
                _err("additional property should not be present", data, "",
                     f"{datapath}.{prop}", typepath + "/@final")
    return data


def _validate_union(sjots, data, type_, sjot, datapath, typepath, ctx):
    union = ctx.union_dispatch(sjots, type_, sjot, typepath)
    # union[0] is the "any" cutoff ONLY when it is an int — a bare
    # "char" branch parks a slots object there (dead at runtime; JS
    # compares n >= object as false, build_union_dispatch mirrors it)
    cutoff = union.get(0)
    if not isinstance(cutoff, int):
        cutoff = None

    n = 1
    item = data
    while isinstance(item, list):
        n += 1
        if len(item) == 0:
            if (cutoff is not None and n >= cutoff) or union.get(n) is not None:
                return data
            _err("value", data, type_, datapath, typepath)
        item = item[0]

    if cutoff is not None and n >= cutoff:
        return data

    slots = union.get(n)
    if slots is not None:
        if item is None:
            if slots.n is None:
                _err("value", data, type_, datapath, typepath)
            return validate_value(sjots, data, slots.n, sjot,
                                  datapath, typepath, ctx)
        if isinstance(item, bool):
            slot = slots.b
        elif isinstance(item, (int, float)):
            slot = slots.x
        elif isinstance(item, str):
            slot = slots.s
        else:
            slot = "object"

        if slot == "object":
            if slots.o is not None:
                return validate_value(sjots, data, slots.o, sjot,
                                      datapath, typepath, ctx)
            if slots.t is not None:
                for i, disc in enumerate(slots.t):
                    if disc in item:
                        try:
                            validate_value(sjots, item[disc], slots.v[i],
                                           sjot, datapath, typepath, ctx)
                        except (SJOTValidationError, SJOTSchemaError):
                            continue
                        return validate_value(sjots, data, slots.d[i], sjot,
                                              datapath, typepath, ctx)
            if slots.p is not None:
                # first data property (streaming order) that names a branch
                for prop in item:
                    if prop in slots.p:
                        return validate_value(sjots, data, slots.p[prop],
                                              sjot, datapath, typepath, ctx)
        elif slot is not None:
            if n > 1:
                return validate_value(sjots, data, slot, sjot,
                                      datapath, typepath, ctx)
            for branch in type_[0]:
                try:
                    return validate_value(sjots, data, branch, sjot,
                                          datapath, typepath, ctx)
                except (SJOTValidationError, SJOTSchemaError):
                    continue

    _err("value", data, type_, datapath, typepath)


# ---------------------------------------------------------------------------
# public API (mirrors SJOT.validate / SJOT.valid, index.js:28-76)

def validate(data, type_=None, schema=None, ctx: Context | None = None):
    """Validate ``data``; raises on the first violation, returns True."""
    sjots = schema
    if isinstance(schema, str):
        sjots = json.loads(schema)
    if type_ in ("#", "@root"):
        type_ = None
    if type_ is None:
        if sjots is None:
            type_ = "any"
        elif isinstance(sjots, list) and len(sjots) > 0:
            type_ = roottype(sjots[0])
        elif isinstance(sjots, dict):
            type_ = roottype(sjots)
        else:
            raise SJOTSchemaError("is not a SJOT schema object",
                                  type(sjots).__name__)
    if isinstance(sjots, list) and len(sjots) > 0:
        validate_value(sjots, data, type_, sjots[0], "$", "/@root", ctx)
    else:
        validate_value([sjots], data, type_, sjots, "$", "/@root", ctx)
    return True


def valid(data, type_=None, schema=None, ctx: Context | None = None) -> bool:
    """Boolean wrapper around :func:`validate`."""
    try:
        return validate(data, type_, schema, ctx)
    except (SJOTValidationError, SJOTSchemaError):
        return False


# ---------------------------------------------------------------------------
# extension surface (SURVEY.md §2.5 E4): custom named string formats.
# Registered formats become first-class SJOT types in BOTH engines — the
# row walker reads FORMAT_RES and the columnar compiler reads
# FORMAT_PATTERNS — mirroring how the reference's format switch works
# (index.js:694-745), but user-extensible.

def register_format(name: str, pattern: str) -> None:
    """Register a custom string-format type usable anywhere a builtin
    format (``hex``, ``uuid``, …) is. ``pattern`` is anchored like the
    builtins (fullmatch)."""
    if name in ("string", "char", "any", "object", "array", "atom", "null") \
            or name in _NUMERIC_TYPES or name in ("boolean", "true", "false"):
        raise SJOTSchemaError(f"cannot override builtin type {name}")
    FORMAT_PATTERNS[name] = pattern
    FORMAT_RES[name] = re.compile(pattern)
    _STRINGY_TYPES_MUTABLE.add(name)


# _STRINGY_TYPES is used for union dispatch; registered formats join it
_STRINGY_TYPES_MUTABLE = set(_STRINGY_TYPES)
_STRINGY_TYPES = _STRINGY_TYPES_MUTABLE
