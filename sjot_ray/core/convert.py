"""Schema converters: SJOT ⇄ JSON Schema (driver-side utilities).

Functional counterparts of the reference's SJOT2JS
(/root/reference/dev/sjot2js.js:41-688) and JS2SJOT
(/root/reference/dev/js2sjot.js:56-824): the semantic mappings —
sized ints → integer bounds, ranges → minimum/maximum with
exclusiveMinimum/Maximum, formats → pattern/format, ``(regex)`` →
pattern, arrays/sets → array schemas (sets add uniqueItems), tuples →
positional items + additionalItems:false, unions → anyOf (oneOf when
requested), objects → properties/required, ``@final`` →
additionalProperties:false, ``@dep`` → dependencies, ``@one/@any/@all``
→ oneOf/anyOf/allOf over required-combinations, defaults → default,
``#name`` refs → #/definitions/name — in idiomatic Python rather than a
line port. ``sjot_to_jsonschema`` takes the reference's draft ``version``
parameter (1/3/4, sjot2js.js:41-63); js2sjot accepts the v3/v4 features
listed in SURVEY.md §2.5.
"""

from __future__ import annotations

import re

from .ranges import compile_range
from .validator import FORMAT_PATTERNS, _INT_BOUNDS, _NUMERIC_TYPES, is_union

_FORMAT_NAMES = {"date": "date", "time": "time", "datetime": "date-time",
                 "uuid": "uuid", "duration": "duration"}


_DRAFT_URIS = {3: "http://json-schema.org/draft-03/schema#",
               4: "http://json-schema.org/draft-04/schema#"}


def sjot_to_jsonschema(schema: dict, version: int = 4) -> dict:
    """SJOT schema dict → JSON Schema.

    ``version`` mirrors the reference SJOT2JS's parameter
    (/root/reference/dev/sjot2js.js:41-63, 160-171): ``< 3`` (or
    non-numeric) emits the unversioned ``schema#`` URI with draft-3-style
    constructs, ``3`` the draft-03 URI, ``>= 4`` draft-04. Draft-3-style
    output uses per-property ``required: true`` and bare schema arrays for
    unions; propset (``@one/@any/@all``) combinators are draft-4-only,
    as in the reference (sjot2js.js:339-380).
    """
    from .validator import roottype

    v = version if isinstance(version, int) else 0
    defs = {}
    for name, t in schema.items():
        if not name.startswith("@"):
            defs[name] = _type_to_js(t, v)
    if v < 3:
        uri = "http://json-schema.org/schema#"
    else:
        uri = _DRAFT_URIS[min(v, 4)]
    out = {"$schema": uri}
    note = schema.get("@note")
    if note:
        out["title"] = note
    root = schema.get("@root")
    if root is None:
        root = roottype(schema)
    root_js = _type_to_js(root, v)
    if isinstance(root_js, dict):
        out.update(root_js)
    else:  # pre-draft-4 bare union array at the root
        out["type"] = root_js
    if defs:
        out["definitions"] = defs
    return out


def _type_to_js(t, v: int = 4) -> dict:
    if isinstance(t, dict):
        return _object_to_js(t, v)
    if isinstance(t, list):
        if is_union(t):
            branches = [_type_to_js(b, v) for b in t[0]]
            # pre-draft-4 unions are a bare schema array, as the reference
            # emits (sjot2js.js:115-118 returns the array itself)
            return {"anyOf": branches} if v >= 4 else branches
        return _array_to_js(t, v)
    if not isinstance(t, str):
        return {}
    return _string_type_to_js(t)


def _array_to_js(t: list, v: int = 4) -> dict:
    def num(x):
        return isinstance(x, (int, float)) and not isinstance(x, bool)

    out: dict = {"type": "array"}
    if len(t) == 0:
        return out
    if len(t) == 1:
        if num(t[0]):
            out["minItems"] = out["maxItems"] = int(t[0])
        else:
            out["items"] = _type_to_js(t[0], v)
        return out
    if num(t[1]):
        out["maxItems"] = int(t[1])
        if num(t[0]):
            out["minItems"] = int(t[0])
        else:
            out["items"] = _type_to_js(t[0], v)
        return out
    if num(t[0]):
        out["minItems"] = int(t[0])
        if len(t) > 2 and num(t[2]):
            out["maxItems"] = int(t[2])
        out["items"] = _type_to_js(t[1], v)
        return out
    # tuple
    out["items"] = [_type_to_js(x, v) for x in t]
    out["additionalItems"] = False
    out["minItems"] = out["maxItems"] = len(t)
    return out


def _object_to_js(t: dict, ver: int = 4) -> dict:
    out: dict = {"type": "object"}
    props: dict = {}
    required: list[str] = []
    pattern_props: dict = {}
    for prop, v in t.items():
        if prop.startswith("@"):
            continue
        if prop.startswith("("):
            pattern_props["^" + prop + "$"] = _type_to_js(v, ver)
            continue
        q = prop.find("?")
        if q == -1:
            js = _type_to_js(v, ver)
            props[prop] = js
            if ver >= 4:
                required.append(prop)
            elif isinstance(js, dict):
                # draft-3 style: required lives on the property schema
                # (sjot2js.js:261-266)
                js["required"] = True
        else:
            name = prop[:q]
            js = _type_to_js(v, ver)
            if q < len(prop) - 1 and isinstance(js, dict):
                from .validator import default_value

                js["default"] = default_value(prop[q + 1:], [t], None, v, t)
            props[name] = js
    if props:
        out["properties"] = props
    if pattern_props:
        out["patternProperties"] = pattern_props
    if required:
        out["required"] = required
    if t.get("@final"):
        out["additionalProperties"] = False
    dep = t.get("@dep")
    if dep:
        out["dependencies"] = {k: ([v] if isinstance(v, str) else list(v))
                               for k, v in dep.items()}
    if ver >= 4:
        # propset combinators are draft-4 constructs; the reference gates
        # them the same way (sjot2js.js:339-380)
        for key, combos in (("oneOf", t.get("@one")),
                            ("anyOf", t.get("@any"))):
            if combos:
                out.setdefault("allOf", []).extend(
                    {key: [{"required": [p]} for p in pset]}
                    for pset in combos)
        if t.get("@all"):
            for pset in t["@all"]:
                out.setdefault("allOf", []).append(
                    {"oneOf": [{"required": list(pset)},
                               {"not": {"anyOf": [{"required": [p]}
                                                  for p in pset]}}]})
    return out


def _string_type_to_js(t: str) -> dict:
    if "#" in t and not t.startswith("(") and not t.endswith("]") \
            and not t.endswith("}"):
        h = t.find("#")
        name = t[h + 1:]
        return {"$ref": f"#/definitions/{name}"} if name else {"$ref": "#"}
    if t.endswith("]"):
        if t.startswith("char") and t.find("]") == len(t) - 1:
            # char[n,m] is the reference's STRING-length type, not an
            # array (sjot2js.js:402-403) — found via a jsonschema-pkg
            # differential: the container branch below caught it first
            out = {"type": "string"}
            out.update(_bounds_to_js(t, 5, "minLength", "maxLength"))
            return out
        i = t.rfind("[")
        out = {"type": "array"}
        if t[:i]:
            out["items"] = _string_type_to_js(t[:i])
        out.update(_bounds_to_js(t, i + 1, "minItems", "maxItems"))
        return out
    if t.endswith("}"):
        i = t.rfind("{")
        out = {"type": "array", "uniqueItems": True}
        if t[:i]:
            out["items"] = _string_type_to_js(t[:i])
        out.update(_bounds_to_js(t, i + 1, "minItems", "maxItems"))
        return out
    if t == "any":
        return {}
    if t in ("boolean",):
        return {"type": "boolean"}
    if t == "true":
        return {"type": "boolean", "enum": [True]}
    if t == "false":
        return {"type": "boolean", "enum": [False]}
    if t == "null":
        return {"type": "null"}
    if t in ("object",):
        return {"type": "object"}
    if t in ("array",):
        return {"type": "array"}
    if t == "atom":
        return {"type": ["boolean", "number", "string"]}
    if t == "integer":
        return {"type": "integer"}
    if t in _INT_BOUNDS:
        lo, hi = _INT_BOUNDS[t]
        return {"type": "integer", "minimum": int(lo), "maximum": int(hi)}
    if t in ("number", "float", "double"):
        return {"type": "number"}
    if t == "string":
        return {"type": "string"}
    if t == "char":
        return {"type": "string", "minLength": 1, "maxLength": 1}
    if t.startswith("char["):
        out = {"type": "string"}
        out.update(_bounds_to_js(t, 5, "minLength", "maxLength"))
        return out
    if t in FORMAT_PATTERNS:
        # pattern only — no "format" key: the reference's JS2SJOT treats a
        # property carrying "format" as an empty object type (verified), so
        # pattern-only output maximizes interop; the pattern alone encodes
        # the exact SJOT semantics anyway
        return {"type": "string", "pattern": f"^({FORMAT_PATTERNS[t]})$"}
    if t.startswith("("):
        return {"type": "string", "pattern": f"^{t}$"}
    # numeric range / enum. Fractional-data semantics mirror the
    # validator's break-scan (ranges.py range_check): a float reaching
    # an alternative whose relevant endpoints carry no "." is rejected
    # outright AND aborts the scan — so an alternative admits fractional
    # data only when it AND every preceding alternative are
    # float-friendly. Integral-only alternatives get multipleOf: 1
    # (draft4 "integer" wrongly rejects integral FLOATS like 5.0, which
    # the reference accepts — JS has no int/float distinction).
    alts = compile_range(t)
    schemas = []
    import math

    prefix_float = True
    for a in alts:
        float_ok = (a.hi_dot if a.kind == 0 else
                    a.lo_dot and a.hi_dot if a.kind == 2 else
                    a.lo_dot)
        prefix_float = prefix_float and float_ok
        s: dict = {"type": "number"}
        if a.kind == 3:  # const
            s = {"type": "number", "enum": [a.lo if a.lo_dot else int(a.lo)]}
        else:
            if a.lo != -math.inf:
                s["minimum"] = a.lo if a.lo_dot else int(a.lo)
                if a.lo_excl:
                    s["exclusiveMinimum"] = True
            if a.hi != math.inf:
                s["maximum"] = a.hi if a.hi_dot else int(a.hi)
                if a.hi_excl:
                    s["exclusiveMaximum"] = True
        if not prefix_float:
            s["multipleOf"] = 1
        schemas.append(s)
    return schemas[0] if len(schemas) == 1 else {"anyOf": schemas}


def _bounds_to_js(t: str, start: int, lo_key: str, hi_key: str) -> dict:
    from .ranges import compile_bounds

    b = compile_bounds(t, start)
    if b is None:
        return {}
    import math

    out = {}
    if b[0] == "exact":
        if not math.isnan(b[1]):
            out[lo_key] = out[hi_key] = int(b[1])
    elif b[0] == "min":
        if not math.isnan(b[1]):
            out[lo_key] = int(b[1])
    elif b[0] == "max":
        if not math.isnan(b[1]):
            out[hi_key] = int(b[1])
    else:
        if not math.isnan(b[1]):
            out[lo_key] = int(b[1])
        if not math.isnan(b[2]):
            out[hi_key] = int(b[2])
    return out


# ---------------------------------------------------------------------------
# JSON Schema (v3/v4) → SJOT

def jsonschema_to_sjot(js: dict) -> dict:
    """JSON Schema → SJOT schema dict (js2sjot analogue)."""
    out = {"@root": _js_to_type(js)}
    for name, d in (js.get("definitions") or {}).items():
        out[name] = _js_to_type(d)
    return out


def _js_to_type(js):
    if not isinstance(js, dict) or not js:
        return "any"
    if "$ref" in js:
        ref = js["$ref"]
        m = re.match(r"^#/definitions/(.+)$", ref)
        if m:
            return f"#{m.group(1)}"
        return "#" if ref == "#" else "any"
    if "enum" in js and js["enum"]:
        vals = js["enum"]
        if all(isinstance(v, (int, float)) and not isinstance(v, bool)
               for v in vals):
            return ",".join(str(v) for v in vals)
        if vals == [True]:
            return "true"
        if vals == [False]:
            return "false"
        if all(isinstance(v, str) for v in vals):
            return "(" + "|".join(re.escape(v) for v in vals) + ")"
    for key in ("anyOf", "oneOf"):
        if key in js:
            branches = [_js_to_type(b) for b in js[key]]
            return [branches] if len(branches) > 1 else branches[0]
    t = js.get("type")
    if isinstance(t, list):
        return [[_js_to_type({**js, "type": x}) for x in t]] \
            if len(t) > 1 else _js_to_type({**js, "type": t[0]})
    if t == "null":
        return "null"
    if t == "boolean":
        return "boolean"
    if t in ("integer", "number"):
        lo, hi = js.get("minimum"), js.get("maximum")
        if lo is None and hi is None:
            return "integer" if t == "integer" else "number"
        is_int = t == "integer"

        def fmt(x):
            return str(int(x)) if is_int and float(x) == int(x) \
                else f"{float(x)}"
        lo_s = fmt(lo) if lo is not None else ""
        hi_s = fmt(hi) if hi is not None else ""
        pre = "<" if js.get("exclusiveMinimum") else ""
        post = ">" if js.get("exclusiveMaximum") else ""
        if lo is None:
            return f"..{hi_s}{post}"
        if hi is None:
            return f"{pre}{lo_s}.."
        return f"{pre}{lo_s}..{hi_s}{post}"
    if t == "string":
        if "pattern" in js:
            p = js["pattern"]
            p = p[1:] if p.startswith("^") else p
            p = p[:-1] if p.endswith("$") else p
            if not (p.startswith("(") and p.endswith(")")):
                p = f"({p})"
            return p
        fmt = js.get("format")
        for sjot_name, js_name in _FORMAT_NAMES.items():
            if fmt == js_name:
                return sjot_name
        lo, hi = js.get("minLength"), js.get("maxLength")
        if lo == 1 and hi == 1:
            return "char"
        if lo is not None or hi is not None:
            return f"char[{'' if lo is None else lo},{'' if hi is None else hi}]"
        return "string"
    if t == "array":
        items = js.get("items")
        lo, hi = js.get("minItems"), js.get("maxItems")
        if isinstance(items, list):
            return [_js_to_type(x) for x in items]
        item_t = _js_to_type(items) if items else "any"
        if js.get("uniqueItems"):
            suffix = _bounds_suffix(lo, hi, "{", "}")
            return f"{item_t}{suffix}" if isinstance(item_t, str) \
                else [item_t]
        if isinstance(item_t, str) and not isinstance(items, list):
            return f"{item_t}{_bounds_suffix(lo, hi, '[', ']')}"
        if lo is not None and hi is not None:
            return [int(lo), item_t, int(hi)]
        if lo is not None:
            return [int(lo), item_t]
        if hi is not None:
            return [item_t, int(hi)]
        return [item_t]
    if t == "object" or "properties" in js:
        required = set(js.get("required") or [])
        out: dict = {}
        if js.get("additionalProperties") is False:
            out["@final"] = True
        for prop, d in (js.get("properties") or {}).items():
            name = prop if prop in required else prop + "?"
            if prop not in required and isinstance(d, dict) and "default" in d:
                dv = d["default"]
                name += "null" if dv is None else \
                    ("true" if dv is True else
                     "false" if dv is False else str(dv))
            out[name] = _js_to_type(d)
        for pat, d in (js.get("patternProperties") or {}).items():
            p = pat[1:] if pat.startswith("^") else pat
            p = p[:-1] if p.endswith("$") else p
            if not (p.startswith("(") and p.endswith(")")):
                p = f"({p})"
            out[p] = _js_to_type(d)
        deps = js.get("dependencies")
        if deps:
            out["@dep"] = {k: (v if isinstance(v, list) else [v])
                           for k, v in deps.items()
                           if not isinstance(v, dict)}
        return out
    return "any"


def _bounds_suffix(lo, hi, opener, closer) -> str:
    if lo is None and hi is None:
        return opener + closer
    if lo is not None and hi is not None:
        if lo == hi and opener == "[":
            return f"[{int(lo)}]"
        return f"{opener}{int(lo)},{int(hi)}{closer}"
    if lo is not None:
        return f"{opener}{int(lo)},{closer}"
    return f"{opener},{int(hi)}{closer}"
