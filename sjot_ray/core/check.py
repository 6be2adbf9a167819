"""SJOT schema admission: structural lint + constraint satisfiability.

Mirrors the reference's ``sjot_check`` (index.js:1273-1713) and
``sjot_check_satisfiable`` (index.js:2056-2111). Runs entirely on the
driver before any cluster work — a bad schema aborts the job before the
first block is read.
"""

from __future__ import annotations

import itertools
import json
import re

from .errors import SJOTSchemaError
from .ranges import range_grammar_errors
from .validator import (
    _NUMERIC_TYPES,
    _STRINGY_TYPES,
    build_union_dispatch,
    extend_type,
    is_union,
    reftype,
    roottype,
)

_PRIMS = (
    _NUMERIC_TYPES
    | _STRINGY_TYPES
    | frozenset(["atom", "boolean", "true", "false", "null"])
)


def _is_num(x) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


def check(schema) -> bool:
    """Check a schema (dict / list of dicts / JSON string); raises
    SJOTSchemaError on the first problem, returns True (SJOT.check,
    index.js:80-102)."""
    sjots = schema
    if isinstance(schema, str):
        sjots = json.loads(schema)
    if isinstance(sjots, list):
        for i, s in enumerate(sjots):
            check_type(sjots, True, False, s, s, f"[{i}]")
    else:
        check_type([sjots], True, False, sjots, sjots, "")
    return True


def check_type(sjots, root, prim, type_, sjot, typepath):
    """Recursive schema lint (mirrors index.js:1273-1713).

    ``root`` is True only for the schema object itself; ``prim`` requires
    the type to be primitive (set members, optional-with-default props).
    """
    if type_ is None:
        # JS typeof null === "object": lands in the object branch and is
        # rejected before the root/prim checks (index.js:1279-1280)
        raise SJOTSchemaError("is not a valid type", f"{typepath}/null")

    if isinstance(type_, dict) or isinstance(type_, list):
        if root:
            roottype(sjot)
        if prim:
            raise SJOTSchemaError("is not a primitive type", typepath)

        if isinstance(type_, list):
            _check_array_type(sjots, prim, type_, sjot, typepath)
        else:
            _check_object_type(sjots, root, type_, sjot, typepath)
        return

    if isinstance(type_, str):
        if root:
            raise SJOTSchemaError(
                "is not a SJOT schema object", f"{typepath}/str")
        _check_string_type(sjots, prim, type_, sjot, typepath)
        return

    if root:
        raise SJOTSchemaError(
            "is not a SJOT schema object",
            f"{typepath}/{type(type_).__name__}")
    raise SJOTSchemaError("is not a valid type", f"{typepath}/{type_}")


def _check_array_type(sjots, prim, type_, sjot, typepath):
    if is_union(type_):
        union = {}
        for i, branch in enumerate(type_[0]):
            if isinstance(branch, dict) and "@if" in branch and "@then" in branch:
                check_type(sjots, False, prim, branch["@then"], sjot,
                           f"{typepath}[[{i}]]")
            else:
                check_type(sjots, False, prim, branch, sjot,
                           f"{typepath}[[{i}]]")
            build_union_dispatch(sjots, branch, branch, sjot,
                                 f"{typepath}[[{i}]]", union, 1)
    elif len(type_) == 0:
        pass
    elif len(type_) == 1:
        if _is_num(type_[0]):
            if type_[0] < 0:
                raise SJOTSchemaError("array size is negative", typepath + "[]")
        else:
            check_type(sjots, False, False, type_[0], sjot, typepath)
    elif _is_num(type_[1]):
        if type_[1] < 0:
            raise SJOTSchemaError("array size is negative", typepath + "[]")
        if _is_num(type_[0]):
            if type_[0] < 0:
                raise SJOTSchemaError("array size is negative", typepath + "[]")
        else:
            check_type(sjots, False, False, type_[0], sjot, typepath)
    elif _is_num(type_[0]):
        if type_[0] < 0:
            raise SJOTSchemaError("array size is negative", typepath + "[]")
        if len(type_) > 2 and _is_num(type_[2]) and type_[2] < type_[0]:
            raise SJOTSchemaError("array size is negative", typepath + "[]")
        check_type(sjots, False, False, type_[1], sjot, typepath)
    else:
        for i, t in enumerate(type_):
            check_type(sjots, False, False, t, sjot, f"{typepath}[{i}]")


def _check_object_type(sjots, root, type_, sjot, typepath):
    extend_type(sjots, type_, sjot, typepath)

    for prop in list(type_.keys()):
        val = type_[prop]
        if prop == "@root":
            if not root:
                raise SJOTSchemaError(
                    "@root is used in an object (redefine as a regex)", typepath)
            check_type(sjots, False, False, val, sjot, typepath + "/@root")
        elif prop == "@id":
            if not root:
                raise SJOTSchemaError(
                    "@id is used in an object (redefine as a regex)", typepath)
            if not isinstance(val, str):
                raise SJOTSchemaError("@id value is not a string", typepath)
        elif prop == "@note":
            if not isinstance(val, str):
                raise SJOTSchemaError("@note value is not a string", typepath)
        elif prop == "@extends":
            pass  # expanded (value now None)
        elif prop == "@final":
            if not isinstance(val, bool):
                raise SJOTSchemaError("@final value is not true or false", typepath)
        elif prop in ("@one", "@any", "@all", "@dep"):
            _check_propsets(type_, prop, val, typepath)
        elif prop.startswith("("):
            from .validator import js_regex_to_py

            try:
                re.compile(js_regex_to_py(prop))
            except re.error as e:
                raise SJOTSchemaError(str(e), f"{typepath}/{prop}") from None
        elif root and (prop.endswith("]") or prop.endswith("}")):
            raise SJOTSchemaError(
                "name ends with a ] or a } (use a regex for this property"
                " name instead)", f"{typepath}/{prop}")
        else:
            q = prop.find("?")
            check_type(sjots, False, q != -1 and q < len(prop) - 1,
                       val, sjot, f"{typepath}/{prop}")

    if not check_satisfiable(
            type_.get("@one", []), type_.get("@any", []),
            type_.get("@all", []), type_.get("@dep", {})):
        raise SJOTSchemaError(
            "has non-satisfiable constraints and rejects all data", typepath)


def _check_propsets(type_, prop, propsets, typepath):
    """Propset well-formedness: disjointness within the @-kind, and each
    named property must be an optional non-default property of the object
    (index.js:1399-1473)."""
    seen: dict[str, bool] = {}
    if prop != "@dep":
        if not isinstance(propsets, list):
            raise SJOTSchemaError(
                "is not an array of property sets", f"{typepath}/{prop}")
        for pset in propsets:
            if not isinstance(pset, list):
                raise SJOTSchemaError(
                    "is not an array of property sets", f"{typepath}/{prop}")
            for p in pset:
                if not isinstance(p, str) or p.startswith("@") or p.startswith("("):
                    raise SJOTSchemaError(
                        "is not an array of property sets", f"{typepath}/{prop}")
                if p in seen:
                    raise SJOTSchemaError(
                        "property sets are not disjoint", f"{typepath}/{prop}")
                seen[p] = False
    else:
        if not isinstance(propsets, dict):
            raise SJOTSchemaError(
                "malformed @dep dependencies", f"{typepath}/{prop}")
        for name, deps in propsets.items():
            seen[name] = False
            if isinstance(deps, str):
                seen[deps] = False
            elif isinstance(deps, list) and all(isinstance(d, str) for d in deps):
                for d in deps:
                    seen[d] = False
            else:
                raise SJOTSchemaError(
                    "malformed @dep dependencies", f"{typepath}/{prop}")

    for name in type_:
        if name.startswith("@"):
            continue
        if name.startswith("("):
            from .errors import SJOTSchemaError as _SE
            from .validator import compile_regex_type

            try:
                matcher = compile_regex_type(name)
            except _SE:
                continue
            for cand in seen:
                if matcher.fullmatch(cand):
                    seen[cand] = True
        elif name.endswith("?"):
            stem = name[:-1]
            if stem in seen:
                seen[stem] = True

    for name, ok in seen.items():
        if not ok:
            raise SJOTSchemaError(
                f"property set contains property {name} that is not an"
                " optional non-default property of this object",
                f"{typepath}/{prop}")


def _check_string_type(sjots, prim, type_, sjot, typepath):
    if ("#" in type_ and not type_.startswith("(")
            and not type_.endswith("]") and not type_.endswith("}")):
        rt = reftype(sjots, type_, sjot, typepath)
        if prim:
            check_type(sjots, False, True, rt, sjot, f"{typepath}/{type_}")
        return
    if type_.endswith("]"):
        i = type_.rfind("[")
        if i == -1:
            raise SJOTSchemaError("missing [", f"{typepath}/{type_}")
        primtype = type_[:i]
        if prim and primtype != "char":
            raise SJOTSchemaError(
                "is not a primitive type", f"{typepath}/{type_}")
        check_type(sjots, False, False, primtype, sjot, typepath)
        return
    if type_.endswith("}"):
        if prim:
            raise SJOTSchemaError(
                "is not a primitive type", f"{typepath}/{type_}")
        i = type_.rfind("{")
        if i == -1:
            raise SJOTSchemaError("missing {", f"{typepath}/{type_}")
        check_type(sjots, False, True, type_[:i], sjot, typepath)
        return

    from .validator import FORMAT_PATTERNS

    if type_ in _PRIMS or type_ in FORMAT_PATTERNS:
        return  # builtins + user-registered formats (register_format)
    if type_ in ("any", "object", "array"):
        if prim:
            raise SJOTSchemaError(
                "is not a primitive type", f"{typepath}/{type_}")
        return
    if type_.startswith("("):
        from .validator import js_regex_to_py

        try:
            re.compile(js_regex_to_py(type_))
        except re.error as e:
            raise SJOTSchemaError(str(e), f"{typepath}/{type_}") from None
        return
    err = range_grammar_errors(type_)
    if err is not None:
        raise SJOTSchemaError(err, f"{typepath}/{type_}")


def check_satisfiable(one, any_, all_, dep) -> bool:
    """Exhaustive 2^n model check over the distinct props named by
    ``@one/@any/@all/@dep`` (index.js:2056-2111). n<2 or n>20 → assumed
    satisfiable, matching the reference's cut-off."""
    names: dict[str, int] = {}
    for group in (one, any_, all_):
        for pset in group:
            for p in pset:
                names.setdefault(p, len(names))
    for p, deps in dep.items():
        names.setdefault(p, len(names))
        if isinstance(deps, str):
            names.setdefault(deps, len(names))
        else:
            for d in deps:
                names.setdefault(d, len(names))

    n = len(names)
    if n < 2 or n > 20:
        return True

    keys = list(names)
    for assignment in itertools.product((False, True), repeat=n):
        bits = dict(zip(keys, assignment))
        if any(sum(bits[p] for p in pset) != 1 for pset in one):
            continue
        if any(not any(bits[p] for p in pset) for pset in any_):
            continue
        if any(any(bits[p] for p in pset) and not all(bits[p] for p in pset)
               for pset in all_):
            continue
        ok = True
        for p, deps in dep.items():
            # NB: the reference SAT check (index.js:2100-2104) requires the
            # dependency targets to hold in every candidate assignment — it
            # does NOT guard on bits[p] the way the runtime @dep check does.
            # Mirrored as-is for parity.
            str_ok = isinstance(deps, str) and bits[deps]
            arr_ok = isinstance(deps, list) and all(bits[d] for d in deps)
            if not str_ok and not arr_ok:
                ok = False
                break
        if ok:
            return True
    return False
