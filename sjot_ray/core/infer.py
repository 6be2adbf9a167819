"""Schema inference from example documents (snapSJOT analogue).

Reimplements the reference's inference semantics
(/root/reference/dev/snapsjot.js:22-402): objects snap to ``@final`` types,
optionality appears when a property is absent in some examples
(``prop?``), arrays unify their element types into unions, special
property names are regex-escaped, and object types unify field-wise unless
they are fully distinct (then they become union branches).

The distributed twist (pipelines.infer): ``snap`` each document per batch,
then pairwise ``unify`` — a commutative-enough merge run as per-batch
partials + a driver-side fold, i.e. schema inference as an aggregation,
where the reference only ever sees one document at a time.
"""

from __future__ import annotations

import re


def snap(data):
    """One JSON value → inferred SJOT type (snapsjot_convert)."""
    if data is None:
        return "null"
    if isinstance(data, bool):
        return "boolean"
    if isinstance(data, (int, float)):
        return "number"
    if isinstance(data, str):
        return "string"
    if isinstance(data, list):
        union: list = []
        for i, item in enumerate(data):
            if i == 0:
                union = [snap(item)]
            else:
                unify_unions(union, [snap(item)])
        if len(union) <= 1:
            return union
        return [[union]]
    # object
    t = {"@final": True}
    for prop, v in data.items():
        if prop == "@sjot":
            t[prop] = [[{}, [{}]]]
        elif ("?" in prop or prop.startswith("(")
              or prop in ("@root", "@one", "@any", "@all", "@dep",
                          "@final", "@extends", "@note")):
            t[_escape_prop(prop)] = snap(v)
        else:
            t[prop] = snap(v)
    return t


def _escape_prop(prop: str) -> str:
    out = prop
    for a, b in (("\\", "\\\\"), (".", "\\."), ("(", "\\("), (")", "\\)"),
                 ("[", "\\("), ("]", "\\)"), ("{", "\\("), ("}", "\\)"),
                 ("+", "\\+"), ("*", "\\+"), ("?", "\\?"), ("^", "\\^"),
                 ("$", "\\$")):
        out = out.replace(a, b)
    return f"({out})"


class _UndefType:
    """JS ``undefined`` — produced by ``type[0]`` on an EMPTY array in
    the reference's array unification. Distinct from the ``null``
    tombstone (JS ``undefined !== null``), so undefined branches are
    REAL union branches that survive the merge; they serialize to
    literal ``null`` in the final schema (JSON.stringify of undefined
    inside an array), handled at the convert()/infer_many() boundary."""

    def __repr__(self):
        return "<js-undefined>"


_UNDEF = _UndefType()


def _undef_to_null(t):
    """API boundary: JS undefined branches stringify to null."""
    if t is _UNDEF:
        return None
    if isinstance(t, list):
        return [_undef_to_null(x) for x in t]
    if isinstance(t, dict):
        return {k: _undef_to_null(v) for k, v in t.items()}
    return t


def _is_union(t) -> bool:
    return isinstance(t, list) and len(t) == 1 and isinstance(t[0], list)


def _as_obj(t):
    """JS ``typeof [] === "object"``: an ARRAY type flowing into the
    reference's object-merge paths is enumerated by its string INDICES
    ("0", "1", …) — snapsjot.js relies on this (for-in over arrays), so
    list×dict merges produce index-keyed props ({"0?": "string"})."""
    if isinstance(t, list):
        return {str(i): v for i, v in enumerate(t)}
    return t


def equal_types(t1, t2) -> bool:
    if t1 is t2 or t1 == t2 and isinstance(t1, str) and isinstance(t2, str):
        return True
    if isinstance(t1, str) or isinstance(t2, str):
        return False
    if _is_union(t1):
        if _is_union(t2):
            if len(t1[0]) != len(t2[0]):
                return False
            n = sum(1 for a in t1[0] for b in t2[0] if equal_types(a, b))
            return n == len(t1[0])
        return False
    if _is_union(t2):
        return False
    if isinstance(t1, list) and isinstance(t2, list):
        if len(t1) == len(t2):
            return len(t1) == 0 or equal_types(t1[0], t2[0])
        return False
    if isinstance(t1, (dict, list)) and isinstance(t2, (dict, list)):
        # the reference's JS-exact object branch (snapsjot.js:152-161):
        # true iff every t1 prop exists in t2 AND no t2 prop exists in
        # t1 — i.e. t1 has NO enumerable props and t2's are absent from
        # it. With arrays enumerated by index this makes [] "equal" to
        # any dict (and snapped dicts, which always carry @final, never
        # equal each other).
        o1, o2 = _as_obj(t1), _as_obj(t2)
        for p in o1:
            if p not in o2:
                return False
        for p in o2:
            if p in o1:
                return False
        return True
    return False


def unify(t1, t2):
    """snapsjot_unify_types (t2 may be consumed)."""
    if equal_types(t1, t2):
        return t1
    if _is_union(t1):
        if _is_union(t2):
            return [unify_unions(t1[0], t2[0])]
        return [unify_unions(t1[0], [t2])]
    if _is_union(t2):
        return [unify_unions([t1], t2[0])]
    if isinstance(t1, list):
        if isinstance(t2, list):
            # JS-exact (snapsjot.js:186-201): unify the [0] items —
            # an EMPTY array contributes JS undefined (the _UNDEF
            # sentinel: a REAL branch, unlike the null tombstone;
            # serialized to literal null at the API boundary) — and
            # return the result BARE when it is not a union: the
            # reference does NOT rewrap, so array-of-X × array-of-Y can
            # collapse to the unified item type (e.g. two object item
            # types merge to one bare object)
            u = unify(t1[0] if t1 else _UNDEF, t2[0] if t2 else _UNDEF)
            if _is_union(u):
                return [[[b] for b in u[0]]]
            return u
        return [[t1, t2]]
    if isinstance(t1, dict) and isinstance(t2, (dict, list)):
        # JS typeof-object branch: a dict merged with an ARRAY treats
        # the array as an index-keyed object (snapsjot.js:206-209);
        # unify_objects enumerates it by index but the DISTINCT path
        # preserves the original array in the union
        return unify_objects(t1, t2)
    return [[t1, t2]]


def unify_unions(u1: list, u2: list) -> list:
    """snapsjot_unify_union_types (mutates u1; returns it). JS-exact
    looping: ``union1.length`` is re-evaluated every iteration, so
    branches APPENDED mid-pass are visited in the same pass (a Python
    range() snapshot misses them and leaves duplicate branches)."""
    redo = True
    while redo:
        redo = False
        i = 0
        while not redo and i < len(u1):
            j = 0
            while not redo and j < len(u2):
                if u2[j] is None:
                    j += 1
                    continue
                t = None
                if equal_types(u1[i], u2[j]):
                    u2[j] = None
                elif (isinstance(u1[i], list) and len(u1[i]) > 0
                      and isinstance(u2[j], list) and len(u2[j]) == 0):
                    u2[j] = None
                elif (isinstance(u1[i], list) and len(u1[i]) == 0
                      and isinstance(u2[j], list) and len(u2[j]) > 0):
                    u1[i] = u2[j]
                    u2[j] = None
                elif (isinstance(u1[i], list) and len(u1[i]) > 0
                      and isinstance(u2[j], list) and len(u2[j]) > 0):
                    t = unify(u1[i], u2[j])
                    u2[j] = None
                elif isinstance(u1[i], (dict, list)) \
                        and isinstance(u2[j], (dict, list)):
                    # JS typeof-object branch: dict×dict, dict×array and
                    # array×dict (array×array pairs are consumed by the
                    # branches above); arrays merge by string index
                    merged = unify_objects(u1[i], u2[j])
                    if not isinstance(merged, list):
                        # cascade object unifications: drop u1[i], retry
                        del u1[i]
                        u2[j] = merged
                        redo = True
                    t = None
                if t is not None:
                    if _is_union(t):
                        u1[i] = t[0][0]
                        u1.extend(t[0][1:])
                    else:
                        u1[i] = t
                j += 1
            i += 1
    for j in range(len(u2)):
        if u2[j] is not None:
            u1.append(u2[j])
    # JS copies union1 back into union2 (snapsjot.js:292-297) — the
    # union LISTS are aliased across nested structures (u1[i] = u2[j]
    # assignments share references), so this write-through is visible
    # to other holders and part of the observable semantics
    u2[:] = u1
    return u1


def unify_objects(t1, t2):
    """snapsjot_unify_object_types (t2 consumed). Arrays are enumerated
    as index-keyed objects (JS for-in), but the DISTINCT path returns
    the ORIGINALS — the reference never converts, it only
    enumerates."""
    if distinct_objects(t1, t2):
        return [[t1, t2]]
    out = {"@final": True}
    t1 = _as_obj(t1)
    t2 = dict(_as_obj(t2))
    for prop, v in t1.items():
        if prop.startswith("@"):
            continue
        if prop in t2:
            out[prop] = unify(v, t2[prop])
            t2[prop] = None
        elif prop.endswith("?"):
            stem = prop[:-1]
            if stem in t2:
                out[prop] = unify(v, t2[stem])
                t2[stem] = None
            else:
                out[prop] = v
        else:
            opt = prop + "?"
            if opt in t2:
                out[opt] = unify(v, t2[opt])
                t2[opt] = None
            else:
                out[opt] = v
    for prop, v in t2.items():
        if v is None or prop.startswith("@"):
            continue
        if prop.endswith("?"):
            out[prop] = v
        else:
            out[prop + "?"] = v
    return out


def distinct_objects(t1, t2) -> bool:
    t1, t2 = _as_obj(t1), _as_obj(t2)
    n = 0
    for prop in t1:
        if prop.startswith("@"):
            continue
        stem = prop[:-1] if prop.endswith("?") else prop
        if stem in t2 or stem + "?" in t2:
            return False
        n += 1
    if n > 0:
        for prop in t2:
            if not prop.startswith("@"):
                return True
    return False


def convert(data) -> dict:
    """snapSJOT.convert: one example document → a full SJOT schema."""
    return {
        "@note": "SJOT schema created from JSON data by snapSJOT",
        "@root": _undef_to_null(snap(data)),
    }


def infer_many(docs) -> dict:
    """Infer one schema from many example documents: snap each, fold with
    union unification (the distributed aggregation form)."""
    root = None
    for doc in docs:
        t = snap(doc)
        if root is None:
            root = t
        else:
            u = unify(root, t)
            root = u[0][0] if _is_union(u) and len(u[0]) == 1 else u
    return {"@note": "SJOT schema inferred from examples",
            "@root": _undef_to_null(root)}


def merge_inferred(a, b):
    """Merge two inferred root types (partial-aggregate combiner)."""
    u = unify(a, b)
    return u
