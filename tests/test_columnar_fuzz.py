"""Randomized differential: generate random SJOT schemas over the
columnar surface (scalars, lists, sets, tuples, nested structs, maps with
regex props) plus matching Arrow tables of mixed valid/invalid/null
values, and require the vectorized TableValidator to agree with the row
engine (itself reference-verified) on verdict AND first-violation fields
for every row."""

from __future__ import annotations

import copy

import numpy as np
import pyarrow as pa
import pytest

from sjot_ray.columnar.table_validator import (ColumnarCompileError,
                                               TableValidator)
from sjot_ray.core import SJOTValidationError, validate

SCALARS = [
    ("int", pa.int64(),
     lambda r: int(r.integers(-10, 10)) if r.random() < 0.8 else None),
    ("0..100", pa.int64(),
     lambda r: int(r.integers(-20, 130)) if r.random() < 0.85 else None),
    ("(a|bb|ccc)", pa.string(),
     lambda r: r.choice(["a", "bb", "ccc", "x", "aa", ""])
     if r.random() < 0.85 else None),
    ("string", pa.string(),
     lambda r: r.choice(["s", "", "zzz"]) if r.random() < 0.9 else None),
    ("boolean", pa.bool_(),
     lambda r: bool(r.random() < 0.5) if r.random() < 0.9 else None),
    ("char[2,4]", pa.string(),
     lambda r: "x" * int(r.integers(0, 6)) if r.random() < 0.85 else None),
    ("1.5..3.5", pa.float64(),
     lambda r: float(np.round(r.uniform(0, 5), 2))
     if r.random() < 0.85 else None),
    ("true", pa.bool_(),
     lambda r: bool(r.random() < 0.7) if r.random() < 0.9 else None),
]


def gen_type(rng, depth=0):
    """→ (sjot_type, arrow_type, sampler)."""
    kinds = ["scalar", "list", "set", "tuple", "union"]
    if depth < 2:
        kinds += ["struct", "struct"]
    if depth == 0:
        kinds += ["map", "objlist"]
    kind = rng.choice(kinds)
    if kind == "union":
        # distinct kind-classes per depth (the reference rejects
        # ambiguous unions); the Arrow column carries ONE branch's type
        # — dispatch must accept/reject by value. Half the configs mix
        # in depth-2 container branches (list/set, with bounds) and may
        # carry a LIST column.
        pool = [("0..100", pa.int64(), SCALARS[1][2]),
                ("(a|bb|ccc)", pa.string(), SCALARS[2][2]),
                ("boolean", pa.bool_(), SCALARS[4][2])]
        k = int(rng.integers(2, 4))
        picks = [pool[i] for i in rng.permutation(3)[:k]]
        branches = [p[0] for p in picks]
        carrier = picks[int(rng.integers(0, k))]
        if rng.random() < 0.3:
            # depth-1 OBJECT branch (scalar props), dispatched by prop
            # name; carrier is a struct (sometimes) or a scalar
            obj = {"oa": "0..100", "ob?": "(a|bb|ccc)"}
            branches.append(dict(obj))
            if rng.random() < 0.6:
                fields = [("oa", pa.int64()), ("ob", pa.string()),
                          ("oz", pa.int64())]

                def osam(r):
                    if r.random() < 0.15:
                        return None
                    return {"oa": SCALARS[1][2](r),
                            "ob": SCALARS[2][2](r),
                            "oz": int(r.integers(0, 3))
                            if r.random() < 0.3 else None}
                return [list(branches)], pa.struct(fields), osam
            return [list(branches)], carrier[1], carrier[2]
        if rng.random() < 0.5:
            # add 1-2 container branches of distinct item kinds
            cpool = [("0..100", pa.int64(), SCALARS[1][2]),
                     ("(a|bb|ccc)", pa.string(), SCALARS[2][2])]
            ci = rng.permutation(2)[:int(rng.integers(1, 3))]
            cont = []
            for i in ci:
                base, at, sam = cpool[i]
                suffix = rng.choice(["[]", "[1,3]", "{2,4}", "{}"])
                cont.append((f"{base}{suffix}", at, sam))
            branches += [c[0] for c in cont]
            if rng.random() < 0.7:
                base, at, sam = cont[int(rng.integers(0, len(cont)))]

                def lsam(r, sam=sam):
                    if r.random() < 0.1:
                        return None
                    return [sam(r) for _ in range(int(r.integers(0, 5)))]
                return [list(branches)], pa.list_(at), lsam
        return [list(branches)], carrier[1], carrier[2]
    if kind == "objlist":
        # list<struct> items: scalar props, optional nested-object prop,
        # optional regex prop, @final
        n_props = int(rng.integers(1, 3))
        props, fields, samplers = {}, [], {}
        for i in range(n_props):
            roll = rng.random()
            if roll < 0.2:
                st, at, sam = gen_type(rng, depth=1)
                while not isinstance(st, dict):  # re-roll until object
                    st, at, sam = gen_type(rng, depth=1)
            elif roll < 0.35:
                st, at, sam = gen_type(rng, depth=1)
                while not (isinstance(st, list) and len(st) == 1
                           and isinstance(st[0], list)):  # union
                    st, at, sam = gen_type(rng, depth=1)
            else:
                st, at, sam = SCALARS[rng.integers(0, len(SCALARS))]
            opt = "?" if rng.random() < 0.5 else ""
            props[f"f{i}{opt}"] = st
            fields.append((f"f{i}", at))
            samplers[f"f{i}"] = sam
        if rng.random() < 0.5:
            rst, rat, rsam = SCALARS[1]  # 0..100 over int fields
            props["(m[0-9])"] = rst
            for j in range(int(rng.integers(1, 3))):
                fname = f"m{j}" if rng.random() < 0.8 else f"mx{j}"
                if any(f[0] == fname for f in fields):
                    continue
                fields.append((fname, rat))
                samplers[fname] = rsam
        if rng.random() < 0.4:
            props["@final"] = True

        def sampler(r, samplers=samplers):
            if r.random() < 0.15:
                return None
            out = []
            for _ in range(int(r.integers(0, 4))):
                out.append(None if r.random() < 0.1
                           else {k: s(r) for k, s in samplers.items()})
            return out
        return [props], pa.list_(pa.struct(fields)), sampler
    if kind == "scalar":
        st, at, sam = SCALARS[rng.integers(0, len(SCALARS))]
        return st, at, sam

    if kind in ("list", "set"):
        st, at, sam = SCALARS[rng.integers(0, len(SCALARS))]
        bounds = rng.choice(["", "1,3", "2,"])
        sjot = f"{st}{'{' if kind == 'set' else '['}{bounds}" \
            f"{'}' if kind == 'set' else ']'}"

        def sampler(r, sam=sam):
            if r.random() < 0.1:
                return None
            return [sam(r) for _ in range(int(r.integers(0, 5)))]
        if depth == 0 and rng.random() < 0.18 and st != "char[2,4]":
            # doubly-nested container: T[a,b][c,d]
            obounds = rng.choice(["", "1,3", "2,"])
            okind = rng.choice(["[", "{"])
            sjot2 = f"{sjot}{okind}{obounds}{']' if okind == '[' else '}'}"

            def sampler2(r, inner=sampler):
                if r.random() < 0.1:
                    return None
                return [inner(r) for _ in range(int(r.integers(0, 4)))]
            return sjot2, pa.list_(pa.list_(at)), sampler2
        return sjot, pa.list_(at), sampler

    if kind == "tuple":
        picks = [SCALARS[rng.integers(0, len(SCALARS))] for _ in range(2)]
        # tuple slots share one Arrow column type → use string slots
        # (incl. the char[2,4] length type)
        picks = [p for p in picks if p[1] == pa.string()]
        while len(picks) < 2:
            picks.append(SCALARS[5] if rng.random() < 0.4 else SCALARS[2])
        sjot = [p[0] for p in picks]

        def sampler(r, picks=picks):
            if r.random() < 0.1:
                return None
            n = int(r.integers(1, 4)) if r.random() < 0.3 else len(picks)
            return [picks[min(i, len(picks) - 1)][2](r) for i in range(n)]
        return sjot, pa.list_(pa.string()), sampler

    if kind == "struct":
        n_props = int(rng.integers(1, 4))
        props = {}
        fields, samplers = [], {}
        for i in range(n_props):
            st, at, sam = gen_type(rng, depth + 1)
            opt = "?" if rng.random() < 0.5 else ""
            # sometimes a default token — including ones that FAIL the
            # type (the reference injects then validates the default)
            if opt and isinstance(st, str) and st == "0..100" \
                    and rng.random() < 0.5:
                opt += str(rng.choice([7, 250]))
            name = f"p{i}"
            props[f"{name}{opt}"] = st
            fields.append((name, at))
            samplers[name] = sam
        if rng.random() < 0.35:
            # regex property name over the struct's physical fields
            # (scalar value type) — r2 VERDICT #5 coverage; some field
            # names match the pattern, some don't (those are @final
            # extras when present)
            rst, rat, rsam = SCALARS[2]
            props["(x[0-9])"] = rst
            for j in range(int(rng.integers(1, 3))):
                fname = f"x{j}" if rng.random() < 0.8 else f"xz{j}"
                if any(f[0] == fname for f in fields):
                    continue
                fields.append((fname, rat))
                samplers[fname] = rsam
        if rng.random() < 0.3:
            props["@final"] = True
        opt_names = [k.split("?")[0] for k in props
                     if not k.startswith("@") and "?" in k]
        if len(opt_names) >= 2 and rng.random() < 0.4:
            kind_p = rng.choice(["@one", "@any", "@all", "@dep"])
            if kind_p == "@dep":
                props["@dep"] = {opt_names[0]: [opt_names[1]]}
            else:
                props[kind_p] = [opt_names[:2]]

        def sampler(r, samplers=samplers):
            if r.random() < 0.15:
                return None
            return {k: s(r) for k, s in samplers.items()}
        return props, pa.struct(fields), sampler

    # map with regex props
    st, at, sam = SCALARS[2]  # string enum values
    props = {"(k[0-9])": st}
    roll_map = rng.random()
    if roll_map < 0.15:
        # char-length values (fixed or regex prop) over string entries
        st2, at2, sam2 = SCALARS[5]  # char[2,4] sampler (strings 0-5)
        if rng.random() < 0.5:
            props = {"(k[0-9])": "char[2,4]"}
        else:
            props[f"fixed{'?' if rng.random() < 0.5 else ''}"] = "char[2,4]"
        if rng.random() < 0.3:
            props["@final"] = True

        def sampler(r, sam=sam2):
            out = []
            if r.random() < 0.15:
                return None
            if r.random() < 0.8:
                out.append(("fixed", sam(r)))
            for _ in range(int(r.integers(0, 3))):
                key = f"k{int(r.integers(0, 10))}" if r.random() < 0.8 \
                    else f"zz{int(r.integers(0, 5))}"
                out.append((key, sam(r)))
            seen, uniq = set(), []
            for k, v in out:
                if k not in seen:
                    seen.add(k)
                    uniq.append((k, v))
            return uniq
        return props, pa.map_(pa.string(), at2), sampler
    list_vals = roll_map < 0.5
    if list_vals:
        # container-typed fixed OR regex prop over list-valued entries
        base, iat, isam = (("0..100", pa.int64(), SCALARS[1][2])
                           if rng.random() < 0.5
                           else ("(a|bb|ccc)", pa.string(), SCALARS[2][2]))
        suffix = rng.choice(["[]", "[1,3]", "{2,4}", "{}"])
        if rng.random() < 0.4:
            props = {"(k[0-9])": f"{base}{suffix}"}
        else:
            opt = "" if rng.random() < 0.5 else "?"
            props[f"fixed{opt}"] = f"{base}{suffix}"
        at = pa.list_(iat)

        def vsam(r, isam=isam):
            if r.random() < 0.12:
                return None
            return [isam(r) for _ in range(int(r.integers(0, 5)))]
        sam = vsam
    elif rng.random() < 0.5:
        props["fixed"] = st
    if rng.random() < 0.3:
        props["@final"] = True

    def sampler(r, sam=sam):
        if r.random() < 0.15:
            return None
        out = []
        if r.random() < 0.8:
            out.append(("fixed", sam(r)))
        for _ in range(int(r.integers(0, 3))):
            key = f"k{int(r.integers(0, 10))}" if r.random() < 0.8 \
                else f"zz{int(r.integers(0, 5))}"
            out.append((key, sam(r)))
        # map keys must be unique
        seen, uniq = set(), []
        for k, v in out:
            if k not in seen:
                seen.add(k)
                uniq.append((k, v))
        return uniq
    return props, pa.map_(pa.string(), at), sampler


def doc_of(value, sjot_type):
    """Arrow cell → JSON value (null ≡ absent for struct fields, incl.
    dict items inside lists; null list items stay; map entries → dict)."""
    if isinstance(value, list) and isinstance(sjot_type, dict):
        return {k: doc_of(v, None) for k, v in value}  # map cell
    if isinstance(value, list) and value and isinstance(value[0], tuple):
        return {k: doc_of(v, None) for k, v in value}
    if isinstance(value, dict):
        return {k: doc_of(v, None) for k, v in value.items()
                if v is not None}
    if isinstance(value, list):
        return [doc_of(x, None) if isinstance(x, dict) else x
                for x in value]
    return value


@pytest.mark.parametrize("seed", range(120))
def test_columnar_fuzz_matches_row_engine(seed):
    rng = np.random.default_rng(1000 + seed)
    sjot_type, arrow_type, sampler = gen_type(rng)
    mismatch_mode = False
    if rng.random() < 0.15:
        mismatch_mode = True
        # schema-table mismatch mode: sample values of a DIFFERENT
        # scalar shape than the schema expects — verdicts must still
        # match the row engine (and nothing may crash)
        _, arrow_type, sampler = SCALARS[rng.integers(0, len(SCALARS))]
    required = rng.random() < 0.5
    vprop = "v" if required else "v?"
    if not required and isinstance(sjot_type, str) \
            and sjot_type == "0..100" and rng.random() < 0.5:
        vprop += str(rng.choice([7, 250]))
    schema = {"@root": {vprop: sjot_type}}
    values = [sampler(rng) for _ in range(200)]
    try:
        tbl = pa.table({"v": pa.array(values, arrow_type)})
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        pytest.skip("sampler produced type-incompatible values")
    try:
        tv = TableValidator(copy.deepcopy(schema))
    except ColumnarCompileError:
        pytest.skip("schema outside columnar surface (row-engine fallback)")
    col_verdict, col_v, _ = tv.validate_batch(tbl)
    col_v = {v["row_idx"]: v for v in col_v}

    mism = []
    for i, cell in enumerate(values):
        doc = {}
        if cell is not None:
            doc["v"] = doc_of(cell, sjot_type)
        try:
            validate(copy.deepcopy(doc), None, copy.deepcopy(schema))
            ok = True
            rv = None
        except SJOTValidationError as e:
            ok = False
            rv = e.violation_row()
        if bool(col_verdict[i]) != ok:
            mism.append((i, cell, ok, col_v.get(i)))
            continue
        if not ok and not mismatch_mode:
            # mismatch mode compares verdicts only: shape-mismatch
            # diagnostics are documented approximations
            cv = col_v[i]
            for k in ("datapath", "typepath", "what", "value_repr"):
                if cv[k] != rv[k]:
                    mism.append((i, cell, k, cv[k], rv[k]))
    assert not mism, (sjot_type, mism[:5])
