"""Seeded random differential fuzz: generate random SJOT types + random
documents, compare verdict / normalized document / diagnostic between
sjot_ray.core and the reference validator. Deterministic (seed 42)."""

from __future__ import annotations

import json
import random

import pytest

from .conftest import js_value_eq, run_ours, run_reference

PRIMS = ["boolean", "true", "false", "byte", "short", "int", "long", "ubyte",
         "ushort", "uint", "ulong", "integer", "float", "double", "number",
         "string", "base64", "hex", "uuid", "date", "time", "datetime",
         "duration", "char", "atom", "null", "any", "object", "array"]

WORDS = ["a", "b", "cc", "dd", "kind", "text", "off", "val", "x1"]


def rand_range(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 3)):
        style = rng.randint(0, 3)
        lo = rng.randint(-50, 40)
        hi = lo + rng.randint(0, 30)
        if rng.random() < 0.3:
            lo_s, hi_s = f"{lo}.0", f"{hi}.5"
        else:
            lo_s, hi_s = str(lo), str(hi)
        if style == 0:
            parts.append(f"{lo_s}..{hi_s}")
        elif style == 1:
            parts.append(f"<{lo_s}..{hi_s}>")
        elif style == 2:
            parts.append(rng.choice([f"..{hi_s}", f"{lo_s}.."]))
        else:
            parts.append(lo_s)
    return ",".join(parts)


def rand_type(rng: random.Random, depth: int):
    r = rng.random()
    if depth <= 0 or r < 0.45:
        k = rng.random()
        if k < 0.5:
            return rng.choice(PRIMS)
        if k < 0.7:
            return rand_range(rng)
        if k < 0.8:
            return "(" + "|".join(rng.sample(WORDS, rng.randint(1, 3))) + ")"
        if k < 0.9:
            return rng.choice(["char[1,5]", "char[2]", "char[,4]", "char[3,]"])
        base = rng.choice(["string", "int", "1..9", "(a|b)"])
        suffix = rng.choice(["[]", "[1,3]", "[2]", "[,2]", "[1,]", "{}", "{1,}"])
        return base + suffix
    if r < 0.6:
        # inline array forms
        form = rng.randint(0, 5)
        t = rand_type(rng, depth - 1)
        return {0: lambda: [t], 1: lambda: [rng.randint(0, 3)],
                2: lambda: [rng.randint(0, 2), rng.randint(2, 4)],
                3: lambda: [t, rng.randint(1, 4)],
                4: lambda: [rng.randint(0, 2), t],
                5: lambda: [rng.randint(0, 2), t, rng.randint(2, 5)]}[form]()
    if r < 0.7:
        # tuple
        return [rand_type(rng, depth - 1) for _ in range(rng.randint(2, 3))]
    if r < 0.85:
        # object
        obj = {}
        for w in rng.sample(WORDS, rng.randint(1, 4)):
            name = w + ("?" if rng.random() < 0.4 else "")
            if name.endswith("?") and rng.random() < 0.4:
                name += rng.choice(["5", "zz", "true", "null"])
            obj[name] = rand_type(rng, depth - 1)
        if rng.random() < 0.25:
            obj["@final"] = rng.random() < 0.8
        opt = [p[:-1] for p in obj if isinstance(p, str) and p.endswith("?")]
        if opt and rng.random() < 0.3:
            obj[rng.choice(["@one", "@any", "@all"])] = [opt]
        return obj
    # union of scalar-ish branches (distinctness not guaranteed — invalid
    # unions must also agree between engines)
    kinds = rng.sample(
        ["string", "int", "null", "boolean", "(a|b)", "1..9",
         {"kind": "string"}, {"val": "int"}, "int[]", "string[]"],
        rng.randint(2, 3))
    return [kinds]


def rand_value(rng: random.Random, depth: int):
    r = rng.random()
    if depth <= 0 or r < 0.5:
        k = rng.random()
        if k < 0.15:
            return rng.choice([None, True, False])
        if k < 0.45:
            n = rng.randint(-60, 60)
            return n if rng.random() < 0.7 else n + rng.choice([0.5, 0.25])
        if k < 0.5:
            return rng.choice([0, 1, -1, 127, 128, 255, 256, 1.0])
        return rng.choice(
            WORDS + ["", "c", "abc", "deadbeef", "2026-01-02", "PT1S",
                     "123e4567-e89b-12d3-a456-426655440000"])
    if r < 0.75:
        return [rand_value(rng, depth - 1) for _ in range(rng.randint(0, 4))]
    return {w: rand_value(rng, depth - 1)
            for w in rng.sample(WORDS, rng.randint(0, 4))}


def build_cases(seed: int, n: int) -> list[dict]:
    rng = random.Random(seed)
    cases = []
    while len(cases) < n:
        t = rand_type(rng, rng.randint(1, 3))
        # only keep schemas the reference admits (check-mode agreement is
        # asserted separately below); both engines must agree on admission
        cases.append({"data": rand_value(rng, rng.randint(0, 3)),
                      "type": t, "schema": None, "mode": "validate"})
        if len(cases) % 7 == 0:
            cases.append({"schema": {"@root": t}, "mode": "check"})
    return cases


CASES = build_cases(42, 600)


@pytest.fixture(scope="module")
def reference_results():
    return run_reference(CASES)


def _errors_agree(our_err: str, ref_err: str) -> bool:
    if our_err == ref_err:
        return True
    if ref_err and "Invalid regular expression" in ref_err:
        return our_err.startswith("SJOT schema error:")
    if ref_err and "Cannot create property 's' on number" in ref_err:
        # a bare "char" union branch after an "any" branch: the
        # reference's strict-mode write to the numeric cutoff slot
        # throws TypeError; we surface the same unusable schema as a
        # schema error (core/validator.py build_union_dispatch)
        return our_err.startswith("SJOT schema error:")
    return False


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_fuzz_differential(idx, reference_results):
    case = CASES[idx]
    ref = reference_results[idx]
    ours = run_ours(case)
    label = json.dumps(case)[:240]
    assert ours["valid"] == ref["valid"], (
        f"verdict mismatch on {label}: ours={ours} ref={ref}")
    if case.get("mode") != "check" and ref["valid"]:
        assert js_value_eq(ours["data"], ref["data"]), (
            f"normalized mismatch on {label}: ours={ours['data']!r}"
            f" ref={ref['data']!r}")
    if not ref["valid"]:
        assert _errors_agree(ours["error"], ref["error"]), (
            f"diagnostic mismatch on {label}:\n ours={ours['error']!r}\n"
            f"  ref={ref['error']!r}")


# ---------------------------------------------------------------------------
# schema-based fuzz: named types, refs, @extends, defaults, propsets

def rand_schema(rng: random.Random):
    schema = {}
    n_named = rng.randint(1, 3)
    names = [f"T{i}" for i in range(n_named)]
    for i, name in enumerate(names):
        obj = {}
        for w in rng.sample(WORDS, rng.randint(1, 4)):
            pn = w + ("?" if rng.random() < 0.5 else "")
            if pn.endswith("?") and rng.random() < 0.4:
                pn += rng.choice(["7", "hi", "true", "null"])
            if rng.random() < 0.25 and i + 1 < n_named:
                obj[pn] = f"#T{rng.randint(i + 1, n_named - 1)}"
            else:
                obj[pn] = rand_type(rng, 1)
        if rng.random() < 0.3 and i + 1 < n_named:
            obj["@extends"] = f"#T{rng.randint(i + 1, n_named - 1)}"
        if rng.random() < 0.2:
            obj["@final"] = True
        opt = [p.split("?")[0] for p in obj
               if isinstance(p, str) and p.endswith("?")]
        if opt and rng.random() < 0.3:
            obj[rng.choice(["@one", "@any", "@all"])] = [opt]
        elif len(opt) >= 2 and rng.random() < 0.3:
            obj["@dep"] = {opt[0]: opt[1]}
        schema[name] = obj
    schema["@root"] = "#T0"
    return schema


def rand_doc_for(rng: random.Random, schema, name="T0", depth=2):
    obj = schema.get(name, {})
    doc = {}
    for prop, t in obj.items():
        if not isinstance(prop, str) or prop.startswith("@"):
            continue
        base = prop.split("?")[0]
        optional = "?" in prop
        if optional and rng.random() < 0.4:
            continue
        if isinstance(t, str) and t.startswith("#") and depth > 0:
            doc[base] = rand_doc_for(rng, schema, t[1:], depth - 1)
        else:
            doc[base] = rand_value(rng, 1)
    if rng.random() < 0.2:
        doc[rng.choice(WORDS) + "_x"] = rand_value(rng, 0)
    return doc


def build_schema_cases(seed: int, n: int) -> list[dict]:
    rng = random.Random(seed)
    cases = []
    while len(cases) < n:
        schema = rand_schema(rng)
        cases.append({"schema": schema, "mode": "check"})
        for _ in range(3):
            if len(cases) >= n:
                break
            cases.append({"data": rand_doc_for(rng, schema),
                          "type": None, "schema": schema,
                          "mode": "validate"})
    return cases


SCHEMA_CASES = build_schema_cases(4242, 400)


@pytest.fixture(scope="module")
def schema_reference_results():
    return run_reference(SCHEMA_CASES)


@pytest.mark.parametrize("idx", range(len(SCHEMA_CASES)))
def test_schema_fuzz_differential(idx, schema_reference_results):
    case = SCHEMA_CASES[idx]
    ref = schema_reference_results[idx]
    ours = run_ours(case)
    label = json.dumps(case)[:240]
    assert ours["valid"] == ref["valid"], (
        f"verdict mismatch on {label}: ours={ours} ref={ref}")
    if case.get("mode") != "check" and ref["valid"]:
        assert js_value_eq(ours["data"], ref["data"]), (
            f"normalized mismatch on {label}: ours={ours['data']!r}"
            f" ref={ref['data']!r}")
    if not ref["valid"]:
        assert _errors_agree(ours["error"], ref["error"]), (
            f"diagnostic mismatch on {label}:\n ours={ours['error']!r}\n"
            f"  ref={ref['error']!r}")


@pytest.mark.parametrize("chunk", range(3))
def test_regex_torture_vs_reference(chunk):
    """JS-RegExp-semantics torture: random patterns from fragments that
    exercise the JS/Python divergence surface — anchor-splitting
    top-level alternation, Annex-B literal escapes/braces/class-range
    dashes, quantifier-after-quantifier SyntaxErrors, named groups and
    backreferences, \\x/\\u/\\c escapes. This family found and fixed
    six real divergences in r4 (40K-case sweep clean after)."""
    import warnings

    warnings.filterwarnings("ignore", category=FutureWarning)
    rng = random.Random(911 + chunk)
    FRAGS = ["a", "b", "|", "*", "+", "?", "[a-z]", "[0-9]", "(", ")",
             ".", "\\d", "\\w", "{1,2}", "^", "$", "\\", "[", "]",
             "x|y", "()", "\\.", "-", "\\q", "\\x41", "\\u0041", "\\cA",
             "{,2}", "(?:a)", "(?=b)", "(?<x>a)"]

    def rand_pat(r):
        return "(" + "".join(r.choice(FRAGS)
                             for _ in range(r.randint(1, 6))) + ")"

    cases = []
    DATA = ["a", "ab", "x", "", "aa", "a1", "8", ".", "xy", "a\nb",
            "a\n", "A", "q", "{,2}", "-"]
    for _ in range(700):
        t = rand_pat(rng)
        cases.append({"data": {"v": rng.choice(DATA)}, "type": "@root",
                      "schema": {"@root": {"v": t}}, "mode": "validate"})
        if len(cases) % 9 == 0:
            cases.append({"schema": {"@root": {"v": t}}, "mode": "check"})
    refs = run_reference(cases)
    for case, ref in zip(cases, refs):
        ours = run_ours(case)
        ok = ours["valid"] == ref["valid"] and (
            ref["valid"] or _errors_agree(ours["error"] or "",
                                          ref["error"] or ""))
        assert ok, (case, ours, ref)
