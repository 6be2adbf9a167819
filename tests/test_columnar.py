"""Columnar engine conformance: the vectorized TableValidator must agree
with the row engine (itself differentially verified against the reference)
on the full generated interleaved corpus — verdict AND first-violation
(datapath, typepath, what, value_repr) per row."""

from __future__ import annotations

import pytest

from sjot_ray.columnar.table_validator import TableValidator
from sjot_ray.core import SJOTValidationError, validate
from sjot_ray.sources.gen import (
    FLAGSHIP_SCHEMA,
    doc_row_to_json,
    generate_interleaved,
)

N_DOCS = 3000


@pytest.fixture(scope="module")
def corpus():
    return generate_interleaved(N_DOCS, seed=42)


@pytest.fixture(scope="module")
def columnar_result(corpus):
    import copy

    tv = TableValidator(copy.deepcopy(FLAGSHIP_SCHEMA),
                        extras_column="_extra_props")
    verdict, violations, _ = tv.validate_batch(corpus)
    return verdict, {v["row_idx"]: v for v in violations}


@pytest.fixture(scope="module")
def row_result(corpus):
    import copy

    schema = copy.deepcopy(FLAGSHIP_SCHEMA)
    verdicts = []
    violations = {}
    rows = corpus.to_pylist()
    for i, row in enumerate(rows):
        doc = doc_row_to_json(row)
        try:
            validate(doc, None, schema)
            verdicts.append(True)
        except SJOTValidationError as e:
            verdicts.append(False)
            violations[i] = e.violation_row()
    return verdicts, violations


def test_verdicts_agree(corpus, columnar_result, row_result):
    col_verdict, _ = columnar_result
    row_verdict, _ = row_result
    mism = [i for i in range(N_DOCS) if bool(col_verdict[i]) != row_verdict[i]]
    assert not mism, (
        f"{len(mism)} verdict mismatches, first: row {mism[0]}: "
        f"{corpus.slice(mism[0], 1).to_pylist()}")


def test_violation_rate_sane(corpus, columnar_result):
    col_verdict, _ = columnar_result
    invalid = (~col_verdict).sum()
    # ~10% injected violations (empty-tags dup rows can overlap classes)
    assert 0.05 * N_DOCS < invalid < 0.15 * N_DOCS


def test_first_violation_fields_agree(columnar_result, row_result, corpus):
    _, col_v = columnar_result
    _, row_v = row_result
    assert set(col_v) == set(row_v)
    mismatches = []
    for i, rv in row_v.items():
        cv = col_v[i]
        for k in ("datapath", "typepath", "what", "value_repr"):
            if cv[k] != rv[k]:
                mismatches.append((i, k, cv[k], rv[k]))
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"


def test_expected_violation_classes(corpus, columnar_result):
    """Rows flagged by the generator must be invalid with the right rule."""
    col_verdict, col_v = columnar_result
    classes = corpus["violation_class"].to_pylist()
    for i, cls in enumerate(classes):
        if not cls:
            continue
        assert not col_verdict[i], f"row {i} class {cls} passed"
        v = col_v[i]
        expected_path = {
            "neg_offset": "offset",
            "missing_kind": "kind",
            "bad_doc_id_regex": "doc_id",
            "bad_kind_enum": "kind",
            "dup_set_item": "tags",
            "empty_spans": "spans",
            "extra_prop": "bogus_prop",
        }[cls]
        assert expected_path in v["datapath"], (i, cls, v)


def test_normalize_sorts_sets(corpus):
    import copy

    tv = TableValidator(copy.deepcopy(FLAGSHIP_SCHEMA),
                        extras_column="_extra_props")
    out = tv.normalize_batch(corpus)
    for row in out["tags"].to_pylist()[:500]:
        if row:
            assert row == sorted(row)


def test_span_sequence_invariant(corpus):
    """BASELINE.json per-row invariant: span-sequence equality of
    (kind, text, media_ref, order) between normalized output and the
    reference semantics (normalization never touches spans here)."""
    import copy

    tv = TableValidator(copy.deepcopy(FLAGSHIP_SCHEMA),
                        extras_column="_extra_props")
    out = tv.normalize_batch(corpus)
    a = corpus["spans"].to_pylist()
    b = out["spans"].to_pylist()
    for sa, sb in zip(a, b):
        if sa is None:
            assert sb is None
            continue
        assert [(s["kind"], s["text"], s["media_ref"]) for s in sa] == \
               [(s["kind"], s["text"], s["media_ref"]) for s in sb]


def test_columnar_vs_reference_oracle(corpus, columnar_result):
    """Close the loop: columnar verdicts + diagnostics vs the reference
    validator itself (node oracle) on a corpus sample."""
    from .conftest import run_reference

    sample = list(range(0, N_DOCS, 17))
    rows = corpus.take(sample).to_pylist()
    import copy

    from sjot_ray.sources.gen import FLAGSHIP_SCHEMA as FS
    cases = [{"data": doc_row_to_json(r), "type": "@root",
              "schema": copy.deepcopy(FS), "mode": "validate"}
             for r in rows]
    refs = run_reference(cases)
    col_verdict, col_v = columnar_result
    for i, ref in zip(sample, refs):
        assert bool(col_verdict[i]) == ref["valid"], (i, ref)
        if not ref["valid"]:
            v = col_v[i]
            frag = f'{v["datapath"]} {v["what"]}'
            assert ref["error"].startswith(frag), (ref["error"], v)
            assert v["typepath"] in ref["error"], (ref["error"], v)
