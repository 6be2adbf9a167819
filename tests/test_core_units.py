"""Targeted unit tests for core behaviors not exercised elsewhere."""

from __future__ import annotations

import pytest

from sjot_ray.core import (SJOT, SJOTSchemaError, SJOTValidationError, valid,
                           validate)


def test_recursive_schema_bounded_depth():
    schema = {"@root": "#Node",
              "Node": {"v": "int", "kids?": "#Node[]"}}
    doc = {"v": 0}
    for i in range(1, 50):
        doc = {"v": i, "kids": [doc]}
    assert valid(doc, None, schema)
    bad = {"v": 0}
    for i in range(1, 50):
        bad = {"v": i, "kids": [bad]}
    inner = bad
    while inner.get("kids"):
        inner = inner["kids"][0]
    inner["v"] = "not an int"
    assert not valid(bad, None, schema)


def test_multi_schema_registry_cross_refs():
    schemas = [
        {"@id": "app", "@root": "#Doc",
         "Doc": {"meta": "common#Meta", "n": "int"}},
        {"@id": "common", "Meta": {"tag": "string"}},
    ]
    assert SJOT.validate({"meta": {"tag": "t"}, "n": 1}, None, schemas)
    assert not valid({"meta": {"tag": 5}, "n": 1}, None, schemas)


def test_external_url_loading_disabled():
    with pytest.raises(SJOTSchemaError, match="no type .* found"):
        validate(1, "http://example.com/schema#T", [{"@id": "other"}])


def test_context_reuse_is_faster_and_equal():
    import time

    from sjot_ray.core import Context

    schema = {"@root": {"a": "(x+)", "b?": "1..9", "u": [["string", "int"]]}}
    docs = [{"a": "xx", "b": 5, "u": i} for i in range(2000)]
    ctx = Context()
    t0 = time.time()
    r1 = [valid(dict(d), None, schema, ctx) for d in docs]
    with_ctx = time.time() - t0
    assert all(r1)
    # shared-Context validation must agree with fresh-Context validation
    assert valid({"a": "y", "u": 1}, None, schema, ctx) is False


def test_js_num_str_ecmascript_thresholds():
    """Expected strings produced by node v20 String(x) for each value."""
    from sjot_ray.core.jsutil import js_num_str

    cases = [
        (1e-5, "0.00001"), (1.5e-5, "0.000015"), (1e-6, "0.000001"),
        (1e-7, "1e-7"), (2.5e-7, "2.5e-7"), (0.000123, "0.000123"),
        (1e21, "1e+21"), (1.23e21, "1.23e+21"),
        (1e20, "100000000000000000000"), (123.456, "123.456"),
        (0.5, "0.5"), (-0.00001, "-0.00001"), (0.1, "0.1"),
        (100.0, "100"), (-0.0, "0"),
        (18446744073709551616, "18446744073709552000"),
        (5e-324, "5e-324"), (1.7976931348623157e308, "1.7976931348623157e+308"),
    ]
    for v, want in cases:
        assert js_num_str(v) == want, (v, js_num_str(v), want)


def test_external_schema_file_loading(tmp_path):
    """URI#type refs to a second schema file resolve at compile time
    (reference sjot_load semantics, index.js:1166-1191, restricted to
    local/registered sources)."""
    import json

    from sjot_ray.core.validator import (register_schema_url,
                                         resolve_external_refs)

    ext = {"Temp": {"celsius": "-100.0..100.0"}}
    p = tmp_path / "ext_schema.json"
    p.write_text(json.dumps(ext))

    # plain-path URI through the compile-time prefetcher
    schema = {"@root": {"reading": f"{p}#Temp"}}
    sjots0 = resolve_external_refs(schema)
    assert valid({"reading": {"celsius": 20.5}}, None, sjots0)
    assert not valid({"reading": {"celsius": 200.0}}, None, sjots0)

    # WITHOUT prefetch, validation-time resolution is registry-only:
    # an unprefetched file-path ref fails the document with a schema
    # error (never reads worker-local files at validation time)
    with pytest.raises(SJOTSchemaError):
        validate({"reading": {"celsius": 20.5}}, None, schema)

    # file:// URI through the compile-time prefetcher
    schema2 = {"@root": {"reading": f"file://{p}#Temp"}}
    sjots = resolve_external_refs(schema2)
    assert len(sjots) == 2 and sjots[1]["@id"] == f"file://{p}"
    assert valid({"reading": {"celsius": -40.0}}, None, sjots)

    # registry (broadcast path): no file I/O needed
    register_schema_url("mem://ext", {"Temp": {"celsius": "0.."}})
    schema3 = {"@root": {"reading": "mem://ext#Temp"}}
    assert valid({"reading": {"celsius": 1}}, None, schema3)
    assert not valid({"reading": {"celsius": -1}}, None, schema3)


def test_external_schema_id_mismatch(tmp_path):
    """A loaded schema whose @id differs from the URL is rejected
    (index.js:1150-1151)."""
    import json

    from sjot_ray.core.validator import resolve_external_refs

    bad = {"@id": "http://other/schema", "T": {"x": "int"}}
    p = tmp_path / "bad.json"
    p.write_text(json.dumps(bad))
    schema = {"@root": {"v": f"{p}#T"}}
    with pytest.raises(SJOTSchemaError, match="@id URL mismatch"):
        resolve_external_refs(schema)


def test_external_schema_no_validation_time_file_read(tmp_path):
    """Validation-time refs never touch the filesystem: a document
    carrying an embedded @sjot ref to an EXISTING local file fails the
    document with SJOTValidationError/SJOTSchemaError — it neither reads
    the file nor leaks its existence, and never raises a raw
    JSONDecodeError out of the per-doc handlers (ADVICE r2 high)."""
    import json

    from sjot_ray.core.validator import resolve_external_refs

    secret = tmp_path / "secret.json"
    secret.write_text(json.dumps({"T": "int"}))
    notjson = tmp_path / "garbage.bin"
    notjson.write_bytes(b"\x00\xffnot json")

    # data-driven ref under an 'any' type: must fail the DOC, not read
    schema = {"@root": {"v": "any"}}
    for target in (str(secret), f"file://{secret}", str(notjson),
                   str(tmp_path / "missing.json")):
        doc = {"v": {"@sjot": f"{target}#T", "x": 1}}
        with pytest.raises((SJOTValidationError, SJOTSchemaError)):
            validate(doc, None, schema)

    # compile-time prefetch of a non-JSON file: SJOTSchemaError, not a
    # raw JSONDecodeError
    with pytest.raises(SJOTSchemaError, match="load error"):
        resolve_external_refs({"@root": {"v": f"{notjson}#T"}})


def test_external_refs_with_container_suffixes():
    """'URI#type[]' / 'URI#type{2,}' are array/set types whose ITEM type
    is the external ref; the prefetcher must resolve them too."""
    from sjot_ray.core.validator import (register_schema_url,
                                         resolve_external_refs)

    register_schema_url("mem://ext-list", {"tag": "(t[0-9])"})
    sjots = resolve_external_refs(
        {"@root": {"tags": "mem://ext-list#tag[]",
                   "uniq?": "mem://ext-list#tag{1,}"}})
    assert len(sjots) == 2
    assert valid({"tags": ["t1", "t2"]}, None, sjots)
    assert not valid({"tags": ["zzz"]}, None, sjots)
    assert valid({"tags": [], "uniq": ["t3"]}, None, sjots)


def test_bare_char_union_branch_is_dead():
    """The reference parks a bare "char" union branch at array depth 0
    (sjot_check_union decrements n for "char", index.js:1764-1768), so
    it can never match data (depth starts at 1) — and writing it after
    an "any" branch hits the numeric cutoff slot, a strict-mode
    TypeError in the reference (surfaced here as a schema error). All
    node-oracle verified."""
    import copy

    import pytest

    from sjot_ray.core import SJOTSchemaError, check, valid

    s = {"@root": {"v": [["true", "char", "string[]"]]}}
    check(copy.deepcopy(s))
    assert valid({"v": "c"}, None, copy.deepcopy(s)) is False   # dead
    assert valid({"v": "cc"}, None, copy.deepcopy(s)) is False
    assert valid({"v": True}, None, copy.deepcopy(s)) is True
    assert valid({"v": ["a"]}, None, copy.deepcopy(s)) is True
    assert valid({"v": []}, None, copy.deepcopy(s)) is True

    # char FIRST then any: any's cutoff overwrites the depth-0 slots
    s2 = {"@root": {"v": [["char", "any"]]}}
    check(copy.deepcopy(s2))
    assert valid({"v": "c"}, None, copy.deepcopy(s2)) is True

    # any FIRST then char: the reference throws TypeError (strict-mode
    # write to the numeric cutoff) — unusable schema
    s3 = {"@root": {"v": [["any", "char"]]}}
    with pytest.raises(SJOTSchemaError):
        check(copy.deepcopy(s3))

    # char[] decrements to string at depth 1 — alive as plain string
    s4 = {"@root": {"v": [["true", "char[]"]]}}
    assert valid({"v": "c"}, None, copy.deepcopy(s4)) is True
