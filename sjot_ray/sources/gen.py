"""Deterministic interleaved text+media document corpus (FIXTURES.md F1).

Generates the engine's primary input shape per BASELINE.json's input_hint:

    doc_id: string
    spans:  list<struct<kind: string, text: string,
                        media_ref: string, offset: int32>>
    tags:   list<string>        (optional; exercises SJOT set semantics)
    _extra_props: list<string>  (unknown-key capture column for @final)
    violation_class: string     (expected-violation sidecar for tests; "")

Seeded (default 42) and fully deterministic: the same (num_docs, seed)
always produces byte-identical tables at any scale. ~10% of rows carry
exactly one injected violation from the FIXTURES.md F1 classes; ~0.5% carry
duplicated doc_ids and ~1% of media refs dangle (targets for the
table-level uniqueness / referential checks — NOT schema violations).

Generation is vectorized (numpy index math + Arrow ``binary_join``): ~1M
docs/s, so bench-scale corpora are cheap; :func:`interleaved_parquet`
additionally caches to parquet under /tmp keyed by (num_docs, seed).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

WORDS = np.array(
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod"
    " tempor incididunt ut labore et dolore magna aliqua enim ad minim"
    " veniam quis nostrud exercitation ullamco laboris nisi aliquip ex ea"
    " commodo consequat duis aute irure in reprehenderit voluptate velit"
    " esse cillum eu fugiat nulla pariatur excepteur sint occaecat"
    " cupidatat non proident sunt culpa qui officia deserunt mollit anim"
    " id est laborum".split())

KINDS = np.array(["text", "image", "audio", "video", "table"])

VIOLATION_CLASSES = [
    "neg_offset", "missing_kind", "bad_doc_id_regex", "bad_kind_enum",
    "dup_set_item", "empty_spans", "extra_prop",
]

FLAGSHIP_SCHEMA = {
    "@root": "#Doc",
    "Doc": {
        "@final": True,
        "doc_id": "(doc-[0-9a-f]{8})",
        "spans": [1, "#Span"],
        "tags?": "(tag-[a-z]+){1,}",
    },
    "Span": {
        "@final": True,
        "kind": "(text|image|audio|video|table)",
        "text?": "string",
        "media_ref?": "((s3|lance)://[A-Za-z0-9/._-]+)",
        "offset": "0..",
        "@any": [["text", "media_ref"]],
    },
}

MEDIA_POOL = 4096  # distinct media objects in the referential catalog


def _take_str(dictionary: pa.Array, indices: np.ndarray) -> pa.Array:
    """Dictionary-take: build a big string column from a small vocabulary
    without per-element Python/numpy-unicode conversion."""
    return dictionary.take(pa.array(indices, pa.int64()))


def _replace(arr: pa.Array, mask: np.ndarray, value) -> pa.Array:
    if not mask.any():
        return arr
    return pc.replace_with_mask(
        arr, pa.array(mask), pa.nulls(int(mask.sum()), arr.type)
        if value is None else pa.array([value] * int(mask.sum()), arr.type))


def generate_interleaved(num_docs: int, seed: int = 42,
                         violation_rate: float = 0.10) -> pa.Table:
    """Build the corpus as one Arrow table. Vectorized, O(total spans)."""
    rng = np.random.default_rng(seed)

    hexd = np.char.mod("%08x", np.arange(num_docs))
    doc_ids = np.char.add("doc-", hexd).astype(object)
    # ~0.5% duplicated doc_ids (uniqueness-check targets)
    dup = np.nonzero(rng.random(num_docs) < 0.005)[0]
    dup = dup[dup > 0]
    doc_ids[dup] = doc_ids[dup - 1]

    n_spans = rng.integers(1, 9, num_docs)
    # violation selection up front (empty_spans affects layout)
    vclass = np.full(num_docs, "", dtype=object)
    bad = np.nonzero(rng.random(num_docs) < violation_rate)[0]
    bad_cls = rng.integers(0, len(VIOLATION_CLASSES), len(bad))
    for b, ci in zip(bad, bad_cls):
        vclass[b] = VIOLATION_CLASSES[ci]
    empty_mask = vclass == "empty_spans"
    n_spans = np.where(empty_mask, 0, n_spans)

    total = int(n_spans.sum())
    starts = (np.cumsum(n_spans) - n_spans).astype(np.int64)
    first_span = np.zeros(total, dtype=bool)
    nonempty = n_spans > 0
    first_span[starts[nonempty]] = True

    kind_idx = np.where(rng.random(total) < 0.5, 0,
                        rng.integers(1, 5, total))
    is_text = kind_idx == 0
    kinds_pa = pa.array(KINDS.tolist(), pa.string())
    kinds = _take_str(kinds_pa, kind_idx)

    # text payloads: per-span word lists joined by Arrow binary_join
    n_words = rng.integers(3, 13, total)
    words_pa = pa.array(WORDS.tolist(), pa.string())
    flat_words = _take_str(words_pa,
                           rng.integers(0, len(WORDS), int(n_words.sum())))
    w_offsets = np.concatenate([[0], np.cumsum(n_words)]).astype(np.int32)
    word_lists = pa.ListArray.from_arrays(pa.array(w_offsets, pa.int32()),
                                          flat_words)
    joined = pc.binary_join(word_lists, " ")
    texts = pc.if_else(pa.array(is_text), joined,
                       pa.nulls(total, pa.string()))

    # media refs for non-text spans; ~1% dangle
    media_j = rng.integers(0, MEDIA_POOL, total)
    dangling = rng.random(total) < 0.01
    stem = pc.if_else(pa.array(dangling), pa.scalar("s3://bucket/missing"),
                      pa.scalar("s3://bucket/obj"))
    media_all = pc.binary_join_element_wise(
        stem, pc.cast(pa.array(media_j), pa.string()), pa.scalar(".bin"), "")
    media = pc.if_else(pa.array(~is_text), media_all,
                       pa.nulls(total, pa.string()))

    # nondecreasing offsets per doc
    span_len = rng.integers(1, 64, total)
    offs = np.cumsum(span_len) - span_len
    offsets_col = (offs - np.repeat(offs[starts[nonempty]],
                                    n_spans[nonempty])).astype(np.int64)

    # violation injection (flat-position masks, Arrow replace kernels)
    cls_arr = np.asarray([VIOLATION_CLASSES[c] for c in bad_cls], object)

    def doc_mask(cls):
        m = np.zeros(num_docs, dtype=bool)
        m[bad[cls_arr == cls]] = True
        return m

    def first_span_mask(cls):
        m = np.zeros(total, dtype=bool)
        docs = bad[cls_arr == cls]
        docs = docs[n_spans[docs] > 0]
        m[starts[docs]] = True
        return m

    neg_m = first_span_mask("neg_offset")
    offsets_col[neg_m] = -rng.integers(1, 10, int(neg_m.sum()))
    kinds = _replace(kinds, first_span_mask("missing_kind"), None)
    kinds = _replace(kinds, first_span_mask("bad_kind_enum"), "weird")
    for b in bad[cls_arr == "bad_doc_id_regex"]:
        doc_ids[b] = f"bogus-{b:08x}"

    # tags for ~30% of docs: k consecutive distinct words → always unique;
    # dup_set_item docs get exactly ["tag-dup", "tag-dup"]
    has_tags = rng.random(num_docs) < 0.30
    n_tags = np.where(has_tags, rng.integers(1, 5, num_docs), 0)
    dup_docs = doc_mask("dup_set_item")
    has_tags |= dup_docs
    n_tags = np.where(dup_docs, 2, n_tags)
    t_start = rng.integers(0, len(WORDS), num_docs)
    t_total = int(n_tags.sum())
    t_doc_start = np.cumsum(n_tags) - n_tags
    rel = np.arange(t_total) - np.repeat(t_doc_start[has_tags],
                                         n_tags[has_tags])
    widx = (np.repeat(t_start[has_tags], n_tags[has_tags]) + rel) % len(WORDS)
    tag_words = pa.array([f"tag-{w}" for w in WORDS.tolist()] + ["tag-dup"],
                         pa.string())
    dup_flat = np.repeat(dup_docs, n_tags)
    widx_full = np.where(dup_flat, len(WORDS),
                         np.zeros(t_total, dtype=np.int64))
    widx_full[~dup_flat] = widx[~np.repeat(dup_docs[has_tags],
                                           n_tags[has_tags])]
    flat_tags = _take_str(tag_words, widx_full)
    t_offsets = np.concatenate([[0], np.cumsum(n_tags)]).astype(np.int32)
    tags_arr = pa.ListArray.from_arrays(
        pa.array(t_offsets, pa.int32()), flat_tags)
    tags_arr = pc.if_else(pa.array(~has_tags),
                          pa.nulls(num_docs, tags_arr.type), tags_arr)

    # extras column (unknown-key capture; only extra_prop docs carry one)
    extra_docs = doc_mask("extra_prop")
    n_extra = extra_docs.astype(np.int32)
    e_offsets = np.concatenate([[0], np.cumsum(n_extra)]).astype(np.int32)
    extra_arr = pa.ListArray.from_arrays(
        pa.array(e_offsets, pa.int32()),
        pa.array(["bogus_prop"] * int(n_extra.sum()), pa.string()))
    extra_arr = pc.if_else(pa.array(~extra_docs),
                           pa.nulls(num_docs, extra_arr.type), extra_arr)

    span_struct = pa.StructArray.from_arrays(
        [kinds, texts, media, pa.array(offsets_col, pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    offsets = np.concatenate([[0], np.cumsum(n_spans)]).astype(np.int32)
    spans_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         span_struct)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": spans_arr,
        "tags": tags_arr,
        "_extra_props": extra_arr,
        "violation_class": pa.array(vclass, pa.string()),
    })


def interleaved_parquet(num_docs: int, seed: int = 42,
                        cache_dir: str = "/tmp/sjot_ray_corpus") -> str:
    """Generate-once parquet cache; returns a DIRECTORY of shard files.

    Sharded so the distributed read parallelizes (one read task per file —
    a single file serializes the scan) and so a resumable run can address
    shards independently; at real scale the corpus would already arrive
    sharded."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"interleaved_n{num_docs}_s{seed}")
    done = os.path.join(path, "_DONE")
    if not os.path.exists(done):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        tbl = generate_interleaved(num_docs, seed)
        n_shards = max(1, min(32, num_docs // 16384))
        per = -(-num_docs // n_shards)
        for i in range(n_shards):
            pq.write_table(tbl.slice(i * per, per),
                           os.path.join(path, f"part-{i:04d}.parquet"),
                           row_group_size=16384)
        open(done, "w").write("ok")
    return path


def media_catalog() -> pa.Table:
    """The referential build side: every non-dangling media object."""
    refs = [f"s3://bucket/obj{j}.bin" for j in range(MEDIA_POOL)]
    return pa.table({"media_ref": pa.array(refs, pa.string())})


def doc_row_to_json(row: dict) -> dict:
    """One generated table row → the JSON document the reference validator
    would see (drops engine-side columns, strips absent optionals)."""
    doc = {"doc_id": row["doc_id"], "spans": []}
    for s in row["spans"] or []:
        if s is None:
            doc["spans"].append(None)
            continue
        span = {}
        if s.get("kind") is not None:
            span["kind"] = s["kind"]
        if s.get("text") is not None:
            span["text"] = s["text"]
        if s.get("media_ref") is not None:
            span["media_ref"] = s["media_ref"]
        if s.get("offset") is not None:
            span["offset"] = s["offset"]
        doc["spans"].append(span)
    if row.get("tags") is not None:
        doc["tags"] = list(row["tags"])
    for p in row.get("_extra_props") or []:
        doc[p] = True
    return doc


# -- expected-violations sidecar (the flagship correctness oracle) -----------

# Reference-format violation templates per planted class, transcribed
# from the node reference validator's output on sample docs
# (/root/reference/index.js diagnostic format; verified end-to-end by
# tests/test_pipelines.py::test_expected_violations_match_reference).
# A ``None`` value_repr means "per-doc value" (filled from the table).
_CLASS_TEMPLATES = {
    "neg_offset": ("$.spans[0].offset", "/@root/#Doc/spans[]/#Span/offset",
                   "value", None),
    "missing_kind": ("$.spans[0].kind", "/@root/#Doc/spans[]/#Span",
                     "should be present", ""),
    "bad_doc_id_regex": ("$.doc_id", "/@root/#Doc/doc_id", "value", None),
    "bad_kind_enum": ("$.spans[0].kind", "/@root/#Doc/spans[]/#Span/kind",
                      "value", "weird"),
    "dup_set_item": ("$.tags", "/@root/#Doc/tags?", "value", ""),
    "empty_spans": ("$.spans", "/@root/#Doc/spans[]", "length", "1"),
    "extra_prop": ("$.bogus_prop", "/@root/#Doc/@final",
                   "additional property should not be present", ""),
}

# Stable per-class first-violation rule-order labels (the columnar
# compiler's rule ids for FLAGSHIP_SCHEMA — schema-derived, not
# data-derived). The planted-class → count structure is generator ground
# truth; these strings are the engine's naming convention for it, pinned
# here so verdict_summary has a joinable oracle (the mapping itself is
# asserted by tests/test_pipelines.py).
_CLASS_RULES = {
    "bad_doc_id_regex": "1.0",
    "empty_spans": "3.1",
    "missing_kind": "3.4",
    "bad_kind_enum": "3.5",
    "neg_offset": "3.9",
    "dup_set_item": "4.1",
    "extra_prop": "5.0",
}


def expected_violations(num_docs: int, seed: int = 42) -> pa.Table:
    """Ground-truth violation rows for the generated corpus, derived from
    the PLANTED violation metadata (independent of both validation
    engines): one row per violating doc with the reference's diagnostic
    fields. Columns: row_idx (corpus row), doc_id, datapath, typepath,
    what, value_repr. Each bad doc carries exactly one planted class, so
    first-error-wins is trivially the planted violation."""
    tbl = generate_interleaved(num_docs, seed)
    vc = np.asarray(tbl["violation_class"].to_pylist(), dtype=object)
    rows = np.nonzero(vc != "")[0]
    doc_ids = tbl["doc_id"].take(pa.array(rows, pa.int64()))
    n = len(rows)
    dp = np.empty(n, dtype=object)
    tp = np.empty(n, dtype=object)
    wh = np.empty(n, dtype=object)
    vr = np.empty(n, dtype=object)
    cls = vc[rows]
    for c, (d, t, w, v) in _CLASS_TEMPLATES.items():
        m = cls == c
        dp[m], tp[m], wh[m] = d, t, w
        if v is not None:
            vr[m] = v
    # per-doc values: the negative offset and the bogus doc_id
    neg = cls == "neg_offset"
    if neg.any():
        sel = tbl["spans"].take(pa.array(rows[neg], pa.int64()))
        offs = pc.struct_field(pc.list_element(sel, 0), "offset")
        vr[neg] = [str(int(x)) for x in offs.to_pylist()]
    bad_id = cls == "bad_doc_id_regex"
    if bad_id.any():
        ids = tbl["doc_id"].take(pa.array(rows[bad_id], pa.int64()))
        vr[bad_id] = np.asarray(ids.to_pylist(), dtype=object)
    rl = np.empty(n, dtype=object)
    for c, r in _CLASS_RULES.items():
        rl[cls == c] = r
    return pa.table({
        "row_idx": pa.array(rows, pa.int64()),
        "doc_id": doc_ids,
        "datapath": pa.array(dp, pa.string()),
        "typepath": pa.array(tp, pa.string()),
        "what": pa.array(wh, pa.string()),
        "value_repr": pa.array(vr, pa.string()),
        "rule": pa.array(rl, pa.string()),
    })


def expected_violations_parquet(num_docs: int, seed: int = 42,
                                cache_dir: str = "/tmp/sjot_ray_corpus"
                                ) -> str:
    """Write-once parquet cache of :func:`expected_violations` (the
    DuckDB-joinable flagship oracle; the driver's oracle SQL reads it
    with a ``row_idx < corpus_size`` filter)."""
    os.makedirs(cache_dir, exist_ok=True)
    # _v2: carries the per-class ``rule`` column (cache name bumped so
    # stale pre-rule sidecars in /tmp are never globbed)
    path = os.path.join(cache_dir,
                        f"expected_violations_v2_n{num_docs}_s{seed}.parquet")
    if not os.path.exists(path):
        t = expected_violations(num_docs, seed)
        # constant num_docs column: the per-size sidecars share one glob
        # in the oracle SQL, which selects its corpus size with
        # ``WHERE num_docs = …`` (the RNG stream — and therefore the
        # planted violations — depends on the corpus size)
        t = t.append_column(
            "num_docs", pa.array(np.full(t.num_rows, num_docs), pa.int64()))
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
    return path
