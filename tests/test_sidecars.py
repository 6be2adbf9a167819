"""Oracle-sidecar regression tests (sjot_ray/sources/sidecars.py).

The sidecars are the driver gate's DuckDB-joinable ground truths for
``multimodal_media_meta`` and ``dedup_simhash``; these tests assert the
engine pipelines reproduce them end-to-end at small scale, so a pipeline
or sidecar drift fails HERE before it fails the gate.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_media_meta_sidecar_matches_decode(ray_session):
    """The decode pipeline (synthesize → BMP/WAV/VIDF/CSV encode → real
    decode) must recover exactly the planted per-span metadata."""
    from sjot_ray.pipelines.flagship import read_corpus, validated
    from sjot_ray.pipelines.multimodal import media_pipeline
    from sjot_ray.sources.sidecars import expected_media_meta

    num_docs = 2_000
    docs = validated(read_corpus(num_docs, seed=42)).map_batches(
        lambda t: t.filter(t["verdict"]), batch_format="pyarrow")
    got = media_pipeline(docs).to_pandas()
    exp = expected_media_meta(num_docs, seed=42).to_pandas()

    cols = ["doc_id", "media_ref", "kind", "width", "height",
            "duration_s", "n_frames"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    exp = exp[cols].sort_values(cols).reset_index(drop=True)
    assert len(got) == len(exp) > 0
    for c in cols:
        if c == "duration_s":
            assert np.allclose(got[c], exp[c], atol=1e-9), c
        else:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_simhash_sidecar_matches_pipeline(ray_session, tmp_path):
    """Brute-force quadratic spec ≡ the bucketed/star-collapsed/shuffled
    pipeline, on a corpus with planted exact copies and 1-token edits."""
    import ray.data

    from sjot_ray.pipelines.dedup import simhash_near_pairs
    from sjot_ray.sources.sidecars import expected_simhash_pairs

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(300)]
    texts = [" ".join(rng.choice(words, 50)) for _ in range(400)]
    ids = list(range(400))
    # planted: exact copies (distance 0, star edges) and 1-token edits
    for src in (0, 1, 2):
        ids.append(1000 + src)
        texts.append(texts[src])
    for src in (3, 4):
        toks = texts[src].split()
        toks[7] = "edited"
        ids.append(2000 + src)
        texts.append(" ".join(toks))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, path)

    exp = expected_simhash_pairs(str(path), radius=3)
    got = simhash_near_pairs(ray.data.from_arrow(tbl), radius=3)

    def key(t):
        return sorted(zip(t["id_a"].to_pylist(), t["id_b"].to_pylist(),
                          t["hamming"].to_pylist()))

    assert key(got) == key(exp)
    pairs = {(a, b): h for a, b, h in key(exp)}
    for src in (0, 1, 2):           # planted exact copies present at d=0
        assert pairs.get((src, 1000 + src)) == 0


def test_simhash_sidecar_parquet_keyed_by_content(tmp_path):
    """Two same-size corpora must land in different sidecar files (the
    n-rows discriminator would collide — sf0.001 vs sf0.01 both have 500
    docs)."""
    from sjot_ray.sources.sidecars import expected_simhash_parquet

    for i, seed in enumerate((1, 2)):
        rng = np.random.default_rng(seed)
        t = pa.table({
            "doc_id": pa.array(np.arange(50), pa.int64()),
            "text": pa.array([" ".join(
                f"w{x}" for x in rng.integers(0, 99, 20))
                for _ in range(50)]),
            "n_chars": pa.array(rng.integers(10, 500, 50), pa.int64()),
        })
        pq.write_table(t, tmp_path / f"documents{i}.parquet")
    p1 = expected_simhash_parquet(str(tmp_path / "documents0.parquet"),
                                  cache_dir=str(tmp_path))
    p2 = expected_simhash_parquet(str(tmp_path / "documents1.parquet"),
                                  cache_dir=str(tmp_path))
    assert p1 != p2


def test_minhash_sidecar_matches_pipeline_planted(ray_session, tmp_path):
    """Dict-bucketed brute-force LSH+Jaccard spec ≡ the vectorized
    shuffled pipeline, on a corpus with planted exact copies (star
    collapse, J=1.0) and high-overlap near-dups."""
    import ray.data

    from sjot_ray.pipelines.dedup import (distributed_jaccard,
                                          minhash_candidates)
    from sjot_ray.sources.sidecars import expected_minhash_pairs

    rng = np.random.default_rng(7)
    words = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(words, 40)) for _ in range(300)]
    ids = list(range(300))
    for src in (0, 1, 2):           # exact copies → star edges
        ids.append(1000 + src)
        texts.append(texts[src])
    for src in (3, 4, 5):           # 2-token edits → high-Jaccard pairs
        toks = texts[src].split()
        toks[5], toks[20] = "edited", "tokens"
        ids.append(2000 + src)
        texts.append(" ".join(toks))
    tbl = pa.table({"doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts)})
    path = tmp_path / "documents.parquet"
    pq.write_table(tbl, path)

    exp = expected_minhash_pairs(str(path), k=5, threshold=0.4)
    ds = ray.data.read_parquet(str(path))
    got = distributed_jaccard(minhash_candidates(ds), ds, k=5,
                              threshold=0.4)

    def key(t):
        return sorted(zip(t["id_a"].to_pylist(), t["id_b"].to_pylist(),
                          t["jaccard"].to_pylist()))

    assert key(got) == key(exp)
    pairs = {(a, b): j for a, b, j in key(exp)}
    for src in (0, 1, 2):           # exact copies present at J=1.0
        assert pairs.get((src, 1000 + src)) == 1.0
    assert any(0.4 <= j < 1.0 for j in pairs.values())  # near-dups too


def test_minhash_and_groups_sidecars_match_real_corpus(ray_session):
    """Gate parity on the real documents table: pipeline output ==
    sidecar for both the verified pair set and the decision table."""
    from sjot_ray.pipelines.dedup import q_dedup_groups, q_minhash_near_dups
    from sjot_ray.sources.sidecars import (expected_dedup_groups,
                                           expected_minhash_pairs)

    sf = "/root/testdata/sf0.001"
    got_pairs = q_minhash_near_dups(sf)
    exp_pairs = expected_minhash_pairs(f"{sf}/documents.parquet")
    assert got_pairs.equals(exp_pairs)
    assert exp_pairs.num_rows > 0
    got_groups = q_dedup_groups(sf)
    exp_groups = expected_dedup_groups(f"{sf}/documents.parquet")
    assert got_groups.equals(exp_groups)


def test_embedding_sidecar_matches_pipeline_planted(ray_session, tmp_path):
    """Brute-force plane-LSH spec ≡ the bucketed pipeline on planted
    vectors: exact duplicates (star edges, cosine 1.0 — guaranteed to
    collide in every plane set) plus tight noise clusters (cosine >
    0.99) and random background."""
    from sjot_ray.pipelines.dedup import q_embedding_near_dups
    from sjot_ray.sources.sidecars import expected_embedding_pairs

    rng = np.random.default_rng(13)
    dim = 24
    X = rng.normal(size=(150, dim)).astype(np.float32)
    ids = list(range(150))
    rows = [X]
    for src in (0, 1):              # exact duplicates → star edges
        ids.append(1000 + src)
        rows.append(X[src:src + 1])
    for src in (2, 3, 4):           # tight perturbations → cosine ≈ 0.999
        ids.append(2000 + src)
        rows.append((X[src] + 0.02 * rng.normal(size=dim))
                    .astype(np.float32)[None, :])
    Xall = np.concatenate(rows)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(Xall.ravel(), pa.float32()), dim).cast(
        pa.list_(pa.float32()))
    t = pa.table({"vec_id": pa.array(ids, pa.int64()), "embedding": emb})
    pq.write_table(t, tmp_path / "embeddings.parquet")

    exp = expected_embedding_pairs(str(tmp_path / "embeddings.parquet"),
                                   threshold=0.9, n_sets=2)
    got = q_embedding_near_dups(str(tmp_path))

    def key(tb):
        return sorted(zip(tb["id_a"].to_pylist(), tb["id_b"].to_pylist(),
                          tb["cosine"].to_pylist()))

    assert key(got) == key(exp)
    pairs = {(a, b): c for a, b, c in key(exp)}
    for src in (0, 1):              # duplicates guaranteed found
        assert pairs.get((src, 1000 + src)) == 1.0
    assert len(pairs) > 2           # at least one noise-cluster pair too


def test_dangling_media_sidecar_matches_referential(ray_session):
    """Generator-planted dangling refs == the Bloom + exact broadcast
    anti-join output (the flagship_dangling_media gate parity)."""
    import importlib

    E = importlib.import_module("__ray_entry__")
    from sjot_ray.sources.sidecars import expected_dangling_media

    got = E._dangling_media("/root/testdata/sf0.001")
    import pyarrow as _pa

    gt = _pa.concat_tables(list(got.iter_batches(batch_format="pyarrow",
                                                 batch_size=None)))
    exp = expected_dangling_media(2_000, seed=42)
    gs = gt.sort_by("media_ref")
    es = exp.sort_by("media_ref")
    assert gs["media_ref"].equals(es["media_ref"])
    assert gs.column(1).to_pylist() == es["n"].to_pylist()
    assert exp.num_rows > 0


def test_flagship_summary_matches_sidecar(ray_session):
    """verdict_summary == the planted-violation sidecar aggregated per
    rule + the PASS row — pins the _CLASS_RULES mapping the
    flagship_interleaved oracle depends on."""
    import collections

    from sjot_ray.pipelines.flagship import (read_corpus, validated,
                                             verdict_summary)
    from sjot_ray.sources.gen import expected_violations

    n = 2_000
    got = verdict_summary(validated(read_corpus(n, seed=42)))
    exp_v = expected_violations(n, seed=42)
    counts = collections.Counter(exp_v["rule"].to_pylist())
    counts["PASS"] = n - exp_v.num_rows
    exp = sorted(counts.items())
    assert list(zip(got["rule"], got["n"])) == exp
