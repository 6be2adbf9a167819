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
