"""Multimodal span processing: media payloads as opaque binary with typed
metadata, decode/feature stages as actor pools.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (`FakeMediaDecoder`) — the Ray-side
plumbing (schema, batch sizing for large binary rows, actor signature,
output layout) is real and tested. Swapping in a real decoder is a
one-class change.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

MEDIA_META_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),
    ("payload", pa.binary()),        # opaque media bytes
    ("payload_len", pa.int64()),
])


class FakeMediaFetcher:
    """Stands in for object-store fetch: synthesizes a deterministic
    payload from the media_ref (content = repeatable hash bytes). Real
    deployments replace this with an S3/lance reader; batch size must stay
    small because payload rows are large."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..state.sketches import hash64, rehash

        refs = t["media_ref"]
        h = hash64(refs)
        sizes = (h % np.uint64(4096)).astype(np.int64) + 256
        payloads = []
        for hi, size in zip(h, sizes):
            rng = np.random.default_rng(int(hi) & 0x7FFFFFFF)
            payloads.append(rng.integers(0, 256, int(size),
                                         dtype=np.uint8).tobytes())
        return t.append_column(
            "payload", pa.array(payloads, pa.binary())).append_column(
            "payload_len", pa.array(sizes))


class FakeMediaDecoder:
    """STUB decode/feature-extract stage (no codecs in this container).

    Emits deterministic pseudo-features with the real output layout:
    width/height for images, duration for audio/video, a 16-dim feature
    vector for all kinds. ``NotImplementedError`` on unknown kinds, like a
    real decoder would raise on corrupt payloads."""

    KINDS = {"image", "audio", "video", "table"}

    def __init__(self, feature_dim: int = 16):
        self.dim = feature_dim

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_pylist()
        lens = t["payload_len"].to_numpy(zero_copy_only=False)
        for k in set(kinds):
            if k is not None and k not in self.KINDS:
                raise NotImplementedError(f"no decoder for kind {k!r}")
        width = np.where(np.asarray(kinds) == "image",
                         (lens % 1024) + 16, -1).astype(np.int64)
        height = np.where(np.asarray(kinds) == "image",
                          (lens % 768) + 16, -1).astype(np.int64)
        duration = np.where(np.isin(kinds, ["audio", "video"]),
                            np.round(lens / 100.0, 2), -1.0)
        rng = np.random.default_rng(42)
        base = rng.normal(size=(1, self.dim))
        feats = (lens[:, None] % 97) / 97.0 * base
        return pa.table({
            "doc_id": t["doc_id"],
            "media_ref": t["media_ref"],
            "kind": t["kind"],
            "width": pa.array(width),
            "height": pa.array(height),
            "duration_s": pa.array(duration),
            "features": pa.array(list(np.round(feats, 6)),
                                 pa.list_(pa.float64())),
        })


def media_pipeline(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """spans → media rows → fetch (actor pool, small batches) → decode
    (actor pool) → typed feature rows."""
    def media_rows(t: pa.Table) -> pa.Table:
        spans = t["spans"].combine_chunks() \
            if isinstance(t["spans"], pa.ChunkedArray) else t["spans"]
        lengths = pc.fill_null(pc.list_value_length(t["spans"]), 0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        doc = t["doc_id"].combine_chunks() \
            if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
        doc_rep = doc.take(pa.array(np.repeat(np.arange(t.num_rows),
                                              lengths)))
        flat = spans.flatten()
        out = pa.table({
            "doc_id": doc_rep,
            "media_ref": flat.field("media_ref"),
            "kind": flat.field("kind"),
        })
        return out.filter(pc.is_valid(out["media_ref"]))

    rows = docs.map_batches(media_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    # large binary payloads → SMALL batches so batch×concurrency fits heap
    fetched = rows.map_batches(FakeMediaFetcher, batch_format="pyarrow",
                               batch_size=256, concurrency=(1, 4))
    return fetched.map_batches(FakeMediaDecoder, batch_format="pyarrow",
                               batch_size=256, concurrency=(1, 4))


def q_media_meta(sf_dir: str):
    """Media metadata extraction over the flagship corpus (deterministic
    stub decode; rows-only oracle). Returns per-kind aggregates."""
    import pyarrow.parquet as pq

    from .flagship import read_corpus

    from .flagship import validated

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_docs = min(20_000, max(2_000, 2 * n_events))
    # decode only documents that passed schema validation — the decoder
    # rejects unknown kinds by design, so the validator gates it
    docs = validated(read_corpus(num_docs, seed=42)).map_batches(
        lambda t: t.filter(t["verdict"]), batch_format="pyarrow")
    feats = media_pipeline(docs)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("kind").aggregate(
            [("payload_len", "sum") if "payload_len" in t.column_names
             else ("width", "sum"), ([], "count_all")])
        names = g.column_names
        return g.rename_columns(["kind", names[1], "n"])

    def partial2(t: pa.Table) -> pa.Table:
        g = t.group_by("kind").aggregate([("width", "max"),
                                          ("duration_s", "max"),
                                          ([], "count_all")])
        return g.rename_columns(["kind", "max_width", "max_duration", "n"])

    agg = (feats.map_batches(partial2, batch_format="pyarrow")
           .groupby("kind").max(["max_width", "max_duration"]))
    t = pa.concat_tables(list(agg.iter_batches(batch_format="pyarrow",
                                               batch_size=None)))
    return t.rename_columns(["kind", "max_width", "max_duration"])
