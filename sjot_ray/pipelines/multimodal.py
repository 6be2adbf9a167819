"""Multimodal span processing: media payloads as opaque binary with typed
metadata; decode / feature-extract / resize / frame-sample as Ray stages.

This container ships no image/audio codec libraries, so the pipeline uses
CODEC-FREE formats that decode with pure numpy + struct — uncompressed
24-bit BMP for images, PCM16 WAV for audio, a length-prefixed container
of BMP frames for video, CSV bytes for tables. The fetch stage
synthesizes deterministic payloads in those REAL formats (a deployment
replaces it with an S3/Lance reader); the decode stage genuinely parses
the bytes — header validation, pixel/sample extraction, FFT band
energies, nearest-neighbor resize, frame sampling. Corrupt payloads
raise, like any decoder.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

FEATURE_DIM = 16

MEDIA_META_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("media_ref", pa.string()),
    ("kind", pa.string()),
    ("payload", pa.binary()),        # opaque media bytes
    ("payload_len", pa.int64()),
])


# -- codec-free encoders/decoders (numpy + struct only) ----------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → uncompressed 24-bit bottom-up BMP."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                      2835, 2835, 0, 0)
    pad = b"\x00" * (row_size - w * 3)
    rows = [pixels[y, :, ::-1].tobytes() + pad for y in range(h - 1, -1, -1)]
    return header + dib + b"".join(rows)


def decode_bmp(b: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB; raises ValueError on corrupt."""
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    hdr_sz, w, h, _planes, bpp = struct.unpack_from("<IiiHH", b, 14)
    if bpp != 24 or hdr_sz < 40 or w <= 0 or h == 0:
        raise ValueError(f"unsupported BMP (bpp={bpp})")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    if len(b) < off + row_size * h:
        raise ValueError("truncated BMP payload")
    raw = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=off)
    rows = raw.reshape(h, row_size)[:, :w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → PCM16 RIFF/WAVE."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack("<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                      b"WAVE", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                      b"data", len(data))
    return hdr + data


def decode_wav(b: bytes):
    """WAV bytes → (rate, int16 ndarray); raises ValueError on corrupt."""
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    fmt, channels, rate = struct.unpack_from("<HHI", b, 20)
    bits = struct.unpack_from("<H", b, 34)[0]
    if fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("unsupported WAV encoding")
    n = struct.unpack_from("<I", b, 40)[0]
    return rate, np.frombuffer(b, dtype="<i2", count=n // 2, offset=44)


def encode_video(frames: list[np.ndarray]) -> bytes:
    """list of (h, w, 3) frames → 'VIDF' + count + len-prefixed BMPs."""
    parts = [b"VIDF", struct.pack("<I", len(frames))]
    for f in frames:
        bmp = encode_bmp(f)
        parts.append(struct.pack("<I", len(bmp)))
        parts.append(bmp)
    return b"".join(parts)


def decode_video_frames(b: bytes, sample_every: int = 1):
    """VIDF container → (n_frames, sampled decoded frames)."""
    if len(b) < 8 or b[:4] != b"VIDF":
        raise ValueError("not a VIDF payload")
    n = struct.unpack_from("<I", b, 4)[0]
    off = 8
    frames = []
    for i in range(n):
        ln = struct.unpack_from("<I", b, off)[0]
        off += 4
        if i % sample_every == 0:
            frames.append(decode_bmp(b[off:off + ln]))
        off += ln
    return n, frames


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy)."""
    sy = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    sx = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[sy[:, None], sx[None, :]]


def _image_features(img: np.ndarray) -> np.ndarray:
    """16-dim: mean/std per RGB channel + 10-bin grayscale histogram."""
    f = np.empty(FEATURE_DIM)
    x = img.astype(np.float64)
    f[0:3] = x.mean(axis=(0, 1)) / 255.0
    f[3:6] = x.std(axis=(0, 1)) / 255.0
    gray = x.mean(axis=2).ravel()
    hist, _ = np.histogram(gray, bins=10, range=(0, 255))
    f[6:16] = hist / max(1, gray.size)
    return f


def _audio_features(samples: np.ndarray) -> np.ndarray:
    """16-dim: RMS, zero-crossing rate, 14 FFT band energies."""
    f = np.zeros(FEATURE_DIM)
    if len(samples) == 0:
        return f
    x = samples.astype(np.float64) / 32768.0
    f[0] = np.sqrt(np.mean(x * x))
    f[1] = np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))
    spec = np.abs(np.fft.rfft(x))
    bands = np.array_split(spec, 14)
    f[2:16] = [b.mean() if len(b) else 0.0 for b in bands]
    return f


# -- Ray stages --------------------------------------------------------------

def media_params(hi: int, kind: str):
    """Planted ground-truth parameter draws for one synthesized payload.

    Returns ``(meta, rng)``: ``meta`` holds the metadata the decode stage
    must recover (width/height/duration_s/n_frames, -1/-1.0 where not
    applicable, plus private ``_``-prefixed synthesis params) and ``rng``
    is positioned to draw the payload body. Shared by :class:`MediaFetcher`
    (synthesis) and ``sources.sidecars.expected_media_meta`` (the
    engine-independent oracle sidecar): the dims/duration are fixed here,
    BEFORE any encode/decode, so the decode pipeline's output can be
    checked against them as ground truth."""
    rng = np.random.default_rng(int(hi) & 0x7FFFFFFF)
    if kind == "image":
        w, hh = int(rng.integers(8, 33)), int(rng.integers(8, 33))
        meta = {"width": w, "height": hh, "duration_s": -1.0,
                "n_frames": -1}
    elif kind == "audio":
        rate = 8000
        n = int(rng.integers(800, 8001))
        meta = {"width": -1, "height": -1,
                "duration_s": round(n / rate, 4), "n_frames": -1,
                "_n": n, "_rate": rate}
    elif kind == "video":
        nf = int(rng.integers(2, 7))
        w, hh = int(rng.integers(8, 17)), int(rng.integers(8, 17))
        # duration is decoder-derived at the default MediaDecoder fps
        meta = {"width": w, "height": hh,
                "duration_s": round(nf / 10.0, 4), "n_frames": nf}
    else:  # table → CSV bytes
        rows = int(rng.integers(2, 8))
        meta = {"width": -1, "height": -1, "duration_s": -1.0,
                "n_frames": -1, "_rows": rows}
    return meta, rng


class MediaFetcher:
    """Stands in for object-store fetch: synthesizes a deterministic
    payload in a REAL codec-free format per (media_ref, kind). A
    deployment replaces this class with an S3/Lance reader; batch size
    stays small because payload rows are large."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..state.sketches import hash64

        refs = t["media_ref"]
        kinds = t["kind"].to_pylist()
        h = hash64(refs)
        payloads = []
        for hi, kind in zip(h, kinds):
            meta, rng = media_params(int(hi), kind)
            if kind == "image":
                payloads.append(encode_bmp(rng.integers(
                    0, 256, (meta["height"], meta["width"], 3),
                    dtype=np.uint8)))
            elif kind == "audio":
                n, rate = meta["_n"], meta["_rate"]
                ts = np.arange(n) / rate
                freq = float(rng.uniform(100, 1000))
                x = (np.sin(2 * np.pi * freq * ts) * 12000
                     + rng.normal(0, 800, n)).astype(np.int16)
                payloads.append(encode_wav(x, rate))
            elif kind == "video":
                payloads.append(encode_video(
                    [rng.integers(0, 256,
                                  (meta["height"], meta["width"], 3),
                                  dtype=np.uint8)
                     for _ in range(meta["n_frames"])]))
            else:  # table → CSV bytes
                csv = "a,b,c\n" + "\n".join(
                    ",".join(str(int(v)) for v in rng.integers(0, 100, 3))
                    for _ in range(meta["_rows"]))
                payloads.append(csv.encode())
        arr = pa.array(payloads, pa.binary())
        return t.append_column("payload", arr).append_column(
            "payload_len", pc.cast(pc.binary_length(arr), pa.int64()))


class MediaDecoder:
    """Decode + feature-extract stage: parses the REAL payload bytes
    (BMP/WAV/VIDF/CSV) with numpy+struct; raises on unknown kinds or
    corrupt payloads like any decoder. Emits width/height (images,
    first video frame), duration_s (audio/video), n_frames (video) and
    a 16-dim feature vector per row."""

    KINDS = {"image", "audio", "video", "table"}

    def __init__(self, frame_sample_every: int = 2,
                 video_fps: float = 10.0):
        self.every = frame_sample_every
        self.fps = video_fps

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        n = t.num_rows
        width = np.full(n, -1, dtype=np.int64)
        height = np.full(n, -1, dtype=np.int64)
        duration = np.full(n, -1.0)
        n_frames = np.full(n, -1, dtype=np.int64)
        feats = np.zeros((n, FEATURE_DIM))
        for i, (kind, b) in enumerate(zip(kinds, payloads)):
            if kind not in self.KINDS:
                raise NotImplementedError(f"no decoder for kind {kind!r}")
            if kind == "image":
                img = decode_bmp(b)
                height[i], width[i] = img.shape[0], img.shape[1]
                feats[i] = _image_features(img)
            elif kind == "audio":
                rate, samples = decode_wav(b)
                duration[i] = round(len(samples) / rate, 4)
                feats[i] = _audio_features(samples)
            elif kind == "video":
                total, frames = decode_video_frames(b, self.every)
                n_frames[i] = total
                duration[i] = round(total / self.fps, 4)
                if frames:
                    height[i], width[i] = frames[0].shape[:2]
                    feats[i] = np.mean([_image_features(f)
                                        for f in frames], axis=0)
            else:  # table: CSV → shape + numeric means
                lines = b.decode().strip().splitlines()
                cells = [ln.split(",") for ln in lines[1:]]
                vals = np.asarray(cells, dtype=np.float64) \
                    if cells else np.zeros((0, 0))
                feats[i, 0] = len(lines) - 1
                feats[i, 1] = vals.shape[1] if vals.size else 0
                if vals.size:
                    m = vals.mean(axis=0)[:FEATURE_DIM - 2]
                    feats[i, 2:2 + len(m)] = m / 100.0
        return pa.table({
            "doc_id": t["doc_id"],
            "media_ref": t["media_ref"],
            "kind": t["kind"],
            "width": pa.array(width),
            "height": pa.array(height),
            "duration_s": pa.array(np.round(duration, 4)),
            "n_frames": pa.array(n_frames),
            "features": pa.array(list(np.round(feats, 6)),
                                 pa.list_(pa.float64())),
        })


class ImageResizer:
    """Thumbnailing stage: decode BMP → nearest-neighbor resize →
    re-encode BMP (non-image rows pass through with a null thumbnail)."""

    def __init__(self, size: int = 16):
        self.size = size

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds = t["kind"].to_pylist()
        payloads = t["payload"].to_pylist()
        thumbs = [
            encode_bmp(resize_nearest(decode_bmp(b), self.size, self.size))
            if k == "image" else None
            for k, b in zip(kinds, payloads)]
        return t.append_column("thumbnail", pa.array(thumbs, pa.binary()))


def media_pipeline(docs: "ray.data.Dataset",
                   with_thumbnails: bool = False) -> "ray.data.Dataset":
    """spans → media rows → fetch (small batches — large binary rows) →
    [resize] → decode/feature-extract → typed feature rows."""
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
    fetched = rows.map_batches(MediaFetcher, batch_format="pyarrow",
                               batch_size=256, concurrency=(1, 8))
    if with_thumbnails:
        fetched = fetched.map_batches(ImageResizer, batch_format="pyarrow",
                                      batch_size=256, concurrency=(1, 8))
    return fetched.map_batches(MediaDecoder, batch_format="pyarrow",
                               batch_size=256, concurrency=(1, 8))


def q_media_meta(sf_dir: str):
    """Media metadata extraction over the flagship corpus (real
    numpy/struct decode of synthesized BMP/WAV/VIDF/CSV payloads;
    rows-only oracle). Returns per-kind aggregates."""
    import pyarrow.parquet as pq

    from .flagship import read_corpus, validated

    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    num_docs = min(20_000, max(2_000, 2 * n_events))
    # decode only documents that passed schema validation — the decoder
    # rejects unknown kinds by design, so the validator gates it
    docs = validated(read_corpus(num_docs, seed=42)).map_batches(
        lambda t: t.filter(t["verdict"]), batch_format="pyarrow")
    feats = media_pipeline(docs)

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
