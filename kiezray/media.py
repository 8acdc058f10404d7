"""Multimodal column operators: decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages.

Media payloads are opaque ``binary`` columns with typed metadata (kind,
media_ref). The IMAGE decode path is REAL: a pure-numpy uncompressed
24-bit BMP codec (``decode_bmp``/``encode_bmp``) plus nearest-neighbor
resize, executed end-to-end on the synthetic BMP payloads produced by
``synth_media_table``. Compressed formats (PNG/JPEG) route through PIL
when installed (import-gated; absent in this sandbox). Payloads that no
available codec can read raise under ``strict=True`` or fall back to a
deterministic payload-seeded fake under ``strict=False`` (used by the
VIDEO path, whose codecs stay stubbed).

Scale notes: media rows are wide; stages default to small ``batch_size``
and ``batch_format='pyarrow'`` so binary buffers never convert to Python
objects; pools are sized by the caller.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

try:  # gate: not installed in this sandbox
    from PIL import Image  # type: ignore
except ImportError:  # pragma: no cover
    Image = None


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit bottom-up BMP bytes.

    Standard BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes,
    BGR channel order — readable by any image viewer."""
    h, w, c = pixels.shape
    if c != 3 or pixels.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    img_size = stride * h
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + img_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = pixels[::-1, :, ::-1].reshape(h, row_bytes)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (h, w, 3) uint8 RGB. Pure numpy
    (frombuffer + stride reshape); handles bottom-up and top-down rows."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, offset=offset, count=stride * h)
    rows = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, ::-1])  # BGR -> RGB


def resize_nearest(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure fancy indexing)."""
    ih, iw = img.shape[:2]
    yi = np.arange(h) * ih // h
    xi = np.arange(w) * iw // w
    return img[yi][:, xi]


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decode: seeded by payload crc, shaped like a
    real decode so downstream kernels are exercised honestly."""
    seed = zlib.crc32(payload or b"\x00")
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


class ImageDecode:
    """binary 'payload' -> fixed-size uint8 RGB tensor column 'pixels'.

    Decode ladder (per payload): real pure-numpy BMP codec -> PIL (when
    installed, loaded once per actor — the stateful-stage pattern) ->
    strict error / deterministic fake.
    """

    def __init__(self, height: int = 32, width: int = 32, strict: bool = False):
        self.h = height
        self.w = width
        self.strict = strict
        self.codec = Image  # loaded once per actor when available

    def _decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] == b"BM":
            return resize_nearest(decode_bmp(payload), self.h, self.w)
        if self.codec is not None:  # pragma: no cover - codec absent here
            import io

            img = self.codec.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.w, self.h))
            return np.asarray(img, dtype=np.uint8)
        if self.strict:
            raise NotImplementedError(
                "no codec can read this payload (not BMP; Pillow not "
                "installed); run with strict=False for the deterministic "
                "fallback"
            )
        return _fake_pixels(payload, self.h, self.w)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out = np.stack([self._decode(p or b"") for p in payloads])
        flat = pa.array(out.reshape(len(payloads), -1).ravel(), pa.uint8())
        pixels = pa.FixedSizeListArray.from_arrays(flat, self.h * self.w * 3)
        return batch.append_column("pixels", pixels)


class ImageFeatures:
    """pixels -> small float32 feature vector (channel histograms).

    Pure-numpy and fully real (no stub): the downstream embedding /
    dedup stages consume these exactly like text embeddings.
    """

    def __init__(self, bins: int = 16):
        self.bins = bins
        self.edges = np.linspace(0, 256, bins + 1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch["pixels"].combine_chunks()
        n = len(col)
        width = col.type.list_size
        pix = col.values.to_numpy(zero_copy_only=False).reshape(n, width // 3, 3)
        # one bincount over the whole batch: code = image*(3*bins) +
        # channel*bins + pixel_bin (equivalent to the per-channel histogram
        # with edges linspace(0, 256, bins+1) since pixels are < 256)
        bin_idx = (pix.astype(np.int64) * self.bins) >> 8
        code = (
            np.arange(n, dtype=np.int64)[:, None, None] * (3 * self.bins)
            + np.arange(3, dtype=np.int64)[None, None, :] * self.bins
            + bin_idx
        )
        feats = (
            np.bincount(code.ravel(), minlength=n * 3 * self.bins)
            .reshape(n, 3 * self.bins)
            .astype(np.float32)
        )
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        norms[norms == 0] = 1
        feats /= norms
        flat = pa.array(feats.ravel(), pa.float32())
        return batch.append_column(
            "features", pa.FixedSizeListArray.from_arrays(flat, self.bins * 3)
        )


class FrameSample:
    """binary video 'payload' -> list of frame payload slices.

    Stub decode (no video codec in the container): deterministic byte-range
    sampling standing in for keyframe extraction; schema and fan-out are
    the real contract.
    """

    def __init__(self, n_frames: int = 4, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict:
            raise NotImplementedError(
                "video codec not available; run with strict=False"
            )
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_ids, out_frame_idx, out_bytes = [], [], []
        for d, p in zip(ids, payloads):
            p = p or b"\x00"
            step = max(1, len(p) // self.n_frames)
            for f in range(self.n_frames):
                out_ids.append(d)
                out_frame_idx.append(f)
                out_bytes.append(p[f * step : (f + 1) * step] or b"\x00")
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "frame_idx": pa.array(out_frame_idx, pa.int32()),
                "payload": pa.array(out_bytes, pa.binary()),
            }
        )


def decode_images(
    ds: "ray.data.Dataset",
    height: int = 32,
    width: int = 32,
    strict: bool = False,
    batch_size: int = 64,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Actor-pool image decode; small batches because rows are wide."""
    return ds.map_batches(
        ImageDecode,
        fn_constructor_kwargs={"height": height, "width": width, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def image_features(
    ds: "ray.data.Dataset", bins: int = 16, batch_size: int = 256,
    concurrency=(1, 4),
) -> "ray.data.Dataset":
    return ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"bins": bins},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(
    ds: "ray.data.Dataset", n_frames: int = 4, strict: bool = False,
    batch_size: int = 32, concurrency=(1, 4),
) -> "ray.data.Dataset":
    return ds.map_batches(
        FrameSample,
        fn_constructor_kwargs={"n_frames": n_frames, "strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic binary media table for tests/benches.

    Image rows carry REAL uncompressed 24-bit BMP payloads (random dims
    6..24 px), so the decode stage exercises an actual byte-format codec
    end to end; video rows carry opaque bytes for the (stubbed)
    frame-sampling path."""
    rng = np.random.RandomState(seed)
    ids = [f"m{i:05d}" for i in range(n)]
    kinds = [["image", "video"][i % 2] for i in range(n)]
    payloads = []
    for i in range(n):
        if kinds[i] == "image":
            h = int(rng.randint(6, 25))
            w = int(rng.randint(6, 25))
            pix = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            payloads.append(encode_bmp(pix))
        else:
            payloads.append(rng.bytes(int(rng.randint(256, 4096))))
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "kind": pa.array(kinds),
            "media_ref": pa.array([f"media://synth/{i}" for i in ids]),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """(n,) or (n, ch) int16 PCM -> RIFF/WAVE bytes (canonical 44-byte
    header + data chunk) — readable by any audio tool. Pure struct/numpy."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav expects int16 PCM samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = rate * ch * 2
    block_align = ch * 2
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, ch, rate, byte_rate, block_align, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> "tuple[np.ndarray, int]":
    """RIFF/WAVE PCM16 bytes -> ((n, ch) int16 samples, sample rate).
    Pure numpy (chunk walk + frombuffer); rejects non-PCM16 encodings."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, ch, bits = 12, None, None, None
    samples = None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"decode_wav supports PCM16 only (fmt={fmt_tag}, "
                    f"bits={bits})"
                )
        elif cid == b"data":
            samples = np.frombuffer(
                body[: len(body) - (len(body) % 2)], dtype="<i2"
            )
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    if samples is None or rate is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    if ch > 1:
        samples = samples[: (len(samples) // ch) * ch].reshape(-1, ch)
    else:
        samples = samples[:, None]
    return samples.astype(np.int16), int(rate)


class AudioFeatures:
    """binary 'payload' (WAV PCM16) -> per-clip acoustic features:
    duration_s, rms, zero-crossing rate, spectral centroid (Hz), and
    peak frequency (Hz, argmax of the magnitude spectrum).

    The REAL audio analogue of the BMP image path: an actor-pool stage
    whose decode is an actual byte-format codec (``decode_wav``), with
    the same strict/deterministic-fallback ladder as ``ImageDecode``.
    Per clip the work is numpy kernels over the whole sample buffer (one
    rfft, one sign-change reduction) — the batch loop is over clips, not
    samples."""

    def __init__(self, strict: bool = False, fallback_rate: int = 16000):
        self.strict = strict
        self.fallback_rate = fallback_rate

    def _decode(self, payload: bytes) -> "tuple[np.ndarray, int]":
        if payload[:4] == b"RIFF":
            return decode_wav(payload)
        if self.strict:
            raise NotImplementedError(
                "no codec can read this payload (not RIFF/WAV); run with "
                "strict=False for the deterministic fallback"
            )
        seed = zlib.crc32(payload or b"\x00")
        rng = np.random.RandomState(seed & 0x7FFFFFFF)
        n = 1024 + (seed % 4096)
        fake = (rng.standard_normal(n) * 3000).astype(np.int16)[:, None]
        return fake, self.fallback_rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        dur = np.empty(len(payloads))
        rms = np.empty(len(payloads))
        zcr = np.empty(len(payloads))
        cent = np.empty(len(payloads))
        peak = np.empty(len(payloads))
        for i, p in enumerate(payloads):
            s, rate = self._decode(p or b"")
            x = s[:, 0].astype(np.float64) / 32768.0  # first channel
            n = max(len(x), 1)
            dur[i] = n / rate
            rms[i] = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
            zcr[i] = (
                float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                if len(x) > 1
                else 0.0
            )
            if len(x) > 1:
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(len(x), d=1.0 / rate)
                tot = mag.sum()
                cent[i] = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
                peak[i] = float(freqs[int(np.argmax(mag))])
            else:
                cent[i] = 0.0
                peak[i] = 0.0
        return (
            batch.append_column("duration_s", pa.array(dur, pa.float64()))
            .append_column("rms", pa.array(rms, pa.float64()))
            .append_column("zcr", pa.array(zcr, pa.float64()))
            .append_column("spectral_centroid", pa.array(cent, pa.float64()))
            .append_column("peak_freq_hz", pa.array(peak, pa.float64()))
        )


def audio_features(
    ds: "ray.data.Dataset",
    strict: bool = False,
    concurrency=(1, 4),
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Actor-pool WAV decode + acoustic features (stateful stage: the
    strict/fallback policy binds once per actor in ``__init__``).

    ``concurrency`` is an autoscaling (min, max) range so the pool can
    shrink to 1 actor on small CPU budgets instead of starving the
    upstream stage of scheduling slots (fixed pools the size of the
    whole CPU count deadlock under ``ray.init(num_cpus=4)``)."""
    return ds.map_batches(
        AudioFeatures,
        fn_constructor_kwargs={"strict": strict},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_audio_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic audio table: REAL RIFF/WAVE PCM16 payloads — pure
    tones (known frequency, for spectral-centroid recovery tests) mixed
    with low noise, varying duration and rate."""
    rng = np.random.RandomState(seed)
    ids = [f"a{i:05d}" for i in range(n)]
    payloads = []
    freqs = []
    for _ in range(n):
        rate = int(rng.choice([8000, 16000]))
        dur = float(rng.uniform(0.05, 0.3))
        f = float(rng.uniform(200, min(3000, rate / 2 - 500)))
        t = np.arange(int(rate * dur)) / rate
        x = 0.7 * np.sin(2 * np.pi * f * t)
        x = x + 0.01 * rng.standard_normal(len(t))
        payloads.append(
            encode_wav((np.clip(x, -1, 1) * 32767).astype(np.int16), rate)
        )
        freqs.append(f)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "kind": pa.array(["audio"] * n),
            "media_ref": pa.array([f"media://synth/{i}" for i in ids]),
            "payload": pa.array(payloads, pa.binary()),
            "true_freq": pa.array(freqs, pa.float64()),
        }
    )


def span_stats(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document statistics of the interleaved span payload
    (doc_id, spans: list<struct<kind,text,media_ref,offset>>) -> one row
    per doc: span counts by kind, total text chars, and whether offsets
    are strictly ordered (the span-sequence invariant the whole engine
    must preserve).

    Fully zero-copy Arrow: the list column's offsets + flattened struct
    children feed numpy segment reductions — no per-row Python over the
    nested payload (the interleaved-schema analog of a flat-column
    combiner).
    """
    import pyarrow.compute as _pc

    def stats(t: pa.Table) -> pa.Table:
        n = len(t)
        col = t["spans"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        flat = col.values  # StructArray over every span in the batch
        kinds = flat.field("kind").to_numpy(zero_copy_only=False)
        texts = flat.field("text")
        span_offsets = flat.field("offset").to_numpy(zero_copy_only=False)
        is_text = kinds == "text"
        doc_idx = np.repeat(np.arange(n), counts)
        n_text = np.bincount(doc_idx, weights=is_text, minlength=n)
        text_chars = np.bincount(
            doc_idx,
            weights=_pc.utf8_length(texts)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64),
            minlength=n,
        )
        # strictly-increasing offsets per doc: violations are adjacent
        # pairs within a doc where offset doesn't grow
        ordered = np.ones(n, dtype=bool)
        if len(span_offsets) > 1:
            same_doc = doc_idx[1:] == doc_idx[:-1]
            bad = same_doc & (np.diff(span_offsets) <= 0)
            if bad.any():
                ordered[np.unique(doc_idx[1:][bad])] = False
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pa.array(counts, pa.int64()),
                "n_text_spans": pa.array(n_text.astype(np.int64), pa.int64()),
                "n_media_spans": pa.array(
                    (counts - n_text).astype(np.int64), pa.int64()
                ),
                "text_chars": pa.array(
                    text_chars.astype(np.int64), pa.int64()
                ),
                "offsets_ordered": pa.array(ordered, pa.bool_()),
            }
        )

    return docs_ds.map_batches(
        stats, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Real video path: pure-numpy YUV4MPEG2 (Y4M) codec (public, trivially
# parseable container — the video analog of the BMP/WAV codecs above).
# Cmono (one luma plane per frame); no compression, no external codec.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2 "


def encode_y4m(frames: np.ndarray, fps: "tuple[int, int]" = (25, 1)) -> bytes:
    """(n_frames, h, w) uint8 luma -> Y4M bytes (Cmono)."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    assert f.ndim == 3, "frames must be (n, h, w) luma"
    n, h, w = f.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n".encode()
    marker = b"FRAME\n"
    out = bytearray(head)
    for i in range(n):  # n is small (clips); the per-frame payload is bulk
        out += marker
        out += f[i].tobytes()
    return bytes(out)


def decode_y4m(payload: bytes) -> np.ndarray:
    """Y4M (Cmono) bytes -> (n_frames, h, w) uint8 luma."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    w = h = None
    for tok in payload[len(_Y4M_MAGIC):nl].split(b" "):
        if tok.startswith(b"W"):
            w = int(tok[1:])
        elif tok.startswith(b"H"):
            h = int(tok[1:])
        elif tok.startswith(b"C") and tok != b"Cmono":
            raise ValueError(f"unsupported chroma {tok!r} (Cmono only)")
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    body = payload[nl + 1:]
    stride = 6 + h * w  # b"FRAME\n" + luma plane
    n = len(body) // stride
    if n * stride != len(body):
        raise ValueError("torn Y4M stream")
    raw = np.frombuffer(body, dtype=np.uint8).reshape(n, stride)
    if not (raw[:, :6] == np.frombuffer(b"FRAME\n", np.uint8)).all():
        raise ValueError("bad FRAME marker")
    return np.ascontiguousarray(raw[:, 6:]).reshape(n, h, w)


class Y4mFrameSample:
    """binary Y4M clip -> n evenly-spaced REAL frames, each re-encoded as
    a grayscale BMP payload so the downstream image stages (decode,
    histogram features, near-dup) compose unchanged. Actor-pool stage."""

    def __init__(self, n_frames: int = 4):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_ids, out_idx, out_bytes = [], [], []
        for d, p in zip(ids, payloads):
            frames = decode_y4m(p)
            sel = np.linspace(0, len(frames) - 1, self.n_frames).astype(int)
            for fi in sel:
                gray = frames[fi]
                rgb = np.repeat(gray[:, :, None], 3, axis=2)
                out_ids.append(d)
                out_idx.append(int(fi))
                out_bytes.append(encode_bmp(rgb))
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "payload": pa.array(out_bytes, pa.binary()),
            }
        )


class VideoFeatures:
    """Y4M clip -> per-clip features: frame count/shape, mean/std luma,
    and temporal energy (mean |frame diff|) — all numpy, no codec."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        rows = {
            "doc_id": [], "n_frames": [], "height": [], "width": [],
            "mean_luma": [], "std_luma": [], "temporal_energy": [],
        }
        for d, p in zip(ids, payloads):
            f = decode_y4m(p).astype(np.float64)
            rows["doc_id"].append(d)
            rows["n_frames"].append(f.shape[0])
            rows["height"].append(f.shape[1])
            rows["width"].append(f.shape[2])
            rows["mean_luma"].append(float(f.mean()))
            rows["std_luma"].append(float(f.std()))
            rows["temporal_energy"].append(
                float(np.abs(np.diff(f, axis=0)).mean()) if len(f) > 1 else 0.0
            )
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"]),
                "n_frames": pa.array(rows["n_frames"], pa.int64()),
                "height": pa.array(rows["height"], pa.int64()),
                "width": pa.array(rows["width"], pa.int64()),
                "mean_luma": pa.array(rows["mean_luma"], pa.float64()),
                "std_luma": pa.array(rows["std_luma"], pa.float64()),
                "temporal_energy": pa.array(
                    rows["temporal_energy"], pa.float64()
                ),
            }
        )


def video_features(
    ds: "ray.data.Dataset", batch_size: int = 16, concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Actor-pool per-clip feature extraction over a (doc_id, payload)
    Y4M table; small batches — video rows are wide."""
    return ds.map_batches(
        VideoFeatures,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(
    ds: "ray.data.Dataset", n_frames: int = 4,
    batch_size: int = 16, concurrency=(1, 4),
) -> "ray.data.Dataset":
    """Real keyframe extraction over Y4M clips -> BMP frame rows that the
    image stages consume unchanged."""
    return ds.map_batches(
        Y4mFrameSample,
        fn_constructor_kwargs={"n_frames": n_frames},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def synth_video_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic Y4M clips: drifting gradients with per-clip phase,
    plus planted near-duplicate pairs (same scene, tiny luma offset)."""
    rng = np.random.RandomState(seed)
    ids, payloads = [], []
    h, w = 24, 32
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        base = i - 1 if (i % 8 == 7) else i  # every 8th clip near-dups prior
        # per-clip luma LEVEL (not just phase) so clips are separable by
        # histogram features: each scene occupies a distinct 32-level
        # band; the near-dup copy shifts the band by 2 (tiny mass move)
        level = (base * 29) % 200
        nf = 6 + (base % 4)
        frames = np.empty((nf, h, w), dtype=np.uint8)
        for f in range(nf):
            g = level + (xx + yy * 2 + f * 3) % 32
            if i % 8 == 7:
                g = g + 2  # near-dup: tiny luma shift
            frames[f] = np.clip(g, 0, 255).astype(np.uint8)
        ids.append(int(1000 + i))
        payloads.append(encode_y4m(frames))
    _ = rng  # determinism is structural; rng kept for future jitter knobs
    return pa.table(
        {"doc_id": pa.array(ids, pa.int64()),
         "payload": pa.array(payloads, pa.binary())}
    )


def span_explode(docs_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Interleaved -> flat: one output row per span of the
    (doc_id, spans: list<struct<kind,text,media_ref,offset>>) payload,
    carrying ``span_idx`` (position within its doc) so the nested shape
    is losslessly recoverable by :func:`span_reassemble` (for docs with
    >= 1 span; a zero-span doc has no flat row and so is dropped by the
    roundtrip — carry empty docs around the bridge, not through it).

    The bridge from the interleaved schema to the engine's flat-column
    operators: exploded text spans feed the text stages, media spans the
    decode actor pools, and the processed halves reassemble per doc.
    Zero-copy per batch — list offsets + flattened struct children move
    as Arrow buffers; no per-row Python over the nested payload.
    """

    def explode(t: pa.Table) -> pa.Table:
        col = t["spans"].combine_chunks()
        offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        flat = col.values
        total = int(counts.sum())
        doc_idx = np.repeat(np.arange(len(t)), counts)
        span_idx = np.arange(total) - np.repeat(offs[:-1], counts)
        return pa.table(
            {
                "doc_id": t["doc_id"].take(pa.array(doc_idx)),
                "span_idx": pa.array(span_idx, pa.int64()),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
                "offset": flat.field("offset"),
            }
        )

    return docs_ds.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    )


def span_reassemble(
    spans_ds: "ray.data.Dataset", num_partitions: int = 32
) -> "ray.data.Dataset":
    """Flat -> interleaved: regroup span rows (as emitted by
    :func:`span_explode`, ``span_idx`` preserved through whatever
    per-span processing ran in between) into the nested
    (doc_id, spans) payload, span order restored by ``span_idx``.

    Scale shape: ONE doc_id-hash shuffle (a doc's spans land in exactly
    one partition), then per partition a single lexsort + Arrow
    ListArray rebuild from run offsets — no per-doc dispatch, and the
    nested column is constructed from flat buffers, not Python lists.
    """

    def add_part(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        part = (
            pd.util.hash_array(ids.astype(object)).astype(np.uint64)
            % np.uint64(num_partitions)
        ).astype(np.int32)
        return t.append_column("__part", pa.array(part, pa.int32()))

    span_type = pa.list_(
        pa.struct(
            [
                ("kind", pa.string()),
                ("text", pa.string()),
                ("media_ref", pa.string()),
                ("offset", pa.int32()),
            ]
        )
    )

    def rebuild(g: pa.Table) -> pa.Table:
        if len(g) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.string()),
                 "spans": pa.array([], span_type)}
            )
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        sidx = g["span_idx"].to_numpy(zero_copy_only=False)
        order = np.lexsort((sidx, ids))
        take = pa.array(order)
        sids = ids[order]
        starts_mask = np.concatenate(([True], sids[1:] != sids[:-1]))
        starts = np.flatnonzero(starts_mask)
        offsets = np.append(starts, len(sids)).astype(np.int32)
        values = pa.StructArray.from_arrays(
            [
                g["kind"].combine_chunks().take(take),
                pc.cast(g["text"].combine_chunks().take(take), pa.string()),
                g["media_ref"].combine_chunks().take(take),
                pc.cast(g["offset"].combine_chunks().take(take), pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), values)
        return pa.table(
            {
                "doc_id": g["doc_id"].combine_chunks().take(
                    pa.array(order[starts])
                ),
                "spans": spans,
            }
        )

    return (
        spans_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            rebuild, batch_format="pyarrow"
        )
    )
