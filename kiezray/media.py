"""Multimodal column operators: decode / feature-extract / resize /
frame-sample as actor-pool ``map_batches`` stages.

Media payloads are opaque ``binary`` columns with typed metadata (kind,
media_ref). The image/audio codecs are NOT in this container, so the
decode kernels are stubbed: ``strict=True`` raises NotImplementedError at
the decode call (the documented production hook), ``strict=False``
produces a deterministic fake decode derived from the payload bytes so
the Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and testable end to end.

Scale notes: media rows are wide; stages default to small ``batch_size``
and ``batch_format='pyarrow'`` so binary buffers never convert to Python
objects; pools are sized by the caller.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

try:  # gate: not installed in this sandbox
    from PIL import Image  # type: ignore
except ImportError:  # pragma: no cover
    Image = None


def _fake_pixels(payload: bytes, h: int, w: int, c: int = 3) -> np.ndarray:
    """Deterministic stand-in decode: seeded by payload crc, shaped like a
    real decode so downstream kernels are exercised honestly."""
    seed = zlib.crc32(payload or b"\x00")
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


class ImageDecode:
    """binary 'payload' -> fixed-size uint8 RGB tensor column 'pixels'.

    Production: swap the body of ``_decode`` for PIL/libvips (loaded once
    per actor in __init__ — the stateful-stage pattern).
    """

    def __init__(self, height: int = 32, width: int = 32, strict: bool = False):
        self.h = height
        self.w = width
        self.strict = strict
        self.codec = Image  # loaded once per actor when available

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.codec is not None:  # pragma: no cover - codec absent here
            import io

            img = self.codec.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.w, self.h))
            return np.asarray(img, dtype=np.uint8)
        if self.strict:
            raise NotImplementedError(
                "image codec not available in this environment; install "
                "Pillow or run with strict=False for the deterministic stub"
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
    """Deterministic opaque-binary media table for tests/benches."""
    rng = np.random.RandomState(seed)
    ids = [f"m{i:05d}" for i in range(n)]
    payloads = [rng.bytes(rng.randint(256, 4096)) for _ in range(n)]
    kinds = [["image", "video"][i % 2] for i in range(n)]
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "kind": pa.array(kinds),
            "media_ref": pa.array([f"media://synth/{i}" for i in ids]),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
