"""Deterministic embedding stage over interleaved-span documents.

The reference consumes precomputed KG embeddings; this engine derives
embeddings from the document table itself (SURVEY.md §1): hashed character
3-gram counts over the concatenated text spans plus hashed media_ref
tokens, L2-normalized — deterministic, vocabulary-free, and stable under
the duplicate perturbations the generator applies.

Runs as a ``map_batches`` actor-pool stage over zero-copy Arrow batches;
the spans column passes through untouched (per-row span-sequence equality
is the pipeline invariant).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data

from .arrowutil import matrix_to_fsl
from .dedup import _shingle_hashes, _splitmix64


def doc_text_and_media(spans_value: list[dict]) -> tuple[str, list[str]]:
    texts = []
    media = []
    for s in spans_value:
        if s["kind"] == "text":
            texts.append(s["text"])
        elif s["kind"] == "media":
            media.append(s["media_ref"])
    return " ".join(texts), media


def embed_text(
    text: str, media: list[str], dim: int, shingle_k: int = 5
) -> np.ndarray:
    h = _shingle_hashes(text, shingle_k)
    vec = np.zeros(dim, dtype=np.float64)
    if len(h):
        np.add.at(vec, (h % np.uint64(dim)).astype(np.int64), 1.0)
    for m in media:
        mh = _splitmix64(
            np.array([zlib.crc32(m.encode("utf-8"))], dtype=np.uint64)
        )[0]
        vec[int(mh % np.uint64(dim))] += 4.0  # media refs are strong signals
    n = np.linalg.norm(vec)
    return vec / n if n > 0 else vec


class Embedder:
    """Actor-pool stage: (doc_id, spans) -> + (embedding fsl<float32, dim>,
    text len features). Stateless math but class-form so per-actor setup
    (dim tables, future model weights) is paid once."""

    def __init__(self, dim: int = 512, shingle_k: int = 5):
        self.dim = dim
        self.shingle_k = shingle_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        spans = batch["spans"].to_pylist()
        mat = np.empty((len(spans), self.dim), dtype=np.float64)
        for i, sp in enumerate(spans):
            text, media = doc_text_and_media(sp or [])
            mat[i] = embed_text(text, media, self.dim, self.shingle_k)
        return batch.append_column(
            "embedding", matrix_to_fsl(mat.astype(np.float32), pa.float32())
        )


def embed_docs(
    docs_ds: "ray.data.Dataset",
    dim: int = 512,
    shingle_k: int = 5,
    batch_size: int = 1024,
    concurrency=(1, 8),
) -> "ray.data.Dataset":
    return docs_ds.map_batches(
        Embedder,
        fn_constructor_kwargs={"dim": dim, "shingle_k": shingle_k},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
