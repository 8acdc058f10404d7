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
        # decompose the list<struct> into flat child arrays once; per-doc
        # text assembly is pure Arrow (filter text spans + binary_join),
        # media-ref hashing is one flat pass, and the shingle histogram is
        # one global bincount over (doc_idx * dim + bucket)
        import pyarrow.compute as pc

        col = batch["spans"].combine_chunks()
        flat = col.values
        offs = col.offsets.to_numpy(zero_copy_only=False)
        n = len(col)
        doc_idx_flat = np.repeat(np.arange(n), np.diff(offs))
        is_text = pc.equal(flat.field("kind"), "text")
        text_mask = is_text.to_numpy(zero_copy_only=False)
        text_counts = np.bincount(doc_idx_flat[text_mask], minlength=n)
        new_off = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(text_counts, out=new_off[1:])
        text_lst = pa.ListArray.from_arrays(
            pa.array(new_off), flat.field("text").filter(is_text)
        )
        doc_texts = pc.binary_join(text_lst, " ").to_pylist()
        hash_list = [
            _shingle_hashes(t or "", self.shingle_k) for t in doc_texts
        ]
        lens = np.array([len(h) for h in hash_list], dtype=np.int64)
        mat = np.zeros((n, self.dim), dtype=np.float64)
        if lens.sum():
            flat_h = np.concatenate([h for h in hash_list if len(h)])
            buckets = (flat_h % np.uint64(self.dim)).astype(np.int64)
            doc_idx = np.repeat(np.arange(n), lens)
            counts = np.bincount(
                doc_idx * self.dim + buckets, minlength=n * self.dim
            )
            mat += counts.reshape(n, self.dim)
        is_media = pc.equal(flat.field("kind"), "media")
        media_mask = is_media.to_numpy(zero_copy_only=False)
        if media_mask.any():
            media_docs = doc_idx_flat[media_mask]
            refs = flat.field("media_ref").filter(is_media).to_pylist()
            mh = _splitmix64(
                np.array(
                    [zlib.crc32((m or "").encode("utf-8")) for m in refs],
                    dtype=np.uint64,
                )
            )
            mbuckets = (mh % np.uint64(self.dim)).astype(np.int64)
            np.add.at(mat, (media_docs, mbuckets), 4.0)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        mat /= norms
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
    # the embedder is stateless, so it runs as a TASK pool (reuses warm
    # Ray workers immediately) rather than paying actor-pool spin-up —
    # measured as part of the scaling runs' serial floor. A model-backed
    # embedder with real per-actor setup would pass the CLASS instead.
    emb = Embedder(dim=dim, shingle_k=shingle_k)
    cap = max(concurrency) if isinstance(concurrency, tuple) else concurrency
    return docs_ds.map_batches(
        emb,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=cap,
        zero_copy_batch=True,
    )
