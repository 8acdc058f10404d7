"""Arrow <-> numpy helpers for embedding list columns (zero-copy paths)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_away(x, digits: int):
    """Round half away from zero — bit-identical to DuckDB's ``round(x, d)``
    on doubles (verified vs DuckDB on 20k random + boundary values).

    ``np.round`` is round-half-to-even with a scaling algorithm that
    disagrees with DuckDB on values like 0.12345 at 4 digits; every output
    that is hash-compared against a DuckDB oracle must use this instead.
    """
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** digits
    out = np.copysign(np.floor(np.abs(x) * scale + 0.5) / scale, x)
    # normalize -0.0 -> +0.0: a value within half an ulp of zero rounds to
    # a zero whose SIGN depends on fp noise (e.g. DuckDB's parallel
    # aggregation makes the DSL min-shift land at ±1 ulp of zero run to
    # run), and byte-level hash compares see -0.0 != 0.0. The matching
    # oracle SQL adds `+ 0` for the same reason.
    return out + 0.0


def int_bincount(codes: np.ndarray, vals, minlength: int) -> np.ndarray:
    """Exact int64 grouped sum: scatter-add ``vals`` into ``minlength``
    buckets keyed by ``codes``.

    ``np.bincount(codes, weights=vals)`` accumulates through float64 and
    is exact only while every per-bucket sum stays below 2^53 — a silent
    precision cliff for int64-cents sums on large batches. ``np.add.at``
    on an int64 accumulator is exact over the full int64 range; use this
    for every integer sum that is hash-compared against a DuckDB oracle.
    """
    out = np.zeros(minlength, dtype=np.int64)
    np.add.at(out, codes, np.asarray(vals, dtype=np.int64))
    return out


def emb_to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """(n, d) float array from a list/fixed_size_list column. Zero-copy for
    fixed_size_list without nulls; raises on ragged rows."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_fixed_size_list(t):
        d = t.list_size
        return col.values.to_numpy(zero_copy_only=False).reshape(len(col), d)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        offsets = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offsets)
        if len(widths) == 0:
            return np.empty((0, 0))
        d = int(widths[0])
        if not (widths == d).all():
            raise ValueError("ragged embedding lists; expected fixed dimension")
        flat = col.values.to_numpy(zero_copy_only=False)
        # offsets may not start at 0 after slicing
        return flat[offsets[0] : offsets[0] + len(col) * d].reshape(len(col), d)
    raise TypeError(f"not a list column: {t}")


def matrix_to_fsl(mat: np.ndarray, dtype: pa.DataType = None) -> pa.FixedSizeListArray:
    """(n, d) -> fixed_size_list array (zero-copy over the flattened buffer)."""
    n, d = mat.shape
    flat = pa.array(np.ascontiguousarray(mat).ravel(), type=dtype)
    return pa.FixedSizeListArray.from_arrays(flat, d)


def matrix_to_list(mat: np.ndarray, value_type: pa.DataType) -> pa.ListArray:
    """(n, k) -> list array with equal-length rows."""
    n, k = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * k, k, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(mat.ravel(), type=value_type))


def matrix_to_binary(mat: np.ndarray) -> pa.BinaryArray:
    """(n, w) fixed-width numeric rows -> binary array, one blob per row.

    Arrow's hash join rejects list payload columns, but fixed-width binary
    rides a join and decodes back with ``binary_to_matrix`` (np.frombuffer
    views, no per-row Python). Construction is zero-copy over the
    row-major buffer."""
    mat = np.ascontiguousarray(mat)
    n = len(mat)
    width = mat.shape[1] if mat.ndim == 2 else 1
    row_bytes = mat.dtype.itemsize * width
    assert (n + 1) * row_bytes < 2**31, "batch overflows int32 binary offsets"
    offsets = np.arange(0, (n + 1) * row_bytes, row_bytes, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(),
        n,
        [
            None,
            pa.py_buffer(offsets.tobytes()),
            pa.py_buffer(mat.tobytes()),
        ],
    )


def binary_to_matrix(col: pa.ChunkedArray | pa.Array, dtype) -> np.ndarray:
    """Inverse of ``matrix_to_binary``: uniform-width binary column ->
    (n, w) array of ``dtype``. Raises on ragged rows or nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dtype = np.dtype(dtype)
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count:
        raise ValueError("binary column with nulls cannot decode to a matrix")
    off_dtype = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset : col.offset + n + 1
    ]
    widths = np.diff(offs)
    w = int(widths[0])
    if not (widths == w).all():
        raise ValueError("ragged binary rows; expected fixed width")
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    flat = np.ascontiguousarray(data[offs[0] : offs[0] + n * w])
    return flat.view(dtype).reshape(n, w // dtype.itemsize)
