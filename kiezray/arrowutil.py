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
