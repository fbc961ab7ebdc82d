"""Skew defusal: per-document size stats + log2 size buckets.

A multi-hundred-page document is one indivisible row; left alone, a
few outliers serialize the tail of the extract stage.  We compute
``doc_bytes`` vectorized (Arrow buffer arithmetic, no Python loop),
bucket by ``floor(log2(bytes))``, and the pipeline uses the bucket to
(a) sort/repartition so heavy docs spread across actors early and
(b) shrink ``batch_size`` for the top buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _per_row_text_bytes(spans: pa.ListArray) -> np.ndarray:
    """Sum of UTF-8 byte lengths of span texts per document row."""
    flat = spans.flatten()
    text_len = pc.binary_length(flat.field("text")).to_numpy(zero_copy_only=False)
    text_len = np.nan_to_num(text_len).astype(np.int64)
    offsets = spans.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # offsets may not start at 0 for sliced arrays; normalize
    csum = np.concatenate([[0], np.cumsum(text_len)])
    return csum[offsets[1:] - offsets[0]] - csum[offsets[:-1] - offsets[0]]


def add_size_stats(batch: pa.Table) -> pa.Table:
    spans = batch.column("spans").combine_chunks()
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.chunk(0) if spans.num_chunks else None
    if spans is None or len(batch) == 0:
        return batch.append_column("doc_bytes", pa.array([], pa.int64())) \
                    .append_column("size_bucket", pa.array([], pa.int32()))
    doc_bytes = _per_row_text_bytes(spans)
    bucket = np.floor(np.log2(np.maximum(doc_bytes, 1))).astype(np.int32)
    return batch.append_column("doc_bytes", pa.array(doc_bytes, pa.int64())) \
                .append_column("size_bucket", pa.array(bucket, pa.int32()))
