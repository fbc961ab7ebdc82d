"""Context-window packing: assign every document its token span in
the virtual concatenated training stream and the context windows that
span covers — the concat-and-chop sequence packing LLM pretraining
uses to fill fixed-length contexts without padding.

No reference counterpart; engine-level addition to the curation
family (`pipelines/curation.py`).

The global token offset of doc *d* is a PREFIX SUM over all docs with
smaller doc_id — inherently sequential, distributed here as the
classic two-pass scan:

1. one streamed pass computes per-BUCKET token sums, where a bucket
   is a contiguous doc_id range (``doc_id // bucket_width``) — the
   bucket table is ≤ N/width rows, cumulated on the driver into
   per-bucket offsets (a few MB even at 10^12 docs with width 10^6,
   and it ships to pass 2 as ONE broadcast array, not per task);
2. a second pass co-locates each bucket (`hash_partitioned_map` on
   the bucket id — contiguous ranges, so the within-bucket cumsum is
   exact), sorts by doc_id, and adds the bucket's global offset.

Token counts are RE2 ``\\S+`` matches (Arrow C++ kernel), identical
to DuckDB's ``regexp_extract_all`` — so the whole operator, window
arithmetic included, has an exact SQL oracle (one window-function
cumsum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .joins import sorted_small

from .joins import hash_partitioned_map

_WINDOW = 512           # tokens per context window
_BUCKET_WIDTH = 1 << 12  # doc_ids per prefix-sum bucket


def _token_counts(sf_dir: str):
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def count(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        n = pc.cast(pc.count_substring_regex(batch.column("text"),
                                             r"\S+"), pa.int64())
        bucket = pc.divide(ids, _BUCKET_WIDTH)
        return pa.table({"doc_id": ids, "n_tokens": n,
                         "bucket": pc.cast(bucket, pa.int64())})

    return ds.map_batches(count, batch_format="pyarrow",
                          zero_copy_batch=True)


def pack_context_windows(sf_dir: str, window: int = _WINDOW):
    """``(doc_id, n_tokens, bin_first, bin_last)``: the first and last
    context window (0-based, ``window`` tokens each) the doc occupies
    in the doc_id-ordered concatenated token stream.

    The 3-int token-count projection is materialized once so the
    two-pass scan below doesn't re-read + re-tokenize the full text
    column for pass 2 (24 B/doc in the object store vs a second
    regex pass over every byte of the corpus)."""
    return pack_token_stream(_token_counts(sf_dir).materialize(), window)


def pack_token_stream(tokens: "ray.data.Dataset", window: int = _WINDOW,
                      extra_cols: "tuple[str, ...]" = ()):
    """Two-pass window assignment over ANY (doc_id, n_tokens, bucket)
    dataset — the packing core, shared by ``pack_context_windows``
    (whole corpus) and ``prep_training_mix`` (a curated subset).
    ``extra_cols`` are carried through unchanged (doc-aligned).
    ``tokens`` is consumed twice (bucket sums, then the bucket-wise
    assignment), so callers chaining it after shuffles should pass a
    MATERIALIZED small projection."""
    # pass 1: per-bucket sums → driver cumsum (bounded, see module
    # doc).  Per-BATCH partials (a few rows each — contiguous doc_ids
    # touch ~2 buckets per batch) stream straight to the driver
    # combine; shuffling the full token rows through an exchange for
    # this bounded aggregate would be pure overhead.
    def bucket_partial(t: pa.Table) -> pa.Table:
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        ub, inv = np.unique(b, return_inverse=True)
        acc = np.zeros(len(ub), np.int64)
        np.add.at(acc, inv, n.astype(np.int64))
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n_tokens": pa.array(acc, pa.int64())})

    sums = tokens.map_batches(bucket_partial, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    sums = sums.groupby("bucket", as_index=False)["n_tokens"].sum()
    sums = sums.sort_values("bucket").reset_index(drop=True)
    bucket_ids = sums["bucket"].to_numpy()
    offsets = np.concatenate(
        ([0], np.cumsum(sums["n_tokens"].to_numpy())[:-1]))
    # dense lookup (doc_id is dense here; sparse ids would use a dict)
    table = np.zeros(int(bucket_ids.max()) + 1 if len(bucket_ids) else 1,
                     dtype=np.int64)
    table[bucket_ids] = offsets

    out_cols = ("doc_id", "n_tokens", "bin_first", "bin_last")

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="stable")
        n = df["n_tokens"].to_numpy()
        start = (np.cumsum(n) - n) + table[df["bucket"].to_numpy()]
        last = start + np.maximum(n, 1) - 1
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": n,
            "bin_first": start // window,
            "bin_last": last // window,
        })
        for c in extra_cols:
            out[c] = df[c].to_numpy()
        return out

    # pass 2: exact within-bucket cumsum + the broadcast offsets.
    # hash_partitioned_map may put several buckets in one partition;
    # assign() must therefore cumsum PER BUCKET — sorting by doc_id
    # orders within each bucket, but the cumsum must reset, so group.
    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = pd.DataFrame({c: np.array([], np.int64)
                                for c in out_cols})
            for c in extra_cols:
                out[c] = np.array([], object)
            return out
        return pd.concat(
            [assign(g) for _, g in df.groupby("bucket", sort=True)],
            ignore_index=True)

    return sorted_small(hash_partitioned_map(tokens, ["bucket"], per_partition), "doc_id")


PACK_WINDOWS_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM t
)
SELECT doc_id, n_tokens,
       CAST(s // {_WINDOW} AS BIGINT) AS bin_first,
       CAST((s + GREATEST(n_tokens, 1) - 1) // {_WINDOW} AS BIGINT) AS bin_last
FROM c ORDER BY doc_id
"""
