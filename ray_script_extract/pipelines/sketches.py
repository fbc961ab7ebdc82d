"""Mergeable sketches for single-pass heavy-hitter mining at corpus
scale.

``word_frequency_sketch`` is the approximate twin of
``queries.word_frequency``: a distributed Misra–Gries / SpaceSaving
summary (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries",
PODS 2012 — MG summaries merge by counter-sum + (c+1)-th-largest
decrement, which per-batch compression composes with).  The exact
version shuffles EVERY distinct token; the sketch moves at most
``capacity`` counters per input batch no matter how large the
vocabulary is, which is the difference between a bounded shuffle and
an all-to-all over a 100 TB corpus' token table.

Guarantee (asserted in ``tests/test_sketches.py`` against the exact
counts): with per-batch decrements ``t_b`` and ``E = Σ t_b``,

* every surviving counter is a LOWER bound: ``count_lo ≤ true``;
* no token is undercounted by more than E: ``true ≤ count_lo + E``
  (absent tokens have ``count_lo = 0``, so anything with
  ``true > E`` is guaranteed present in the merged summary);
* ``E ≤ N / capacity`` per batch-compression step, so sizing
  ``capacity ≫ N / min_interesting_count`` makes the top-k exact.

No reference counterpart (the reference is a one-doc converter); this
extends the text-analysis family with the sketch tier the exact
operators can't reach.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# marker row key carrying each batch's decrement; "\x00" can never be
# produced by the whitespace tokenizer (tokens are \S+ runs).
_EPS_KEY = "\x00eps"


def _mg_compress(counts: np.ndarray, capacity: int):
    """One Misra–Gries decrement step: subtract the (capacity+1)-th
    largest count from everything, keep the positive survivors.
    Returns (keep mask or None, lowered surviving counts, decrement);
    a None mask means nothing was dropped."""
    if len(counts) <= capacity:
        return None, counts, 0
    t = int(np.partition(counts, len(counts) - capacity - 1)
            [len(counts) - capacity - 1])
    keep = counts > t
    return keep, counts[keep] - t, t


def word_frequency_sketch(sf_dir: str, k: int = 20, capacity: int = 4096):
    """Approximate global top-k tokens with deterministic error bounds:
    ``(word, count_lo, count_hi)`` sorted by count_lo desc, word asc.

    Shape: per-batch EXACT token counts (Arrow value_counts) are
    MG-compressed to ≤ ``capacity`` counters before anything leaves
    the task; one bounded hash-partitioned reduce sums counters per
    word (counter-sum is the mergeable-summary merge); the global
    decrement total rides along as a marker row and becomes the
    count_hi slack.  The post-shuffle summary is materialized once —
    it is at most (input batches × capacity) rows by construction,
    never vocabulary-sized."""
    from .joins import groupby_agg_partitioned

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["text"])

    def summarize(batch: pa.Table) -> pa.Table:
        words = pc.split_pattern_regex(
            pc.utf8_lower(batch.column("text")), pattern=r"\s+")
        flat = words.combine_chunks().flatten() \
            if isinstance(words, pa.ChunkedArray) else words.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        vals = vc.field("values")
        counts = vc.field("counts").to_numpy(zero_copy_only=False)
        keep, counts, t = _mg_compress(counts, capacity)
        if keep is not None:
            vals = vals.filter(pa.array(keep))  # Arrow-native, no pylist
        return pa.table({
            "word": pa.concat_arrays(
                [vals.cast(pa.string()), pa.array([_EPS_KEY], pa.string())]),
            "cnt": pa.array(np.append(counts, 0).astype(np.int64),
                            pa.int64()),
            "eps": pa.array(np.append(np.zeros(len(counts), np.int64), t),
                            pa.int64()),
        })

    summary = groupby_agg_partitioned(
        ds.map_batches(summarize, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["word"], {"cnt": "sum", "eps": "sum"}).materialize()

    eps_total = int(summary.filter(
        lambda r: r["word"] == _EPS_KEY)
        .to_pandas()["eps"].sum())
    top = (summary.filter(lambda r: r["word"] != _EPS_KEY)
           .sort(["cnt", "word"], descending=[True, False])
           .limit(k).to_pandas())
    return pd.DataFrame({
        "word": top["word"],
        "count_lo": top["cnt"].astype(np.int64),
        "count_hi": (top["cnt"] + eps_total).astype(np.int64),
    })
