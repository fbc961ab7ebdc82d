"""The flagship extraction pipeline.

    corpus (Dataset of interleaved docs)
      → map_batches(add_size_stats)            [stateless, vectorized]
      → map_batches(ExtractorActor, pyarrow)   [actor pool, warm state]
      → write_parquet(partitioned) + lineage   [resumable]

Everything streams: no driver-side materialization; blocks flow with
backpressure.  The heavy-doc skew is absorbed by small batch sizes
(an actor picks up at most ``batch_size`` docs at once, so one
400-page outlier never rides with 255 friends).
"""

from __future__ import annotations

from typing import Optional

import ray.data


def build_extract_pipeline(ds: "ray.data.Dataset", *,
                           concurrency=None,
                           batch_size: int = 32,
                           mode: str = "tasks") -> "ray.data.Dataset":
    """mode="tasks" (default): plain task pool with module-level warm
    state — pre-started Ray workers are reused, so the compiled
    predicate tables are built once per worker process.  mode="actors":
    explicit actor pool; use when the stage grows genuinely per-actor
    state (model weights, mutable caches) — on this box a cold 32-actor
    pool costs ~60 s of spawn before the first batch, so it is not the
    default for regex-warm-state-only extraction."""
    import ray

    from ..stages.extract import ExtractorActor, extract_batch
    from ..stages.sizebucket import add_size_stats

    ds = ds.map_batches(add_size_stats, batch_format="pyarrow",
                        zero_copy_batch=True)
    if mode == "actors":
        if concurrency is None:
            n_cpus = int(ray.cluster_resources().get("CPU", 4))
            concurrency = (1, max(1, n_cpus - 1))
        ds = ds.map_batches(ExtractorActor, batch_format="pyarrow",
                            batch_size=batch_size, concurrency=concurrency,
                            zero_copy_batch=True)
    else:
        ds = ds.map_batches(extract_batch, batch_format="pyarrow",
                            batch_size=batch_size, zero_copy_batch=True)
    return ds


def extract_corpus(num_docs: int, seed: int = 42, *,
                   concurrency=None, batch_size: int = 32,
                   skewed: bool = True,
                   docs_per_block: int = 32) -> "ray.data.Dataset":
    from ..corpus import corpus_dataset

    ds = corpus_dataset(num_docs, seed=seed, skewed=skewed,
                        docs_per_block=docs_per_block)
    return build_extract_pipeline(ds, concurrency=concurrency,
                                  batch_size=batch_size)
