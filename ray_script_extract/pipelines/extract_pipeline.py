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
                           batch_size: int = 32) -> "ray.data.Dataset":
    import ray

    from ..stages.extract import ExtractorActor
    from ..stages.sizebucket import add_size_stats

    if concurrency is None:
        # autoscaling actor pool sized to the cluster: leave one CPU
        # for the driver/reader, one actor per remaining CPU
        n_cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = (1, max(1, n_cpus - 1))

    ds = ds.map_batches(add_size_stats, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(ExtractorActor, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency,
                        zero_copy_batch=True)
    return ds


def extract_corpus(num_docs: int, seed: int = 42, *,
                   concurrency=None, batch_size: int = 32,
                   skewed: bool = True) -> "ray.data.Dataset":
    from ..corpus import corpus_dataset

    ds = corpus_dataset(num_docs, seed=seed, skewed=skewed)
    return build_extract_pipeline(ds, concurrency=concurrency,
                                  batch_size=batch_size)
