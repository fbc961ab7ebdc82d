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


HEAVY_BUCKET_THRESHOLD = 17  # 2^17 = 128 KiB of span text


def build_extract_pipeline(ds: "ray.data.Dataset", *,
                           concurrency=None,
                           batch_size: int = 32,
                           mode: str = "tasks",
                           skew_defuse: bool = False) -> "ray.data.Dataset":
    """mode="tasks" (default): plain task pool with module-level warm
    state — pre-started Ray workers are reused, so the compiled
    predicate tables are built once per worker process.  mode="actors":
    explicit actor pool; use when the stage grows genuinely per-actor
    state (model weights, mutable caches) — on this box a cold 32-actor
    pool costs ~60 s of spawn before the first batch, so it is not the
    default for regex-warm-state-only extraction.

    skew_defuse=True splits the stream on the size bucket: heavy docs
    (≥ 2^17 bytes of span text — multi-hundred-page outliers) go
    through the extract stage at batch_size=1 so one outlier never
    rides in a batch with many friends (and never pins a whole block's
    worth of light docs behind it); the light branch keeps the large
    batch size. The two branches re-union afterwards — order across
    branches is not span order (per-doc spans stay ordered)."""
    import pyarrow.compute as pc

    import ray

    from ..stages.extract import ExtractorActor, extract_batch
    from ..stages.sizebucket import add_size_stats

    ds = ds.map_batches(add_size_stats, batch_format="pyarrow",
                        zero_copy_batch=True)

    def run_extract(d: "ray.data.Dataset", bs) -> "ray.data.Dataset":
        if mode == "actors":
            conc = concurrency
            if conc is None:
                n_cpus = int(ray.cluster_resources().get("CPU", 4))
                conc = (1, max(1, n_cpus - 1))
            return d.map_batches(ExtractorActor, batch_format="pyarrow",
                                 batch_size=bs, concurrency=conc,
                                 zero_copy_batch=True)
        return d.map_batches(extract_batch, batch_format="pyarrow",
                             batch_size=bs, zero_copy_batch=True)

    if skew_defuse:
        def _split(keep_heavy: bool):
            def fn(batch):
                mask = pc.greater_equal(batch.column("size_bucket"),
                                        HEAVY_BUCKET_THRESHOLD)
                if not keep_heavy:
                    mask = pc.invert(mask)
                return batch.filter(mask)
            return fn

        heavy = ds.map_batches(_split(True), batch_format="pyarrow",
                               zero_copy_batch=True)
        light = ds.map_batches(_split(False), batch_format="pyarrow",
                               zero_copy_batch=True)
        return run_extract(heavy, 1).union(run_extract(light, batch_size))
    return run_extract(ds, batch_size)


def read_corpus(path: str) -> "ray.data.Dataset":
    """Read an interleaved-document corpus table.

    Lance is the production table format (BASELINE.json north rule:
    "Lance tables of interleaved text + media documents"); this
    container does not ship the ``lance`` package, so the gated
    fallback reads the same Arrow schema from parquet — identical
    downstream pipeline either way (`ray.data.read_lance` and
    `read_parquet` both yield zero-copy Arrow blocks)."""
    try:
        import lance  # noqa: F401

        return ray.data.read_lance(path)
    except ImportError:
        return ray.data.read_parquet(path)


def write_corpus(ds: "ray.data.Dataset", path: str) -> None:
    """Write the corpus table (Lance when available, else parquet)."""
    try:
        import lance  # noqa: F401

        ds.write_lance(path)
    except ImportError:
        ds.write_parquet(path)


def write_corpus_jsonl(ds: "ray.data.Dataset", path: str) -> None:
    """JSONL interchange sink: one ``{"doc_id": ..., "spans": [{kind,
    text, media_ref, offset}, ...]}`` object per line, one file per
    block — the lingua franca for handing a corpus to a non-Arrow
    consumer.  Streaming: each block is serialized and written by its
    own task, the driver never sees document bytes."""
    ds.write_json(path)


def read_corpus_jsonl(path: str,
                      compression: str | None = None) -> "ray.data.Dataset":
    """JSONL interchange source: parses shard files in parallel
    (pyarrow's block JSON reader, not a Python per-line loop) and
    restores the canonical ``DOC_SCHEMA`` — JSON has no int32 or
    struct-field ordering, so the span structs are rebuilt
    column-by-column instead of relying on ``cast``.

    ``compression``: compressed shards (`.jsonl.gz` — the wire format
    most corpus drops arrive in) decompress inside each read task,
    never on the driver.  Arrow autodetects the codec from a ``.gz``
    file suffix (round-tripped in tests/test_jsonl_corpus.py); pass
    "gzip" (or any pyarrow stream codec) explicitly for shards
    without the suffix."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..schema import DOC_SCHEMA, SPAN_STRUCT

    def to_schema(tbl: pa.Table) -> pa.Table:
        col = tbl.column("spans")
        # list_flatten/list_value_length are slice- and chunk-proof,
        # unlike raw .offsets arithmetic on possibly-sliced ListArrays
        vals = pc.list_flatten(col).combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [vals.field("kind").cast(pa.string()),
             vals.field("text").cast(pa.string()),
             vals.field("media_ref").cast(pa.string()),
             vals.field("offset").cast(pa.int32())],
            fields=list(SPAN_STRUCT))
        spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                         struct)
        return pa.table({"doc_id": tbl.column("doc_id").cast(pa.string()),
                         "spans": spans}, schema=DOC_SCHEMA)

    if compression is None and path.endswith(".gz"):
        compression = "gzip"
    kw = {}
    if compression is not None:
        kw = {"arrow_open_stream_args": {"compression": compression},
              "file_extensions": None}
    return ray.data.read_json(path, **kw).map_batches(
        to_schema, batch_format="pyarrow", zero_copy_batch=True)


def extract_corpus(num_docs: int, seed: int = 42, *,
                   concurrency=None, batch_size: int = 32,
                   skewed: bool = True,
                   docs_per_block: int = 32) -> "ray.data.Dataset":
    from ..corpus import corpus_dataset

    ds = corpus_dataset(num_docs, seed=seed, skewed=skewed,
                        docs_per_block=docs_per_block)
    return build_extract_pipeline(ds, concurrency=concurrency,
                                  batch_size=batch_size)
