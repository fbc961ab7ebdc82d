"""JSONL interchange round-trip: write_corpus_jsonl → files that a
non-Arrow consumer can read line-by-line → read_corpus_jsonl restores
the exact DOC_SCHEMA table (int32 offsets, canonical struct field
order) and feeds the extraction pipeline identically to parquet."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_jsonl_round_trip(tmp_path):
    from ray_script_extract.corpus import corpus_dataset
    from ray_script_extract.pipelines.extract_pipeline import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )
    from ray_script_extract.schema import DOC_SCHEMA

    out = str(tmp_path / "corpus_jsonl")
    ds = corpus_dataset(24, seed=7)
    write_corpus_jsonl(ds, out)

    # the files really are line-delimited JSON a plain consumer can read
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert files
    with open(os.path.join(out, sorted(files)[0])) as fh:
        first = json.loads(fh.readline())
    assert set(first) == {"doc_id", "spans"}
    assert {"kind", "text", "media_ref", "offset"} <= set(first["spans"][0])

    back = read_corpus_jsonl(out)
    assert back.schema().base_schema.equals(DOC_SCHEMA)

    want = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
    for a, b in zip(got["spans"], want["spans"]):
        la = [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in a]
        lb = [(s["kind"], s["text"], s["media_ref"], s["offset"])
              for s in b]
        assert la == lb


@pytest.mark.usefixtures("ray_session")
def test_jsonl_feeds_extraction(tmp_path):
    from ray_script_extract.corpus import corpus_dataset
    from ray_script_extract.pipelines.extract_pipeline import (
        build_extract_pipeline,
        read_corpus_jsonl,
        write_corpus_jsonl,
    )

    out = str(tmp_path / "corpus_jsonl")
    ds = corpus_dataset(12, seed=11)
    write_corpus_jsonl(ds, out)

    def spans_df(d):
        df = d.to_pandas()
        rows = []
        for _, r in df.iterrows():
            for s in r["spans"]:
                rows.append((r["doc_id"], s["kind"], s["text"]))
        return pd.DataFrame(rows, columns=["doc_id", "kind", "text"]) \
                 .sort_values(["doc_id", "kind", "text"]) \
                 .reset_index(drop=True)

    via_jsonl = spans_df(build_extract_pipeline(read_corpus_jsonl(out)))
    direct = spans_df(build_extract_pipeline(corpus_dataset(12, seed=11)))
    pd.testing.assert_frame_equal(via_jsonl, direct)


@pytest.mark.usefixtures("ray_session")
def test_jsonl_gzip_round_trip(tmp_path):
    """Compressed shards (.jsonl.gz — the wire format corpus drops
    arrive in): write plain, gzip the shards, read back with
    autodetected compression; identical table."""
    import gzip
    import shutil

    from ray_script_extract.corpus import corpus_dataset
    from ray_script_extract.pipelines.extract_pipeline import (
        read_corpus_jsonl,
        write_corpus_jsonl,
    )
    from ray_script_extract.schema import DOC_SCHEMA

    plain = str(tmp_path / "plain")
    gz = str(tmp_path / "gz")
    os.makedirs(gz)
    ds = corpus_dataset(12, seed=9)
    write_corpus_jsonl(ds, plain)
    for f in os.listdir(plain):
        with open(os.path.join(plain, f), "rb") as src, \
                gzip.open(os.path.join(gz, f + ".gz"), "wb") as dst:
            shutil.copyfileobj(src, dst)

    back = read_corpus_jsonl(gz)  # .gz suffix autodetects gzip
    assert back.schema().base_schema.equals(DOC_SCHEMA)
    want = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(want["doc_id"])
