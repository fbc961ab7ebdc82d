"""shared_passages (MOSS-style winnow-fingerprint pairing) vs its
DuckDB oracle on a crafted corpus with a known copied passage, plus
the df-cap (boilerplate suppression) behavior."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _write_corpus(tmp_path) -> str:
    import pyarrow.parquet as pq

    passage = ("the quick brown fox jumps over the lazy dog while "
               "the band plays on")
    boiler = "all rights reserved contact us terms of service"
    texts = [
        f"intro words first. {passage} closing remark alpha.",
        f"completely different opening! {passage} and a tail beta.",
        "nothing in common here at all, just some filler gamma words.",
        f"another unrelated doc delta epsilon zeta. {boiler}",
        f"more unrelated text eta theta iota. {boiler}",
        f"third boilerplate carrier kappa lambda. {boiler}",
    ]
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * n, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    sf_dir = str(tmp_path)
    pq.write_table(t, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


@pytest.mark.usefixtures("ray_session")
def test_shared_passages_matches_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        SHARED_PASSAGES_SQL,
        shared_passages,
    )

    sf_dir = _write_corpus(tmp_path)
    got = shared_passages(sf_dir).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql(SHARED_PASSAGES_SQL).df()
    got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    want = want.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    want = want[list(got.columns)].astype(got.dtypes.to_dict())
    assert got.values.tolist() == want.values.tolist()

    pairs = {(a, b) for a, b in zip(got["id_a"], got["id_b"])}
    # the copied 69-char passage must pair docs 0 and 1 (winnowing
    # guarantees >=1 shared fp for any match >= k+w-1 = 11 chars;
    # a passage this long yields many)
    assert (0, 1) in pairs
    # doc 2 shares nothing
    assert not any(2 in p for p in pairs)
    # boilerplate docs 3/4/5 share a real passage too (df=3 < cap)
    assert (3, 4) in pairs and (3, 5) in pairs and (4, 5) in pairs


@pytest.mark.usefixtures("ray_session")
def test_df_cap_suppresses_hot_fingerprints(tmp_path):
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.text_analysis import shared_passages

    # the same passage in EVERY doc: with max_df below the corpus
    # size all its fingerprints are dropped -> no pairs at all
    passage = "identical shared passage appearing in every document here"
    texts = [f"doc {i} unique prefix {i * 7} then {passage}"
             for i in range(6)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    sf_dir = str(tmp_path)
    pq.write_table(t, os.path.join(sf_dir, "documents.parquet"))

    capped = shared_passages(sf_dir, max_df=5).to_pandas()
    uncapped = shared_passages(sf_dir, max_df=6).to_pandas()
    assert len(uncapped) == 15  # all C(6,2) pairs share the passage
    assert len(capped) < len(uncapped)
