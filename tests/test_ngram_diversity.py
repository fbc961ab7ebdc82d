"""ngram_diversity (distinct-n): hand-computed totals/distincts, the
doc-boundary trap (n-grams must never span documents), and DuckDB
oracle equality."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_ngram_diversity_hand_computed(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        NGRAM_DIVERSITY_SQL,
        ngram_diversity,
    )

    # doc0 ends with "b" and doc1 starts with "b": a boundary-spanning
    # bigram would create the never-seen "b b".
    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b a b", "b a"]),
        "lang": pa.array(["en", "en"]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = ngram_diversity(str(tmp_path)).reset_index(drop=True)

    # uni: 6 total, {a, b} distinct; bi: "a b"×2 + "b a"×2 = 4 total,
    # 2 distinct (NOT 5 — no "b b"); tri: "a b a", "b a b" = 2/2.
    assert got["n"].tolist() == [1, 2, 3]
    assert got["n_total"].tolist() == [6, 4, 2]
    assert got["n_distinct"].tolist() == [2, 2, 2]
    assert got["distinct_ppm"].tolist() == [333333, 500000, 1000000]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(NGRAM_DIVERSITY_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ngram_diversity_registry():
    from ray_script_extract.pipelines.queries import ORACLE_SQL, QUERIES

    assert "ngram_diversity" in QUERIES
    assert "ngram_diversity" in ORACLE_SQL
