"""source_overlap_matrix: hand-computed pairwise shingle Jaccard,
zero-overlap pairs present, within-source duplicate shingles counted
ONCE (global distinctness across docs and batches), and DuckDB oracle
equality on the crafted corpus."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, rows):
    docs = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array(["en"] * len(rows)),
        "source": pa.array([r[0] for r in rows]),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_source_overlap_hand_computed(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.decontam import (
        SOURCE_OVERLAP_SQL,
        source_overlap_matrix,
    )

    # k=3 word shingles. srcA docs share the shingle "a b c" twice
    # (must count ONCE in srcA's distinct set):
    #   A1 "a b c d"  → {"a b c", "b c d"}
    #   A2 "a b c"    → {"a b c"}            → A = {abc, bcd}, |A| = 2
    #   B  "a b c x"  → {"a b c", "b c x"}   → B, |B| = 2, A∩B = {abc}
    #   C  "q r s"    → {"q r s"}            → disjoint from A and B
    _write_docs(tmp_path, [("srcA", "a b c d"), ("srcA", "a b c"),
                           ("srcB", "a b c x"), ("srcC", "q r s")])

    got = source_overlap_matrix(str(tmp_path)).reset_index(drop=True)

    want_rows = [
        ("srcA", "srcB", 1, 1_000_000 * 1 // 3),   # |A∪B| = 3
        ("srcA", "srcC", 0, 0),
        ("srcB", "srcC", 0, 0),
    ]
    assert [tuple(r) for r in got.itertuples(index=False)] == want_rows

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(SOURCE_OVERLAP_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_source_overlap_registry():
    from ray_script_extract.pipelines.queries import ORACLE_SQL, QUERIES

    assert "source_overlap_matrix" in QUERIES
    assert "source_overlap_matrix" in ORACLE_SQL
