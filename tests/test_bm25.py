"""Boundary tests for quantized BM25 (`bm25_search`): rare-term idf
dominance, document-length normalization, no-hit exclusion, and the
doc_id tiebreak must agree with the DuckDB integer oracle on a
crafted corpus (the sf tables' vocabulary is too uniform to pin the
ranking behavior)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_bm25_ranking_boundaries(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        BM25_SQL,
        bm25_search,
    )

    filler = "pad " * 6
    texts = [
        "dup dup " + filler,            # 0: rare term twice, short doc
        "dup " + filler,                # 1: rare term once
        "join join join " + filler,     # 2: common term often
        "join " + filler * 40,          # 3: common term, LONG doc
        "join " + filler,               # 4: identical stats to 5 -> tie
        "join " + filler,               # 5: tie broken by doc_id
        "nothing relevant here",        # 6: no query term -> excluded
        "",                             # 7: empty doc -> excluded
        # make 'join' common: more one-hit docs (exactly 10 docs match
        # a query term, so every matcher fits the k=10 result)
        *["join " + filler * 2] * 4,
    ]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))

    got = bm25_search(str(tmp_path)).to_pandas().reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    want = con.execute(BM25_SQL).df()
    cast = {c: np.int64 for c in want.columns}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))

    ranked = got["doc_id"].tolist()
    # rare 'dup' (df=2) outranks common 'join' (df=12); tf=2 beats tf=1
    assert ranked[:2] == [0, 1]
    # excluded docs never appear
    assert 6 not in ranked and 7 not in ranked
    # length normalization: doc 3 (long) scores below doc 4 (short),
    # same single 'join' hit
    s = got.set_index("doc_id")["score_q"]
    assert s.loc[4] > s.loc[3]
    # exact tie between 4 and 5 -> doc_id ascending
    assert s.loc[4] == s.loc[5]
    i4, i5 = ranked.index(4), ranked.index(5)
    assert i4 < i5
