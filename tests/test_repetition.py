"""Repetition signals (Gopher-style) vs the DuckDB oracle on a
crafted corpus: the sf documents are single-line, so duplicate-line
counting, empty docs/lines and bigram ties are only exercised here."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _write_corpus(tmp_path) -> str:
    import pyarrow.parquet as pq

    texts = [
        # duplicate lines (3x "spam spam", 2x "ham"), one empty line
        "spam spam\nham\nspam spam\n\nham\nspam spam",
        # no duplicates, multi-line
        "alpha beta\ngamma delta epsilon",
        # empty document
        "",
        # whitespace-only document (no non-empty lines, no tokens)
        "  \n\t\n ",
        # bigram tie: "a b" and "b a" both occur twice -> lexicographic
        # tie-break must pick "a b"
        "a b a b a",
        # case matters for lines, not for tokens
        "Same Line\nsame line\nSAME LINE",
        # single token (no bigrams)
        "solo",
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
def test_repetition_matches_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        REPETITION_SQL,
        doc_repetition_signals,
    )

    sf_dir = _write_corpus(tmp_path)
    got = doc_repetition_signals(sf_dir).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql(REPETITION_SQL).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    want = want[got.columns].astype(got.dtypes.to_dict())
    assert got.values.tolist() == want.values.tolist()

    by_id = {r.doc_id: r for r in got.itertuples()}
    # doc 0: 5 non-empty lines, "spam spam" x3 + "ham" x2 -> 3 excess
    assert by_id[0].n_lines == 5
    assert by_id[0].n_dup_lines == 3
    assert by_id[0].dup_line_chars == 2 * len("spam spam") + len("ham")
    assert by_id[0].dup_line_pct == 60
    # top bigram of doc 0 is "spam spam" (3 occurrences)
    assert by_id[0].top_bigram == "spam spam"
    assert by_id[0].top_bigram_count == 3
    # doc 2: empty — all zeros
    assert by_id[2].n_lines == 0
    assert by_id[2].n_dup_lines == 0
    # doc 3: whitespace-only lines are non-empty by the spec
    # (only line <> '' is excluded) but tokenize to nothing
    assert by_id[3].n_lines == 3
    assert by_id[3].n_dup_lines == 0
    for d in (2, 3):
        assert by_id[d].n_bigrams == 0
        assert by_id[d].top_bigram == ""
        assert by_id[d].top_bigram_pct == 0
    # doc 4: tie between "a b" (2) and "b a" (2) -> lexicographic
    assert by_id[4].top_bigram == "a b"
    assert by_id[4].top_bigram_count == 2
    # doc 5: lines are case-sensitive (no dups), tokens lowercased
    # ("same line" bigram appears 3x)
    assert by_id[5].n_dup_lines == 0
    assert by_id[5].top_bigram == "same line"
    assert by_id[5].top_bigram_count == 3
    # doc 6: one token, no bigrams
    assert by_id[6].n_bigrams == 0 and by_id[6].top_bigram == ""
