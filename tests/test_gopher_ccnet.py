"""Gopher composite quality rules + CCNet per-language tertile
buckets: hand-crafted rule-boundary docs, NTILE size/tie semantics,
and DuckDB oracle equality on the crafted corpus (both operators are
integer-exact end-to-end)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, texts, langs=None):
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs or ["en"] * len(texts)),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))


def _oracle(tmp_path, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    return con.execute(sql).df()


def _df(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_gopher_rule_boundaries(tmp_path):
    from ray_script_extract.pipelines.text_analysis import (
        GOPHER_QUALITY_SQL,
        gopher_quality_filter,
    )

    base = ["abcd"] * 48 + ["the", "of"]      # 50 words, mean 3.94, 2 stops
    texts = [
        " ".join(base),                        # 0: every rule passes
        " ".join(base[1:]),                    # 1: 49 words → word_count 0
        " ".join(["ab"] * 48 + ["the", "of"]),  # 2: mean 2.08 < 3 → mean 0
        " ".join(["abcdefghij"] * 48 + ["the", "of"]),  # 3: sum 485
                                               #    ≤ 10*50 → mean OK
        " ".join(["abcdefghijklm"] * 48 + ["the", "of"]),  # 4: mean
                                               #    (48*13+5)/50 > 10 → 0
        " ".join(["abcd"] * 38 + ["123"] * 10 + ["the", "of"]),
                                               # 5: 40/50 alpha = exactly
                                               #    80% → alpha OK
        " ".join(["abcd"] * 37 + ["123"] * 11 + ["the", "of"]),
                                               # 6: 39/50 < 80% → alpha 0
        " ".join(["abcd"] * 49 + ["the"]),     # 7: 1 stopword → stop 0
    ]
    _write_docs(tmp_path, texts)

    got = _df(gopher_quality_filter(str(tmp_path))).reset_index(drop=True)

    assert got["word_count_ok"].tolist() == [1, 0, 1, 1, 1, 1, 1, 1]
    assert got["mean_len_ok"].tolist() == [1, 1, 0, 1, 0, 1, 1, 1]
    assert got["alpha_ok"].tolist() == [1, 1, 1, 1, 1, 1, 0, 1]
    assert got["stop_ok"].tolist() == [1, 1, 1, 1, 1, 1, 1, 0]
    assert got["gopher_pass"].tolist() == [1, 0, 0, 1, 0, 1, 0, 0]
    # the metric columns behind the rules
    assert got.loc[0, "n_words"] == 50
    assert got.loc[0, "sum_word_len"] == 48 * 4 + 3 + 2
    assert got.loc[5, "n_alpha_words"] == 40
    assert got.loc[7, "n_stop_hits"] == 1

    want = _oracle(tmp_path, GOPHER_QUALITY_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_ccnet_ntile_sizes_and_ties(tmp_path):
    from ray_script_extract.pipelines.text_analysis import (
        CCNET_BUCKETS_SQL,
        ccnet_quality_buckets,
    )

    # en: 5 docs → NTILE(3) sizes 2,2,1. Docs 0 and 1 tie on score
    # (identical text) → tie broken by doc_id: 0,1 head; de: 2 docs →
    # sizes 1,1,0 (head, middle, no tail); fr: 1 doc → head only.
    texts = [
        "the of and x",   # en score 3/4
        "the of and x",   # en tie with doc 0
        "the of x x",     # en 2/4
        "the x x x",      # en 1/4
        "x x x x",        # en 0
        "the the x x",    # de 2/4
        "x x x x",        # de 0
        "the x",          # fr
    ]
    langs = ["en"] * 5 + ["de"] * 2 + ["fr"]
    _write_docs(tmp_path, texts, langs)

    got = _df(ccnet_quality_buckets(str(tmp_path))).reset_index(drop=True)

    assert got["bucket"].tolist() == [
        "head", "head", "middle", "middle", "tail",   # en 2,2,1
        "head", "middle",                              # de 1,1
        "head",                                        # fr
    ]
    assert got.loc[0, "score_ppm"] == 1_000_000 * 3 // 4

    want = _oracle(tmp_path, CCNET_BUCKETS_SQL)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_registry_entries():
    from ray_script_extract.pipelines.queries import ORACLE_SQL, QUERIES

    for name in ("gopher_quality_filter", "ccnet_quality_buckets"):
        assert name in QUERIES and name in ORACLE_SQL
