"""Curation operators vs their DuckDB oracles on a crafted corpus.

The sf testdata has no duplicate texts, so these tests build a corpus
that actually exercises the interesting paths: normalized-duplicate
groups where the raw copies differ (case/whitespace → different
n_chars, so keep-best ≠ keep-first), quality failures of every bucket,
and strata larger than the sample size.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _write_corpus(tmp_path) -> str:
    import pyarrow.parquet as pq

    texts = []
    langs = []
    # normalized-duplicate group: same text modulo case/whitespace;
    # the raw lengths differ so keep-best must pick the LONGEST raw
    # (doc 2), not the first (doc 0)
    # (few stopwords / few long tokens so the group survives the
    # quality filter in curate_corpus)
    texts += ["cat sat mat today watching birds fly",
              "Cat Sat Mat Today Watching Birds Fly",
              "  cat   sat mat today watching birds fly  "]
    langs += ["en", "en", "en"]
    # quality failures: too_short, boilerplate (all stopwords),
    # jargon (long tokens)
    texts += ["tiny one",
              "the a an of to in and is on for the a an of to",
              "extraordinary magnificent wonderful fantastic incredible"]
    langs += ["en", "en", "en"]
    # bulk per-stratum filler so sample_stratified truncates: 30 docs
    # per lang across three langs (n_per_key default is 40 → use
    # n_per_key=10 explicitly in the test)
    for lang in ("en", "fr", "de"):
        for i in range(30):
            texts.append(f"document body {lang} number {i} with plenty "
                         f"of unique words to stay in the ok bucket")
            langs.append(lang)
    n = len(texts)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    sf_dir = str(tmp_path)
    pq.write_table(t, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _oracle(sf_dir: str, sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    return con.sql(sql).df()


@pytest.mark.usefixtures("ray_session")
def test_dedup_exact_keep_best(tmp_path):
    from ray_script_extract.pipelines.curation import (
        DEDUP_KEEP_BEST_SQL,
        dedup_exact_keep_best,
    )

    sf_dir = _write_corpus(tmp_path)
    got = dedup_exact_keep_best(sf_dir).to_pandas()
    # the whitespace-padded variant (doc 2) is the longest raw copy
    row = got[got["n_dups"] == 3]
    assert list(row["doc_id"]) == [2]
    assert 0 not in set(got["doc_id"]) and 1 not in set(got["doc_id"])

    oracle = _oracle(sf_dir, DEDUP_KEEP_BEST_SQL)
    assert got[["doc_id", "n_dups"]].values.tolist() == \
        oracle[["doc_id", "n_dups"]].values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_sample_stratified(tmp_path):
    from ray_script_extract.pipelines.curation import (
        SAMPLE_STRATIFIED_SQL,
        sample_stratified,
    )

    sf_dir = _write_corpus(tmp_path)
    got = sample_stratified(sf_dir, n_per_key=10).to_pandas()
    # exactly 10 per stratum, deterministic
    assert got.groupby("lang").size().to_dict() == \
        {"de": 10, "en": 10, "fr": 10}
    again = sample_stratified(sf_dir, n_per_key=10).to_pandas()
    assert got.values.tolist() == again.values.tolist()

    oracle = _oracle(sf_dir, SAMPLE_STRATIFIED_SQL.replace(
        "rk <= 40", "rk <= 10"))
    assert got[["lang", "doc_id"]].values.tolist() == \
        oracle[["lang", "doc_id"]].values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_curate_corpus(tmp_path):
    from ray_script_extract.pipelines.curation import (
        CURATE_CORPUS_SQL,
        curate_corpus,
    )

    sf_dir = _write_corpus(tmp_path)
    got = curate_corpus(sf_dir)
    oracle = _oracle(sf_dir, CURATE_CORPUS_SQL)
    # quality filter drops the 3 bad docs; dedup keeps 1 of the 3
    # normalized duplicates → en keeps 30 filler + 1 dup survivor
    en = got[got["lang"] == "en"]
    assert int(en["kept_docs"].iloc[0]) == 31
    assert got[["lang", "kept_docs", "total_chars"]].values.tolist() == \
        oracle[["lang", "kept_docs", "total_chars"]].values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_rank_hash_matches_duckdb(tmp_path):
    """The uint64 rank ≡ DuckDB md5_number_lower(CAST(id AS VARCHAR))."""
    import duckdb
    import numpy as np

    from ray_script_extract.pipelines.curation import _rank_hash

    ids = np.array([0, 1, 7, 12345, 999999999999], np.int64)
    ours = _rank_hash(ids)
    con = duckdb.connect()
    theirs = [con.sql(
        f"SELECT md5_number_lower(CAST({int(i)} AS VARCHAR))").fetchone()[0]
        for i in ids]
    assert [int(x) for x in ours] == [int(x) for x in theirs]


@pytest.mark.usefixtures("ray_session")
def test_export_curated_resumable(tmp_path):
    """Partitioned curated export: verified lineage per partition,
    exact resume (only the tampered partition is rewritten), and the
    union of partitions equals the SQL winners set."""
    import glob
    import json

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.curation import export_curated

    sf_dir = _write_corpus(tmp_path)
    out_dir = str(tmp_path / "curated")
    s1 = export_curated(sf_dir, out_dir, num_partitions=8)
    assert s1["partitions_skipped"] == 0 and s1["rows_written"] > 0

    parts = sorted(glob.glob(out_dir + "/part-*/data.parquet"))
    assert len(parts) >= 2  # partitioned output, not one giant file
    got = pd.concat([pq.read_table(p).to_pandas() for p in parts]) \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    oracle = con.sql("""
      WITH m AS (
        SELECT *, regexp_extract_all(lower(text), '\\S+') AS toks
        FROM documents
      ), q AS (
        SELECT doc_id, lang, text, n_chars,
               len(toks) AS nt,
               len(list_filter(toks, x -> x IN
                 ('the','a','an','of','to','in','and','is','on','for'))) AS ns,
               len(list_filter(toks, x -> length(x) >= 8)) AS nl
        FROM m
      ), ok AS (
        SELECT doc_id, lang, text, n_chars FROM q
        WHERE nt >= 5
          AND FLOOR(100.0 * ns / GREATEST(nt, 1)) <= 40
          AND FLOOR(100.0 * nl / GREATEST(nt, 1)) <= 50
      )
      SELECT doc_id, lang, text, n_chars FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
          ORDER BY n_chars DESC, doc_id) AS rk
        FROM ok) WHERE rk = 1 ORDER BY doc_id
    """).df()
    assert got[["doc_id", "lang", "text", "n_chars"]].values.tolist() == \
        oracle.values.tolist()

    # full resume: everything skips
    s2 = export_curated(sf_dir, out_dir, num_partitions=8)
    assert s2["rows_written"] == 0
    assert s2["partitions_skipped"] == s2["partitions_total"]

    # tamper one partition → exactly that one is rewritten
    victim = sorted(glob.glob(out_dir + "/part-*/_LINEAGE.json"))[0]
    rec = json.load(open(victim))
    import os
    os.remove(victim)
    s3 = export_curated(sf_dir, out_dir, num_partitions=8)
    assert s3["partitions_skipped"] == s3["partitions_total"] - 1
    rec2 = json.load(open(victim))
    assert rec2["checksum"] == rec["checksum"]  # deterministic rewrite


@pytest.mark.usefixtures("ray_session")
def test_sample_quality_weighted(tmp_path):
    """Keep rule draw < w_bp holds exactly; too_short is never kept;
    boilerplate/jargon weights are HALF of a clean doc's at the same
    token count; the oracle matches row-for-row on the crafted
    corpus (which exercises every bucket)."""
    import numpy as np

    from ray_script_extract.pipelines.curation import (
        _rank_hash,
        _sample_quality_weighted_sql,
        sample_quality_weighted,
    )

    sf_dir = _write_corpus(tmp_path)
    got = sample_quality_weighted(sf_dir).to_pandas()

    assert (got["draw"] < got["w_bp"]).all()
    # doc 3 is too_short (2 tokens) -> w_bp 0, never sampled
    assert 3 not in set(got["doc_id"])
    # draws replicate the md5 rank identity
    ids = got["doc_id"].to_numpy()
    assert (got["draw"].to_numpy()
            == (_rank_hash(ids) % np.uint64(10_000)).astype(np.int64)).all()

    # doc 4 (boilerplate, 15 tokens) carries HALF the weight of a
    # clean 15-token doc: 1500 // 2
    full = _oracle(sf_dir, _sample_quality_weighted_sql()
                   .replace("WHERE draw < w_bp", ""))
    row4 = full.loc[full["doc_id"] == 4].iloc[0]
    assert row4["n_tokens"] == 15 and row4["w_bp"] == 750

    oracle = _oracle(sf_dir, _sample_quality_weighted_sql())
    assert got.astype("int64").values.tolist() == \
        oracle.astype("int64").values.tolist()

    again = sample_quality_weighted(sf_dir).to_pandas()
    assert got.values.tolist() == again.values.tolist()
