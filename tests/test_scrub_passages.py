"""scrub_repeated_passages (substring-level dedup, Lee et al. ACL'22
re-expressed over winnow fingerprints) vs its DuckDB oracle on a
crafted corpus, plus the keep-first / min-island semantics."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


PASSAGE = ("the quick brown fox jumps over the lazy dog while the "
           "band plays on and the crowd cheers loudly tonight")
SHORT = "tiny repeat"


def _write_corpus(tmp_path) -> str:
    import pyarrow.parquet as pq

    texts = [
        f"first carrier intro. {PASSAGE} closing remark alpha. {SHORT}",
        f"second carrier opening! {PASSAGE} and a tail beta. {SHORT}",
        "nothing in common here at all, just some filler gamma words.",
        f"third carrier sigma tau. {PASSAGE} final words delta.",
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
def test_scrub_matches_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.text_analysis import (
        SCRUB_PASSAGES_SQL,
        scrub_repeated_passages,
    )

    sf_dir = _write_corpus(tmp_path)
    got = scrub_repeated_passages(sf_dir).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql(SCRUB_PASSAGES_SQL).df()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = want.sort_values("doc_id").reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    want = want[list(got.columns)].astype(got.dtypes.to_dict())
    assert got.values.tolist() == want.values.tolist()


@pytest.mark.usefixtures("ray_session")
def test_scrub_keeps_first_occurrence(tmp_path):
    from ray_script_extract.pipelines.text_analysis import (
        scrub_repeated_passages,
    )

    sf_dir = _write_corpus(tmp_path)
    got = (scrub_repeated_passages(sf_dir).to_pandas()
           .set_index("doc_id"))

    # doc 0 is the globally-first carrier: the passage interior
    # survives there (only later occurrences are victims)
    assert PASSAGE[10:-10] in got.loc[0, "clean_text"]
    assert got.loc[0, "n_scrubbed_ranges"] == 0
    # docs 1 and 3 lose the passage body (winnowing edge slack is
    # ~k+w chars, so the interior must be gone)
    for d in (1, 3):
        assert PASSAGE[10:-10] not in got.loc[d, "clean_text"]
        assert got.loc[d, "n_scrubbed_ranges"] >= 1
        assert got.loc[d, "n_scrubbed_chars"] >= len(PASSAGE) - 20
    # non-duplicated framing text survives in every doc
    assert "second carrier opening!" in got.loc[1, "clean_text"]
    assert "final words delta." in got.loc[3, "clean_text"]
    # doc 2 shares nothing and passes through verbatim
    assert got.loc[2, "n_scrubbed_chars"] == 0
    assert got.loc[2, "clean_text"].startswith("nothing in common")


@pytest.mark.usefixtures("ray_session")
def test_min_island_protects_short_repeats(tmp_path):
    from ray_script_extract.pipelines.text_analysis import (
        scrub_repeated_passages,
    )

    sf_dir = _write_corpus(tmp_path)
    # SHORT ("tiny repeat", 11 chars) repeats across docs 0/1, but any
    # island it forms is far below a 200-char minimum -> untouched,
    # and with the passage also protected nothing is scrubbed at all
    got = (scrub_repeated_passages(sf_dir, min_scrub=200).to_pandas()
           .set_index("doc_id"))
    assert (got["n_scrubbed_chars"] == 0).all()
    assert SHORT in got.loc[1, "clean_text"]
