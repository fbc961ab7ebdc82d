"""PII scrub vs its DuckDB oracle on a crafted corpus with real
emails/phones/SSNs (the sf tables contain none, so the exactness of
the RE2 parity is only exercised here)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _write_corpus(tmp_path) -> str:
    import pyarrow.parquet as pq

    texts = [
        "contact me at jane.doe+spam@example.co.uk or (555) 123-4567",
        "ssn 123-45-6789 phone 555.987.6543 mail a@b.io",
        "no pii here at all",
        "two mails x@y.com z@w.org and id 000-00-0000",
        "edge: not-an-email @@ half-phone 555-123",
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
def test_scrub_pii_matches_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.pii import SCRUB_PII_SQL, scrub_pii

    sf_dir = _write_corpus(tmp_path)
    got = scrub_pii(sf_dir).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql(SCRUB_PII_SQL).df()
    assert list(got.columns) == list(want.columns)
    assert got.values.tolist() == want.values.tolist()
    assert dict(got.dtypes) == dict(want.dtypes)

    by_id = {r.doc_id: r for r in got.itertuples()}
    assert by_id[0].text_clean == "contact me at <EMAIL> or <PHONE>"
    assert (by_id[0].n_emails, by_id[0].n_phones, by_id[0].n_ids) == (1, 1, 0)
    assert by_id[1].text_clean == "ssn <ID> phone <PHONE> mail <EMAIL>"
    assert by_id[2].text_clean == "no pii here at all"
    assert by_id[3].n_emails == 2 and by_id[3].n_ids == 1
    assert by_id[4].text_clean == texts_unchanged(by_id[4])


def texts_unchanged(row):
    # doc 4 has no full match for any pattern
    return "edge: not-an-email @@ half-phone 555-123"
