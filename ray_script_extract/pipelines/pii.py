"""PII scrubbing: redact emails / phone numbers / SSN-shaped ids from
document text — the release-gate scrub every public training-data
pipeline runs (C4 and FineWeb both ship regex PII passes).

No reference counterpart (`/root/reference` converts screenplay text
verbatim); engine-level addition to the text-analysis family.

Scale shape: a pure streaming ``map_batches`` transform — zero
shuffles, zero state, zero driver data; the only all-to-all is the
final doc_id sort for deterministic output order (drop it when
consuming as a pipeline stage).  The regex kernels are Arrow C++ RE2
(`pc.replace_substring_regex` / `pc.count_substring_regex`), applied
column-at-a-time; no Python row loop.

Oracle exactness: DuckDB's ``regexp_replace(..., 'g')`` is ALSO RE2,
so with identical patterns applied in the same order the scrub is
bit-identical on both sides — counts included.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from .joins import sorted_small

# Applied in this order on BOTH sides (an email's digits must not be
# half-eaten by the phone pattern, so email runs first).
_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE = r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}"
_SSN = r"\d{3}-\d{2}-\d{4}"


def scrub_pii(sf_dir: str):
    """``(doc_id, text_clean, n_emails, n_phones, n_ids)`` for every
    document, redactions applied email → phone → ssn (counts taken
    BEFORE each replacement, on the text as that pattern sees it)."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def scrub(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_emails = pc.count_substring_regex(text, _EMAIL)
        text = pc.replace_substring_regex(text, _EMAIL, "<EMAIL>")
        n_phones = pc.count_substring_regex(text, _PHONE)
        text = pc.replace_substring_regex(text, _PHONE, "<PHONE>")
        n_ids = pc.count_substring_regex(text, _SSN)
        text = pc.replace_substring_regex(text, _SSN, "<ID>")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text_clean": text,
            "n_emails": pc.cast(n_emails, pa.int64()),
            "n_phones": pc.cast(n_phones, pa.int64()),
            "n_ids": pc.cast(n_ids, pa.int64()),
        })

    return sorted_small(ds.map_batches(scrub, batch_format="pyarrow",
                          zero_copy_batch=True), "doc_id")


SCRUB_PII_SQL = f"""
WITH s1 AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS BIGINT) AS n_emails,
         regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g') AS t
  FROM documents
), s2 AS (
  SELECT doc_id, n_emails,
         CAST(len(regexp_extract_all(t, '{_PHONE}')) AS BIGINT) AS n_phones,
         regexp_replace(t, '{_PHONE}', '<PHONE>', 'g') AS t
  FROM s1
)
SELECT doc_id,
       regexp_replace(t, '{_SSN}', '<ID>', 'g') AS text_clean,
       n_emails, n_phones,
       CAST(len(regexp_extract_all(t, '{_SSN}')) AS BIGINT) AS n_ids
FROM s2 ORDER BY doc_id
"""
