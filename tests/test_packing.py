"""Context-window packing vs its DuckDB oracle on a crafted corpus
that spans multiple prefix-sum buckets (sparse doc_ids past
bucket_width), includes empty docs, and docs longer than one window."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest


def _write_corpus(tmp_path) -> str:
    import pyarrow.parquet as pq

    rows = []
    # bucket 0: a mix of sizes, incl. empty and >1-window docs
    rows.append((0, "word " * 600))        # spans 2+ windows (512 each)
    rows.append((1, ""))                   # 0 tokens
    rows.append((2, "alpha beta gamma"))
    rows.append((7, "x " * 100))
    # bucket 1 (doc_id >= 4096): sparse ids
    rows.append((5000, "y " * 520))
    rows.append((6000, "z"))
    # bucket 3 — bucket 2 entirely absent (offset table gap)
    rows.append((13000, "w " * 50))
    ids = [r[0] for r in rows]
    texts = [r[1] for r in rows]
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["s"] * len(ids), pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64()),
    })
    sf_dir = str(tmp_path)
    pq.write_table(t, os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


@pytest.mark.usefixtures("ray_session")
def test_pack_windows_matches_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.packing import (
        PACK_WINDOWS_SQL, pack_context_windows)

    sf_dir = _write_corpus(tmp_path)
    got = pack_context_windows(sf_dir).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = con.sql(PACK_WINDOWS_SQL).df()
    assert got.values.tolist() == want.values.tolist()
    assert dict(got.dtypes) == dict(want.dtypes)

    by_id = {r.doc_id: r for r in got.itertuples()}
    # doc 0: tokens [0, 600) → windows 0..1
    assert (by_id[0].bin_first, by_id[0].bin_last) == (0, 1)
    # doc 1: empty, starts at 600 → degenerate single window 1
    assert by_id[1].n_tokens == 0
    assert by_id[1].bin_first == by_id[1].bin_last == 1
    # doc 5000 starts at 600+3+100=703 → 703..1222 spans windows 1..2
    assert (by_id[5000].bin_first, by_id[5000].bin_last) == (1, 2)
    # every start is monotone with doc_id and spans are contiguous:
    # doc 13000 starts after all earlier tokens (703+520+1=1224)
    assert by_id[13000].bin_first == 1224 // 512
