"""Boundary tests for `sample_token_budget`: the crossing doc is
included, a doc whose prior lands EXACTLY on the budget is excluded,
zero-token docs pass through while the budget is open, and the
batch-local prune stays conservative when the corpus spans multiple
parquet files whose hash order interleaves."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _h(doc_id: int) -> int:
    return int.from_bytes(
        hashlib.md5(str(doc_id).encode()).digest()[8:], "little")


@pytest.mark.usefixtures("ray_session")
def test_token_budget_boundaries(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.curation import (
        SAMPLE_TOKEN_BUDGET_SQL,
        sample_token_budget,
    )

    # one language; doc token counts chosen so that, in HASH order,
    # cumulative sums step over the 2000 budget at a known doc:
    # sort ids by md5 rank, then assign [1990, 10, 7, 0, 5, ...] in
    # that order -> priors 0, 1990, 2000, 2007, 2007:
    #   #1 kept (prior 0), #2 kept (1990 < 2000, crossing doc),
    #   #3 EXCLUDED (prior == 2000 exactly), rest excluded
    ids = list(range(1, 25))
    by_rank = sorted(ids, key=lambda d: (_h(d), d))
    toks = {by_rank[0]: 1990, by_rank[1]: 10, by_rank[2]: 7,
            by_rank[3]: 0, by_rank[4]: 5}
    for d in by_rank[5:]:
        toks[d] = 3

    # zero-token boundary, separate lang: first doc by rank has 0
    # tokens (kept, consumes nothing), budget stays open after it
    zids = [100, 101, 102]
    zrank = sorted(zids, key=lambda d: (_h(d), d))
    ztoks = {zrank[0]: 0, zrank[1]: 2500, zrank[2]: 8}

    def text(n):
        return "tok " * n

    all_ids = ids + zids
    all_lang = ["en"] * len(ids) + ["zz"] * len(zids)
    all_text = [text(toks[d]) for d in ids] + [text(ztoks[d]) for d in zids]

    # split across TWO parquet files so hash order interleaves blocks
    # (exercises the conservative in-batch prune)
    d = tmp_path / "documents.parquet"
    d.mkdir()
    for part in (0, 1):
        sel = [i for i in range(len(all_ids)) if i % 2 == part]
        pq.write_table(pa.table({
            "doc_id": pa.array([all_ids[i] for i in sel], pa.int64()),
            "text": pa.array([all_text[i] for i in sel]),
            "lang": pa.array([all_lang[i] for i in sel]),
        }), str(d / f"part{part}.parquet"))

    got = sample_token_budget(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/*.parquet')")
    want = con.execute(SAMPLE_TOKEN_BUDGET_SQL).df()
    cast = {"doc_id": np.int64, "n_tok": np.int64}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))

    en = got[got["lang"] == "en"]["doc_id"].tolist()
    assert sorted(en) == sorted(by_rank[:2])  # crossing doc in, ==budget out
    zz = got[got["lang"] == "zz"]["doc_id"].tolist()
    # zero-token first doc kept, then the 2500-token doc crosses
    assert sorted(zz) == sorted(zrank[:2])
