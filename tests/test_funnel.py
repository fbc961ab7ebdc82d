"""Boundary tests for the ordered funnel (`events_funnel`): the
per-partition masked groupby-min must match DuckDB's correlated
min-after-min semantics on strict-inequality ties, out-of-order
steps, repeated steps, and users who stall at each stage."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _events(rows):
    uid, typ, ts = zip(*rows)
    n = len(rows)
    return pa.table({
        "event_id": pa.array(range(1, n + 1), pa.int64()),
        "ts": pa.array(list(ts), pa.timestamp("us")),
        "user_id": pa.array(list(uid), pa.int64()),
        "event_type": pa.array(list(typ)),
        "value": pa.array([0.0] * n),
        "props": pa.array(["{}"] * n),
    })


@pytest.mark.usefixtures("ray_session")
def test_funnel_boundaries(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.queries import (
        EVENTS_FUNNEL_SQL,
        events_funnel,
    )

    rows = [
        # u1: clean full funnel
        (1, "signup", 100), (1, "view", 200), (1, "purchase", 300),
        # u2: view/purchase BEFORE signup only -> stalls at view
        (2, "view", 50), (2, "purchase", 60), (2, "signup", 100),
        # u3: view at EXACTLY the signup ts (strict > excludes it),
        #     later view counts; purchase ties that view -> excluded
        (3, "signup", 100), (3, "view", 100), (3, "view", 400),
        (3, "purchase", 400), (3, "purchase", 500),
        # u4: two signups; earliest gates the funnel
        (4, "signup", 900), (4, "signup", 100), (4, "view", 500),
        (4, "purchase", 600),
        # u5: no signup at all
        (5, "view", 10), (5, "purchase", 20),
        # u6: signup only
        (6, "signup", 100),
        # u7: purchase before the qualifying view, none after
        (7, "signup", 100), (7, "purchase", 150), (7, "view", 200),
    ]
    pq.write_table(_events(rows), str(tmp_path / "events.parquet"))

    got = events_funnel(str(tmp_path))
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    got = got.sort_values("user_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(EVENTS_FUNNEL_SQL).df()

    cast = {c: np.int64 for c in ("s1_us", "v1_us", "p1_us")}
    pd.testing.assert_frame_equal(got.astype(cast), want.astype(cast))

    by = got.set_index("user_id")
    assert tuple(by.loc[1]) == (100, 200, 300)
    assert tuple(by.loc[2]) == (100, -1, -1)
    assert tuple(by.loc[3]) == (100, 400, 500)
    assert tuple(by.loc[4]) == (100, 500, 600)
    assert tuple(by.loc[5]) == (-1, -1, -1)
    assert tuple(by.loc[6]) == (100, -1, -1)
    assert tuple(by.loc[7]) == (100, 200, -1)
