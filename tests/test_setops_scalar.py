"""Boundary tests for INTERSECT (`intersect_repeat_buyers`) and the
scalar-subquery compare (`orders_above_global_avg`): one-sided
customers are excluded, duplicate orders don't double-count, and an
order EXACTLY at the global average is excluded (strict >)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_setops_and_scalar_boundaries(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.queries import (
        ABOVE_AVG_SQL,
        INTERSECT_BUYERS_SQL,
        intersect_repeat_buyers,
        orders_above_global_avg,
    )

    # cust 1: urgent+low (in); 2: urgent only; 3: low only;
    # 4: urgent twice + low (in once — set semantics); 5: neither class
    rows = [
        (1, "1-URGENT"), (1, "5-LOW"),
        (2, "1-URGENT"),
        (3, "5-LOW"),
        (4, "1-URGENT"), (4, "1-URGENT"), (4, "5-LOW"),
        (5, "3-MEDIUM"),
    ]
    ck, pri = zip(*rows)
    n = len(rows)
    # prices: global total 800.00 over 8 orders -> avg 100.00; one
    # order at EXACTLY 100.00 must be excluded by the strict >
    prices = [100.00, 150.00, 50.00, 120.00, 80.00, 90.00, 110.00, 100.00]
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(1, n + 1), pa.int64()),
        "o_custkey": pa.array(list(ck), pa.int64()),
        "o_orderpriority": pa.array(list(pri)),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array([0] * n, pa.timestamp("us")),
    }), str(tmp_path / "orders.parquet"))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")

    got_i = intersect_repeat_buyers(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    want_i = con.execute(INTERSECT_BUYERS_SQL).df()
    pd.testing.assert_frame_equal(got_i.astype({"o_custkey": np.int64}),
                                  want_i.astype({"o_custkey": np.int64}))
    assert got_i["o_custkey"].tolist() == [1, 4]

    got_a = orders_above_global_avg(str(tmp_path)).to_pandas() \
        .reset_index(drop=True)
    want_a = con.execute(ABOVE_AVG_SQL).df()
    cast = {"n_above": np.int64, "sum_cents": np.int64}
    pd.testing.assert_frame_equal(got_a.astype(cast), want_a.astype(cast))
    # above-avg orders: 150, 120, 110 — the two exact-100.00 rows are out
    assert int(got_a["n_above"].sum()) == 3
    assert int(got_a["sum_cents"].sum()) == 38000
