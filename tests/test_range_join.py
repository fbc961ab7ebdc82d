"""Boundary tests for the non-equi range join
(`events_orders_range_join`): the day-bucket replication + composite
searchsorted probe must match DuckDB's BETWEEN semantics exactly at
the inclusive window edges, across midnight bucket boundaries, and in
partitions with no orders at all."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DAY_US = 86_400_000_000


def _us(day: float) -> int:
    return int(day * DAY_US)


@pytest.mark.usefixtures("ray_session")
def test_range_join_boundaries(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.queries import (
        EVENTS_RANGE_JOIN_SQL,
        events_orders_range_join,
    )

    # events placed to stress every edge: exactly ±1 day from an
    # order date (inclusive on both ends), 1 microsecond inside /
    # outside the window, mid-bucket, at midnight, and in a day-range
    # far from every order (empty probe).
    ev_ts = [
        _us(10.0),            # midnight, order at day 11 is exactly +1d
        _us(10.0) + 1,        # 1us later -> day-11 order now inside
        _us(12.0),            # order at 11 exactly -1d
        _us(12.0) + 1,        # 1us later -> day-11 order 1us outside
        _us(11.5),            # mid-bucket, window spans 10.5..12.5
        _us(500.25),          # no orders anywhere near
        _us(0.75),            # near epoch, window floor in bucket -1
    ]
    events = pa.table({
        "event_id": pa.array(range(1, len(ev_ts) + 1), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": pa.array([0] * len(ev_ts), pa.int64()),
        "event_type": pa.array(["x"] * len(ev_ts)),
        "value": pa.array([0.0] * len(ev_ts)),
        "props": pa.array(["{}"] * len(ev_ts)),
    })
    od = [_us(11.0), _us(11.0), _us(13.0), _us(0.0)]
    orders = pa.table({
        "o_orderkey": pa.array(range(1, len(od) + 1), pa.int64()),
        "o_custkey": pa.array([1] * len(od), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(od)),
        "o_totalprice": pa.array([10.01, 20.02, 40.04, 80.08]),
        "o_orderdate": pa.array(od, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * len(od)),
    })
    pq.write_table(events, str(tmp_path / "events.parquet"))
    pq.write_table(orders, str(tmp_path / "orders.parquet"))

    got = events_orders_range_join(str(tmp_path))
    got = got.to_pandas() if not isinstance(got, pd.DataFrame) else got
    got = got.sort_values("event_id").reset_index(drop=True)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{tmp_path}/events.parquet')")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{tmp_path}/orders.parquet')")
    want = con.execute(EVENTS_RANGE_JOIN_SQL).df()

    pd.testing.assert_frame_equal(
        got.astype({"n_orders": np.int64, "revenue_cents": np.int64}),
        want.astype({"n_orders": np.int64, "revenue_cents": np.int64}))

    # hand-checked expectations for the load-bearing edges
    by_id = got.set_index("event_id")
    assert by_id.loc[1, "n_orders"] == 2      # both day-11 orders at +1d
    assert by_id.loc[3, "n_orders"] == 3      # day-11 orders at -1d AND day-13 at +1d
    assert by_id.loc[4, "n_orders"] == 1      # day-11 now 1us out, 13 in? no:
    # event 4 at 12.0+1us: window (11.0+1us .. 13.0+1us) -> excludes
    # day-11 orders, includes day-13 order
    assert by_id.loc[4, "revenue_cents"] == 4004
    assert by_id.loc[6, "n_orders"] == 0
    assert by_id.loc[6, "revenue_cents"] == 0
