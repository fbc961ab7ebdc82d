"""`event_value_trend` (grouped OLS as exact integer moment ratios):
hand-computed slope/intercept on crafted points, the exact DuckDB
oracle, and a float cross-check against DuckDB's regr_slope/intercept
on the sf corpus."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _write_events(tmp_path, rows):
    """rows: list of (event_type, iso_ts, value)."""
    t = pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([np.datetime64(r[1], "us") for r in rows],
                       pa.timestamp("us")),
        "value": pa.array([float(r[2]) for r in rows], pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_hand_computed_slope_and_oracle(tmp_path):
    import duckdb

    from ray_script_extract.pipelines.queries import (
        EVENT_VALUE_TREND_SQL,
        event_value_trend,
    )

    # Type "up": y = 2.00x + 5.00 exactly (cents slope 200/day).
    # Moments: n=3, sx=3, sy=2100, sxy=2500, sxx=5 →
    # slope_num = 3·2500 − 3·2100 = 1200, slope_den = 3·5 − 9 = 6,
    # intercept_num = 2100·5 − 3·2500 = 3000 → 1200/6=200, 3000/6=500.
    # Type "flat": constant value → slope_num must be exactly 0.
    rows = [
        ("up", "2024-01-01T10:00:00", 5.00),
        ("up", "2024-01-02T11:30:00", 7.00),
        ("up", "2024-01-03T09:15:00", 9.00),
        ("flat", "2024-01-01T00:00:00", 3.25),
        ("flat", "2024-01-05T23:59:59", 3.25),
    ]
    sf = _write_events(tmp_path, rows)

    got = event_value_trend(sf).to_pandas().reset_index(drop=True)
    assert got["event_type"].tolist() == ["flat", "up"]
    up = got.iloc[1]
    assert (up["slope_num"], up["slope_den"], up["intercept_num"]) \
        == (1200, 6, 3000)
    flat = got.iloc[0]
    assert flat["slope_num"] == 0
    assert flat["n_events"] == 2

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(EVENT_VALUE_TREND_SQL).df()
    pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))


@pytest.mark.usefixtures("ray_session")
def test_matches_regr_slope_on_sf_corpus():
    """The integer ratios equal DuckDB's native regression aggregates
    (up to float division) on the real sf events table."""
    import duckdb

    from ray_script_extract.pipelines.queries import event_value_trend

    got = event_value_trend(SF).to_pandas().reset_index(drop=True)
    assert (got["slope_den"] > 0).all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = con.execute("""
        SELECT event_type,
               regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept
        FROM (SELECT event_type,
                     CAST(DATEDIFF('day', DATE '2024-01-01',
                                   CAST(ts AS DATE)) AS DOUBLE) AS x,
                     CAST(FLOOR(value*100 + 0.5) AS DOUBLE) AS y
              FROM events)
        GROUP BY event_type ORDER BY event_type
    """).df()
    assert want["event_type"].tolist() == got["event_type"].tolist()
    assert np.allclose(got["slope_num"] / got["slope_den"],
                       want["slope"], rtol=1e-9)
    assert np.allclose(got["intercept_num"] / got["slope_den"],
                       want["icept"], rtol=1e-9)
