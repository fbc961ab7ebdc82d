"""Keyed window/stream ops at high key cardinality.

Ray 2.49's ``groupby(key).map_groups`` dispatches one task per group
(~10 ms each), so 10^5 distinct users would take ~17 minutes; the
``hash_partitioned_map`` pattern (one shuffle on a 32-way partition id,
vectorized per-partition reduce) must finish the same input in seconds.
This test both pins the perf shape and cross-checks exact values
against a single-process pandas reference.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pytest

N_USERS = 100_000
EVENTS_PER_USER = 3


@pytest.fixture(scope="module")
def big_events_dir(tmp_path_factory, ray_session):
    rng = np.random.default_rng(7)
    n = N_USERS * EVENTS_PER_USER
    user_id = np.repeat(np.arange(N_USERS, dtype=np.int64), EVENTS_PER_USER)
    # gaps of 1 min / 45 min mixed so some users have 1 session, some 2+
    offs = rng.choice([60, 2700], size=n).cumsum()
    base = np.datetime64("2026-01-01T00:00:00", "us")
    ts = base + offs.astype("timedelta64[s]")
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": ts,
        "user_id": user_id,
        "event_type": rng.choice(["view", "purchase", "signup"], size=n),
        "value": np.round(rng.uniform(0, 100, size=n), 2),
        "props": "{}",
    })
    d = tmp_path_factory.mktemp("bigevents")
    df.to_parquet(d / "events.parquet", index=False)
    return str(d), df


def test_sessionize_100k_users_seconds(big_events_dir):
    from ray_script_extract.pipelines.queries import events_sessionize

    sf_dir, df = big_events_dir
    t0 = time.time()
    out = events_sessionize(sf_dir).to_pandas()
    elapsed = time.time() - t0
    assert len(out) == N_USERS
    assert elapsed < 60, f"sessionize at 1e5 users took {elapsed:.0f}s"

    # exact reference on a sample of users
    sample = df[df.user_id < 500].sort_values(["user_id", "ts"])
    gap = np.timedelta64(30 * 60, "s")
    for uid, g in sample.groupby("user_id"):
        ts = g["ts"].to_numpy()
        expect = 1 + int((np.diff(ts) > gap).sum())
        got = out.loc[out.user_id == uid, "n_sessions"].iloc[0]
        assert got == expect, uid


def test_rolling_sum3_100k_users_exact(big_events_dir):
    from ray_script_extract.pipelines.queries import events_rolling_sum3

    sf_dir, df = big_events_dir
    t0 = time.time()
    out = events_rolling_sum3(sf_dir).to_pandas()
    elapsed = time.time() - t0
    assert len(out) == len(df)
    assert elapsed < 60, f"rolling at 1e5 users took {elapsed:.0f}s"

    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    cents = np.floor(ref["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    ref["c"] = cents
    expect = (ref.groupby("user_id")["c"]
                 .rolling(3, min_periods=1).sum()
                 .reset_index(level=0, drop=True).astype(np.int64))
    ref["expect"] = expect
    merged = out.merge(ref[["event_id", "expect"]], on="event_id")
    assert (merged["rolling_sum3_cents"] == merged["expect"]).all()


def test_asof_100k_users_matches_merge_asof(big_events_dir):
    from ray_script_extract.pipelines.queries import events_asof_last_signup

    sf_dir, df = big_events_dir
    out = events_asof_last_signup(sf_dir).to_pandas()

    ts_us = df["ts"].astype("datetime64[ns]").astype("int64") // 1000
    ref = df.assign(ts_us=ts_us)
    purchases = (ref[ref.event_type == "purchase"]
                 [["event_id", "user_id", "ts_us"]].sort_values("ts_us"))
    signups = (ref[ref.event_type == "signup"][["user_id", "ts_us"]]
               .sort_values("ts_us"))
    signups = signups.assign(last_signup_us=signups["ts_us"])
    m = pd.merge_asof(purchases, signups, on="ts_us", by="user_id",
                      allow_exact_matches=False, direction="backward")
    expect = m["last_signup_us"].fillna(-1).astype(np.int64).to_numpy()
    assert len(out) == len(purchases)
    got = out.sort_values("event_id")["last_signup_us"].to_numpy()
    order = np.argsort(m["event_id"].to_numpy())
    assert (got == expect[order]).all()


def test_hash_join_left_outer_nullable(ray_session, tmp_path):
    """Non-inner joins must not crash on unmatched rows (int columns
    go pandas-nullable Int64 instead of IntCastingNaNError)."""
    import ray.data

    from ray_script_extract.pipelines.joins import hash_join_via_groupby

    left = ray.data.from_pandas(pd.DataFrame(
        {"k": np.array([1, 2, 3], np.int64),
         "lval": np.array([10, 20, 30], np.int64)}))
    right = ray.data.from_pandas(pd.DataFrame(
        {"rk": np.array([2, 3, 4], np.int64),
         "rval": np.array([200, 300, 400], np.int64)}))

    inner = hash_join_via_groupby(left, right, "k", "rk").to_pandas()
    assert sorted(inner["k"]) == [2, 3]
    assert list(inner.dtypes) == [np.dtype("int64")] * 3

    outer = (hash_join_via_groupby(left, right, "k", "rk", how="left")
             .to_pandas().sort_values("k").reset_index(drop=True))
    assert list(outer["k"]) == [1, 2, 3]
    assert pd.isna(outer.loc[0, "rval"])
    assert outer.loc[1, "rval"] == 200
