"""Misra–Gries heavy-hitter sketch: error-bound guarantees asserted
against the exact counts, with capacity forced small enough that
compression actually fires."""

from __future__ import annotations

import collections

import numpy as np
import pytest


def _exact_counts(sf_dir: str) -> "collections.Counter":
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    c = collections.Counter()
    for t in texts:
        c.update(w for w in t.lower().split() if w)
    return c


def test_mg_compress_step():
    from ray_script_extract.pipelines.sketches import _mg_compress

    counts = np.array([10, 3, 7, 1, 1], np.int64)
    keep, lowered, t = _mg_compress(counts, capacity=2)
    # 3rd largest = 3 -> subtract 3, survivors 10->7, 7->4
    assert t == 3
    assert keep.tolist() == [True, False, True, False, False]
    assert lowered.tolist() == [7, 4]
    # no-op when under capacity
    keep, lowered, t = _mg_compress(counts, capacity=5)
    assert keep is None and t == 0 and lowered.tolist() == counts.tolist()


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch_exact_regime():
    """With s far above any per-batch type count, the summary IS the
    raw data and the sketch must equal the exact twin bit-for-bit."""
    import pandas as pd

    from ray_script_extract.pipelines.queries import event_value_percentiles
    from ray_script_extract.pipelines.sketches import (
        event_value_percentiles_sketch)

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        exact = event_value_percentiles(sf).to_pandas()
        sk = event_value_percentiles_sketch(sf, s=10**6).to_pandas()
        pd.testing.assert_frame_equal(sk.reset_index(drop=True),
                                      exact.reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_quantile_sketch_rank_bound():
    """Forced-tiny s: every reported percentile must sit within the
    N_type/s rank-error bound of its target rank in the exact sorted
    values."""
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.sketches import (
        event_value_percentiles_sketch)

    sf = "/root/testdata/sf0.01"
    s = 16
    got = event_value_percentiles_sketch(sf, s=s).to_pandas()

    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["event_type", "value"])
    df = t.to_pandas()
    df["cents"] = np.floor(df["value"].to_numpy() * 100 + 0.5) \
        .astype(np.int64)

    assert len(got) == df["event_type"].nunique()
    for _, row in got.iterrows():
        vals = np.sort(
            df.loc[df["event_type"] == row["event_type"], "cents"]
            .to_numpy())
        n = len(vals)
        assert row["n_events"] == n
        bound = n / s + 1
        for p, col in ((0.5, "p50_cents"), (0.9, "p90_cents")):
            target = np.ceil(p * n) - 1
            lo = np.searchsorted(vals, row[col], side="left")
            hi = np.searchsorted(vals, row[col], side="right") - 1
            assert lo - bound <= target <= hi + bound, \
                (row["event_type"], col, lo, hi, target, bound)


def test_clz64_exact():
    from ray_script_extract.pipelines.sketches import _clz64

    rng = np.random.default_rng(7)
    w = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    edges = np.array([0, 1, 2, (1 << 63), (1 << 63) - 1, 2**64 - 1],
                     dtype=np.uint64)
    w = np.concatenate([w, edges])
    got = _clz64(w)
    want = np.array([64 - int(x).bit_length() for x in w], np.int64)
    assert (got == want).all()


@pytest.mark.usefixtures("ray_session")
def test_hll_linear_counting_regime():
    """sf0.001's vocabulary is far below 2.5·m — linear counting is
    near-exact there."""
    from ray_script_extract.pipelines.sketches import approx_distinct_tokens

    sf = "/root/testdata/sf0.001"
    exact = len(_exact_counts(sf))
    est = int(approx_distinct_tokens(sf)["approx_distinct"].iloc[0])
    assert abs(est - exact) / exact < 0.02, (est, exact)


@pytest.mark.usefixtures("ray_session")
def test_hll_high_cardinality_regime(tmp_path):
    """300k distinct tokens pushes past 2.5·m into the raw-estimator
    regime; HLL's σ at p=14 is ~0.8 %, so 3 % is a 3.7σ bound."""
    import pyarrow.parquet as pq

    from ray_script_extract.pipelines.sketches import approx_distinct_tokens

    n_docs, per_doc = 100, 3000
    texts = [" ".join(f"tok{d}_{i}" for i in range(per_doc))
             for d in range(n_docs)]
    pq.write_table(
        __import__("pyarrow").table({
            "doc_id": np.arange(n_docs, dtype=np.int64),
            "text": texts,
        }), str(tmp_path / "documents.parquet"))
    est = int(approx_distinct_tokens(str(tmp_path))
              ["approx_distinct"].iloc[0])
    exact = n_docs * per_doc
    assert abs(est - exact) / exact < 0.03, (est, exact)


@pytest.mark.usefixtures("ray_session")
def test_sketch_bounds_vs_exact():
    from ray_script_extract.pipelines.sketches import word_frequency_sketch

    sf = "/root/testdata/sf0.001"
    exact = _exact_counts(sf)
    n_total = sum(exact.values())

    # per-batch vocab on the synthetic table is ~31 distinct words;
    # capacity=8 forces real compression in every batch
    got = word_frequency_sketch(sf, k=20, capacity=8)
    assert len(got) == 20
    assert (got["count_lo"] <= got["count_hi"]).all()
    eps = int(got["count_hi"].iloc[0] - got["count_lo"].iloc[0])
    assert eps > 0  # compression fired at capacity=8

    for _, row in got.iterrows():
        true = exact[row["word"]]
        assert row["count_lo"] <= true <= row["count_hi"], row["word"]

    # the MG guarantee: every token with true count > E survives, so
    # the true top token must be the sketch's top token whenever its
    # lead over the runner-up exceeds E.
    (w1, c1), (_, c2) = exact.most_common(2)
    if c1 - c2 > eps:
        assert got["word"].iloc[0] == w1

    # with capacity >= full vocabulary the sketch is EXACT
    big = word_frequency_sketch(sf, k=20, capacity=len(exact) + 1)
    assert (big["count_lo"] == big["count_hi"]).all()
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(zip(big["word"], big["count_lo"])) == want

    # per-step bound E <= sum over batches of N_b/capacity <= N/cap
    # per batch; with B batches E <= B*N/cap — sanity ceiling only
    assert eps <= n_total


@pytest.mark.usefixtures("ray_session")
def test_count_min_bounds():
    """CM point queries never undercount; at default width the
    estimate is exact for every word with no full-row collision
    partner (computed from the same hashes, not assumed); at a
    crushed width the one-sided error shows up but the lower bound
    still holds."""
    from ray_script_extract.pipelines.sketches import (_CM_DEPTH, _CM_WIDTH,
                                                       _cm_hash_pair,
                                                       cm_point_estimates,
                                                       count_min_words)

    sf = "/root/testdata/sf0.001"
    exact = _exact_counts(sf)
    words = sorted(exact)

    cells = count_min_words(sf).to_pandas()
    est = cm_point_estimates(cells, words)
    true = np.array([exact[w] for w in words], np.int64)
    assert (est >= true).all()

    # cell totals conserve mass: each row of the matrix sums to N
    n_total = int(true.sum())
    assert (cells.groupby("row")["cell_count"].sum() == n_total).all()

    # identify words with NO full-depth collision partner: their
    # estimate must be exactly the true count
    h1, h2 = _cm_hash_pair(words, {})
    cols = np.stack([(h1 + r * h2) % _CM_WIDTH for r in range(_CM_DEPTH)])
    clean = np.ones(len(words), bool)
    for i in range(len(words)):
        collide_all = np.ones(len(words), bool)
        for r in range(_CM_DEPTH):
            collide_all &= cols[r] == cols[r, i]
        collide_all[i] = False
        if collide_all.any():
            clean[i] = False
    assert clean.any()
    assert (est[clean] == true[clean]).all()

    # crushed width: heavy collisions, still one-sided
    tiny = count_min_words(sf, depth=2, width=4).to_pandas()
    est_tiny = cm_point_estimates(tiny, words, depth=2, width=4)
    assert (est_tiny >= true).all()
    assert (est_tiny > true).any()
