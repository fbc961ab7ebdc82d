"""Temperature mixing (curation.sample_temperature_mix): integer
budget algebra and the rare-stratum upsampling property."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_budgets_and_upsampling():
    from ray_script_extract.pipelines.curation import sample_temperature_mix

    total = 120
    out = sample_temperature_mix(SF, total_budget=total)
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang"]).to_pandas()
    counts = docs["lang"].value_counts().to_dict()
    weights = {k: math.isqrt(v) for k, v in counts.items()}
    wsum = sum(weights.values())
    budgets = {k: total * w // wsum for k, w in weights.items()}

    got = df["lang"].value_counts().to_dict()
    # each stratum delivers exactly min(budget, count) rows
    for k, b in budgets.items():
        assert got.get(k, 0) == min(b, counts[k]), k
    assert len(df) <= total  # floor remainders dropped, never exceeded

    # the temperature property: the dominant stratum's SHARE of the
    # sample is strictly below its share of the corpus; the rarest
    # stratum's share is at or above its corpus share
    big = max(counts, key=lambda k: (counts[k], k))
    small = min(counts, key=lambda k: (counts[k], k))
    assert got[big] / len(df) < counts[big] / len(docs)
    assert got[small] / len(df) >= counts[small] / len(docs) * 0.95


@pytest.mark.usefixtures("ray_session")
def test_deterministic():
    from ray_script_extract.pipelines.curation import sample_temperature_mix

    a = sample_temperature_mix(SF).to_pandas()
    b = sample_temperature_mix(SF).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_budget_algebra_properties():
    """Pure integer budget algebra (no Ray): budgets never exceed the
    total, are monotone in counts, and alpha=0.5 compresses ratios —
    hypothesis-style sweep over random count distributions."""
    import random

    rng = random.Random(13)
    for _ in range(200):
        counts = {f"s{i}": rng.randint(1, 10_000)
                  for i in range(rng.randint(1, 12))}
        total = rng.randint(1, 5_000)
        weights = {k: math.isqrt(v) for k, v in counts.items()}
        wsum = sum(weights.values())
        budgets = {k: total * w // wsum for k, w in weights.items()}
        assert sum(budgets.values()) <= total
        # monotone: bigger stratum never gets a smaller budget
        ks = sorted(counts, key=lambda k: counts[k])
        for a, b in zip(ks, ks[1:]):
            assert budgets[a] <= budgets[b]
        # temperature damping, exact floor-aware bound: budget_hi =
        # floor(T*w_hi/wsum) <= (w_hi/w_lo) * (T*w_lo/wsum) <
        # (w_hi/w_lo) * (budget_lo + 1).  (The naive "budget ratio <=
        # count ratio" fails for small counts where isqrt floors, e.g.
        # isqrt(3)=1 vs isqrt(4)=2.)
        lo, hi = ks[0], ks[-1]
        if weights[lo] > 0:
            assert (budgets[hi]
                    < weights[hi] / weights[lo] * (budgets[lo] + 1))
