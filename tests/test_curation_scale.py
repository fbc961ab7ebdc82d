"""Scale smoke for the late-round curation/report family: a 30k-doc
synthetic corpus (6x the benched sf0.1 documents table) runs through
the funnel and its constituent reports with the real exchange block
counts.  Asserts structural invariants, not timings (the box's
weather makes wall-clock asserts flaky) — the point is that nothing
in the family degenerates to quadratic work or driver-side
materialization at multi-batch scale."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

_N = 30_000


@pytest.fixture(scope="module")
def scale_dir(tmp_path_factory):
    rng = np.random.default_rng(7)
    vocab = np.array(
        "key agg row scan slow fast table value part hash merge batch "
        "spark a the line sort window order data column join small "
        "customer query big stream group of to in".split(), object)
    lens = rng.integers(10, 100, _N)
    texts = [" ".join(rng.choice(vocab, n)) for n in lens]
    d = tmp_path_factory.mktemp("scale_docs")
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(_N, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(
            np.array(["en", "de", "fr", "es", "zh"], object), _N)),
        "source": pa.array(rng.choice(
            np.array([f"src{i}" for i in range(20)], object), _N)),
        "n_chars": pa.array(np.array([len(s) for s in texts], np.int64)),
    }), str(d / "documents.parquet"))
    return str(d)


def _df(r):
    return r if isinstance(r, pd.DataFrame) else r.to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_funnel_invariants_at_scale(scale_dir):
    from ray_script_extract.pipelines.curation import curation_funnel

    got = curation_funnel(scale_dir)
    counts = got["docs_remaining"].tolist()
    assert counts[0] == _N
    assert counts[1] == _N - _N // 20
    # cumulative stages can only shrink
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[2] > 0  # gopher keeps a nontrivial fraction


@pytest.mark.usefixtures("ray_session")
def test_reports_at_scale(scale_dir):
    from ray_script_extract.pipelines.decontam import (
        contamination_by_source,
        eval_leakage_report,
        source_overlap_matrix,
    )
    from ray_script_extract.pipelines.text_analysis import (
        dsir_importance_weights,
        ngram_diversity,
    )

    dsir = _df(dsir_importance_weights(scale_dir))
    assert len(dsir) == _N - _N // 20  # every nonempty raw doc scored

    leak = _df(eval_leakage_report(scale_dir))
    assert len(leak) == _N // 20
    assert (leak["n_leaked"] <= leak["n_shingles"]).all()

    ov = _df(source_overlap_matrix(scale_dir))
    assert len(ov) == 20 * 19 // 2
    assert (ov["jaccard_ppm"] <= 1_000_000).all()

    cs = _df(contamination_by_source(scale_dir))
    assert len(cs) == 20
    assert int(cs["n_train_docs"].sum()) == _N - _N // 20

    div = _df(ngram_diversity(scale_dir))
    assert div["n"].tolist() == [1, 2, 3]
    # distinct-n is monotone in n on any natural corpus this size
    assert div["distinct_ppm"].is_monotonic_increasing
