"""Skew defusal: the two-branch bucketed pipeline preserves every
document and matches the unbucketed output per doc."""

from __future__ import annotations

import pytest


@pytest.mark.usefixtures("ray_session")
def test_skew_defuse_preserves_all_docs():
    from ray_script_extract.corpus import corpus_dataset
    from ray_script_extract.pipelines.extract_pipeline import (
        build_extract_pipeline,
    )

    # indices 0..119 include one 'large' (0) and several 'medium' docs
    ds1 = corpus_dataset(120, docs_per_block=30)
    ds2 = corpus_dataset(120, docs_per_block=30)
    plain = {r["doc_id"]: [s["kind"] for s in r["spans"]]
             for r in build_extract_pipeline(ds1).iter_rows()}
    defused = {r["doc_id"]: [s["kind"] for s in r["spans"]]
               for r in build_extract_pipeline(ds2, skew_defuse=True).iter_rows()}
    assert set(plain) == set(defused)
    assert plain == defused
    assert len(plain) == 120
