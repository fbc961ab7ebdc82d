"""The Lance-format gate (BASELINE.json input_hint names Lance as the
production table format; the package is absent in this container, so
the parquet fallback is the path that runs here).  These tests keep
the gated branch import-checked so a future container WITH lance
exercises the real path without code changes."""

from __future__ import annotations

import importlib.util

import pytest

_HAS_LANCE = importlib.util.find_spec("lance") is not None


def test_gate_matches_environment():
    import ray.data

    from ray_script_extract.pipelines.extract_pipeline import read_corpus

    # the fallback decision must track the actual environment
    if _HAS_LANCE:
        assert hasattr(ray.data, "read_lance")
    else:
        with pytest.raises(ImportError):
            import lance  # noqa: F401
    # the gated function itself is importable and callable either way
    assert callable(read_corpus)


@pytest.mark.skipif(not _HAS_LANCE, reason="lance not installed in "
                    "this container — parquet fallback covered by "
                    "test_parquet_fallback_roundtrip")
def test_lance_roundtrip(tmp_path, ray_session):
    import ray.data

    from ray_script_extract.pipelines.extract_pipeline import (
        read_corpus,
        write_corpus,
    )

    ds = ray.data.range(10)
    write_corpus(ds, str(tmp_path / "t.lance"))
    assert read_corpus(str(tmp_path / "t.lance")).count() == 10


@pytest.mark.usefixtures("ray_session")
def test_parquet_fallback_roundtrip(tmp_path):
    from ray_script_extract.corpus import write_corpus_parquet
    from ray_script_extract.pipelines.extract_pipeline import read_corpus

    d = str(tmp_path / "corpus")
    write_corpus_parquet(40, d, docs_per_shard=20)
    ds = read_corpus(d)
    assert ds.count() == 40
    assert set(ds.schema().names) >= {"doc_id", "spans"}
