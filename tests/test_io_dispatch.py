"""sources/io.py: format-dispatching table IO (Lance import-gated;
VERDICT r02 missing #3 made structural)."""

import os

import pytest


def test_parquet_path_reads(ray_session, sf_dir):
    from odinson_ray.sources.io import documents_path, read_table

    p = documents_path(sf_dir)
    assert p.endswith("documents.parquet")  # no .lance in the test data
    ds = read_table(p, columns=["doc_id", "text"])
    t = ds.take_batch(5, batch_format="pyarrow")
    assert set(t.column_names) == {"doc_id", "text"}


def test_lance_path_gated(tmp_path):
    from odinson_ray.sources.io import read_table

    try:
        import lance  # noqa: F401

        pytest.skip("lance installed: the gated branch is the live branch")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="pylance"):
        read_table(str(tmp_path / "documents.lance"))


def test_documents_path_prefers_lance(tmp_path):
    from odinson_ray.sources.io import documents_path

    (tmp_path / "documents.parquet").touch()
    assert documents_path(str(tmp_path)).endswith("documents.parquet")
    (tmp_path / "documents.lance").mkdir()
    assert documents_path(str(tmp_path)).endswith("documents.lance")
