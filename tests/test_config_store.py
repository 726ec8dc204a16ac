"""Named-config store CRUD (≈ the reference's SQLite config endpoints)."""

import pytest

from table_ocr_spark.config import ALT_CONFIG, DEFAULT_CONFIG, ExtractorConfig
from table_ocr_spark.sources.config_store import ConfigStore


def test_crud_roundtrip(tmp_path):
    store = ConfigStore(str(tmp_path / "configs"))
    h = store.save(DEFAULT_CONFIG)
    assert h == DEFAULT_CONFIG.config_hash()
    got = store.get("default")
    assert got == DEFAULT_CONFIG
    assert store.names() == ["default"]

    store.save(ALT_CONFIG)
    assert store.names() == ["alt", "default"]

    # upsert-by-name (primary key semantics, database.py:32)
    tweaked = ExtractorConfig(name="default", min_columns=5)
    store.save(tweaked)
    assert store.get("default").min_columns == 5
    assert len(store.names()) == 2

    assert store.delete("alt") is True
    assert store.delete("alt") is False
    assert store.get("alt") is None


def test_invalid_name_rejected(tmp_path):
    store = ConfigStore(str(tmp_path / "configs"))
    with pytest.raises(ValueError):
        store.save(ExtractorConfig(name="../evil"))


def test_as_dataframe_joins_lineage_hash(spark, tmp_path):
    store = ConfigStore(str(tmp_path / "configs"))
    store.save(DEFAULT_CONFIG)
    store.save(ALT_CONFIG)
    df = store.as_dataframe(spark)
    rows = {r.name: r.config_hash for r in df.collect()}
    assert rows == {
        "default": DEFAULT_CONFIG.config_hash(),
        "alt": ALT_CONFIG.config_hash(),
    }
