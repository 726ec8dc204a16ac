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


def test_cli_config_resolution(tmp_path):
    """--config resolution order: builtin → JSON file → store lookup."""
    import json

    import pytest

    from jobs.extract import _resolve_config
    from table_ocr_spark.config import ALT_CONFIG, DEFAULT_CONFIG, ExtractorConfig
    from table_ocr_spark.sources.config_store import ConfigStore

    assert _resolve_config("default", None) is DEFAULT_CONFIG
    assert _resolve_config("alt", None) is ALT_CONFIG
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"name": "filecfg", "min_columns": 4}))
    assert _resolve_config(str(p), None).min_columns == 4
    store = ConfigStore(str(tmp_path / "store"))
    saved = ExtractorConfig(name="mystore", min_columns=5, recognizer="identity")
    store.save(saved)
    got = _resolve_config("mystore", str(tmp_path / "store"))
    assert got == saved and got.config_hash() == saved.config_hash()
    with pytest.raises(SystemExit):
        _resolve_config("nope", str(tmp_path / "store"))
    with pytest.raises(SystemExit):
        _resolve_config("nope", None)


def test_config_cli_crud(tmp_path, capsys):
    import json

    from jobs.config import main as config_main

    store = str(tmp_path / "store")
    config_main(["--store", store, "save", "exp1", "--set", "min_columns=3",
                 "--set", "column_strategy=bin"])
    out = json.loads(capsys.readouterr().out)
    assert out["saved"] == "exp1" and len(out["config_hash"]) == 16
    config_main(["--store", store, "get", "exp1"])
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["min_columns"] == 3 and cfg["column_strategy"] == "bin"
    config_main(["--store", store, "list"])
    assert json.loads(capsys.readouterr().out) == ["exp1"]
    import pytest

    with pytest.raises(SystemExit):
        config_main(["--store", store, "save", "bad", "--set", "no_such_knob=1"])
    config_main(["--store", store, "delete", "exp1"])
    assert json.loads(capsys.readouterr().out) == {"deleted": True}
