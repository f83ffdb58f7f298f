from __future__ import annotations

import pytest

from neo4j_blue_green_arrow_etl_spark.config import (
    ConfigError,
    DEFAULTS,
    interpolate,
    load_config,
)


def test_interpolate_env(monkeypatch):
    monkeypatch.setenv("NBG_HOST", "example.com")
    assert interpolate("bolt://${NBG_HOST}:7687") == "bolt://example.com:7687"


def test_interpolate_default(monkeypatch):
    monkeypatch.delenv("NBG_MISSING", raising=False)
    assert interpolate("${NBG_MISSING:fallback}") == "fallback"


def test_interpolate_missing_raises(monkeypatch):
    monkeypatch.delenv("NBG_MISSING", raising=False)
    with pytest.raises(ConfigError):
        interpolate("${NBG_MISSING}")


def test_load_config_defaults():
    cfg = load_config()
    assert cfg["orchestrator"]["scan_interval"] == DEFAULTS["orchestrator"]["scan_interval"]
    assert cfg["worker"]["arrow_table_size"] == 100_000


def test_load_config_yaml_with_env(tmp_path, monkeypatch):
    monkeypatch.setenv("NBG_INTERVAL", "5")
    p = tmp_path / "config.yaml"
    p.write_text("orchestrator:\n  scan_interval: ${NBG_INTERVAL}\n")
    cfg = load_config(p)
    # whole-scalar ${...} placeholders come back YAML-typed
    assert cfg["orchestrator"]["scan_interval"] == 5


def test_validate_rejects_negative():
    with pytest.raises(ConfigError):
        load_config(overrides={"orchestrator": {"scan_interval": -1}})


def test_validate_rejects_zero_workers():
    with pytest.raises(ConfigError):
        load_config(overrides={"orchestrator": {"num_workers": 0}})
