"""Logging setup behavior — mirrors the reference's logging test
contract (reference test_logging_config.py): file creation, immediate
flush, console on/off, append across repeated setup, no handler
duplication."""

from __future__ import annotations

import logging

from neo4j_blue_green_arrow_etl_spark.logging_setup import (
    LOG_PREFIX,
    get_logger,
    setup_logging,
)


def _teardown():
    root = logging.getLogger()
    for h in list(root.handlers):
        root.removeHandler(h)
        h.close()


def _log_files(log_dir):
    return sorted(log_dir.glob(f"{LOG_PREFIX}_*.log"))


def test_creates_timestamped_file_and_writes(tmp_path):
    try:
        setup_logging(log_dir=tmp_path / "logs", console=False)
        get_logger("t").info("hello file")
        files = _log_files(tmp_path / "logs")
        assert len(files) == 1
        assert "hello file" in files[0].read_text()
        # formatter carries name and level
        assert " - t - INFO - " in files[0].read_text()
    finally:
        _teardown()


def test_flushes_immediately(tmp_path):
    """The record must be on disk right after emit — no close/exit
    needed (the crash-tail contract)."""
    try:
        setup_logging(log_dir=tmp_path / "logs", console=False)
        get_logger("t").info("now visible")
        content = _log_files(tmp_path / "logs")[0].read_text()
        assert "now visible" in content
    finally:
        _teardown()


def test_console_echo_toggles(tmp_path, capsys):
    try:
        setup_logging(log_dir=tmp_path / "logs", console=True)
        get_logger("t").info("to console")
        assert "to console" in capsys.readouterr().out
        setup_logging(log_dir=tmp_path / "logs", console=False)
        get_logger("t").info("file only")
        assert "file only" not in capsys.readouterr().out
    finally:
        _teardown()


def test_repeat_setup_appends_and_never_duplicates(tmp_path):
    try:
        setup_logging(log_dir=tmp_path / "logs", console=False)
        get_logger("t").info("first message")
        setup_logging(log_dir=tmp_path / "logs", console=False)
        get_logger("t").info("second message")
        combined = "".join(f.read_text() for f in _log_files(tmp_path / "logs"))
        assert "first message" in combined
        assert "second message" in combined
        # handler replacement: exactly one copy of each record
        assert combined.count("message") == 2
        # and exactly one file handler installed
        assert (
            sum(
                isinstance(h, logging.FileHandler)
                for h in logging.getLogger().handlers
            )
            == 1
        )
    finally:
        _teardown()


def test_foreign_handlers_survive_setup(tmp_path):
    """A handler installed by a host application (or pytest's capture
    plugin) must NOT be removed or closed by setup_logging — only
    handlers this module itself installed are replaced."""
    root = logging.getLogger()
    foreign = logging.NullHandler()
    root.addHandler(foreign)
    try:
        setup_logging(log_dir=tmp_path / "logs", console=False)
        assert foreign in root.handlers
        setup_logging(log_dir=tmp_path / "logs", console=False)
        assert foreign in root.handlers
        # while module-owned handlers are still replaced, not stacked
        assert (
            sum(isinstance(h, logging.FileHandler) for h in root.handlers)
            == 1
        )
    finally:
        root.removeHandler(foreign)
        _teardown()


def test_default_log_dir_is_cwd_not_package(tmp_path, monkeypatch):
    """Default log_dir must live under the process cwd — the installed
    package directory may be read-only (site-packages, zipapp)."""
    monkeypatch.chdir(tmp_path)
    try:
        setup_logging(console=False)
        assert _log_files(tmp_path / "logs")
    finally:
        _teardown()


def test_level_filters_and_quiets_spark(tmp_path):
    try:
        setup_logging(
            log_dir=tmp_path / "logs", log_level=logging.WARNING, console=False
        )
        get_logger("t").info("dropped")
        get_logger("t").warning("kept")
        content = _log_files(tmp_path / "logs")[0].read_text()
        assert "dropped" not in content
        assert "kept" in content
        assert logging.getLogger("py4j").level >= logging.WARNING
    finally:
        _teardown()
