"""Logging setup: timestamped file logs plus optional console echo.

Behavior parity with the reference's logging module (reference
logging_config.py:45-95): ``setup_logging`` writes to a
``<prefix>_YYYYmmdd_HHMMSS.log`` file under a log directory (created on
demand), optionally mirrors to stdout, replaces any previously installed
root handlers (so repeated setup never double-logs), and every record is
flushed to disk at emit time — an orchestrator crash must not eat the
tail of the log that explains it.

Differences from the reference, on purpose: one small FileHandler
subclass that flushes per record instead of a hand-rolled stream-managing
StreamHandler with redundant fsync/double-flush paths, and a hook to
quiet the chatty py4j/pyspark loggers that would otherwise drown the
orchestrator's own records.
"""

from __future__ import annotations

import logging
import sys
from datetime import datetime
from pathlib import Path

LOG_PREFIX = "blue_green_etl"
_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"

# JVM-bridge loggers that flood INFO with connection chatter
_NOISY = ("py4j", "pyspark")

# Handlers installed by setup_logging, so repeated setups replace only
# what this module owns — never a host application's handlers.
_INSTALLED: set[logging.Handler] = set()


class FlushingFileHandler(logging.FileHandler):
    """FileHandler that flushes after every record, so the log file is
    readable mid-run and complete after a crash."""

    def emit(self, record: logging.LogRecord) -> None:
        super().emit(record)
        self.flush()


def setup_logging(
    log_dir: str | Path | None = None,
    log_level: int = logging.INFO,
    console: bool = True,
    quiet_spark: bool = True,
) -> logging.Logger:
    """Install file (+ optional console) handlers on the root logger.

    - ``log_dir`` defaults to ``logs/`` under the current working
      directory (NOT the installed package, which may be read-only);
      it is created if missing.
    - The file name carries a second-resolution timestamp; two setups in
      the same second share one file in append mode (the reference's
      append contract).
    - Handlers THIS module previously installed are removed first —
      calling this twice must not duplicate output. Handlers owned by a
      host application or test harness are left untouched (removing and
      closing foreign handlers would break the embedder's logging).
    Returns the root logger.
    """
    log_dir = Path(log_dir) if log_dir is not None else Path.cwd() / "logs"
    log_dir.mkdir(parents=True, exist_ok=True)
    stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    log_file = log_dir / f"{LOG_PREFIX}_{stamp}.log"

    formatter = logging.Formatter(_FORMAT, _DATE_FORMAT)
    root = logging.getLogger()
    root.setLevel(log_level)
    for h in list(_INSTALLED):
        if h in root.handlers:
            root.removeHandler(h)
        h.close()
        _INSTALLED.discard(h)

    file_handler = FlushingFileHandler(log_file, mode="a", encoding="utf-8")
    file_handler.setLevel(log_level)
    file_handler.setFormatter(formatter)
    root.addHandler(file_handler)
    _INSTALLED.add(file_handler)

    if console:
        console_handler = logging.StreamHandler(sys.stdout)
        console_handler.setLevel(log_level)
        console_handler.setFormatter(formatter)
        root.addHandler(console_handler)
        _INSTALLED.add(console_handler)

    if quiet_spark:
        for name in _NOISY:
            logging.getLogger(name).setLevel(max(log_level, logging.WARNING))

    return root


def get_logger(name: str) -> logging.Logger:
    """Named logger accessor (reference logging_config.py get_logger)."""
    return logging.getLogger(name)
