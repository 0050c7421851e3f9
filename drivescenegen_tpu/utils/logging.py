"""Logging + lightweight metric writers.

Replaces the reference's per-module get_logger (utils/io.py:11-25) and the
accelerate/tensorboard logging (pipeline/training_pipeline.py:51-53,94-96)
with stdlib logging plus a JSONL/TensorBoard metric writer.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Optional


_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"

# The active rotating-file handler, if configure_file_logging has run;
# get_logger attaches it to loggers created later.
_file_handler = None


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(_FORMAT))
        logger.addHandler(handler)
        logger.propagate = False
    if _file_handler is not None and _file_handler not in logger.handlers:
        logger.addHandler(_file_handler)
    logger.setLevel(level)
    return logger


def configure_file_logging(log_dir: str, max_bytes: int = 10 * 1024 * 1024,
                           backup_count: int = 20) -> str:
    """Attach a rotating-file handler to the root logger AND to every
    get_logger-style (non-propagating) logger, existing or future
    (the reference's config/logging.yaml rotating handlers).
    Returns the log file path."""
    import logging.handlers

    global _file_handler

    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "drivescenegen.log")
    root = logging.getLogger()
    if root.level > logging.INFO or root.level == logging.NOTSET:
        root.setLevel(logging.INFO)  # reference logging.yaml: root level INFO

    if _file_handler is None or \
            getattr(_file_handler, "baseFilename", None) != os.path.abspath(path):
        handler = logging.handlers.RotatingFileHandler(
            path, maxBytes=max_bytes, backupCount=backup_count, encoding="utf8"
        )
        handler.setFormatter(logging.Formatter(_FORMAT))
        handler.setLevel(logging.INFO)
        root.addHandler(handler)
        _file_handler = handler

    # Non-propagating loggers (our get_logger pattern) need the handler
    # directly; run the mirror on every call so late-created loggers from
    # repeat configuration also get covered.
    for name in list(logging.Logger.manager.loggerDict):
        lg = logging.getLogger(name)
        if isinstance(lg, logging.Logger) and lg.handlers and not lg.propagate:
            if _file_handler not in lg.handlers:
                lg.addHandler(_file_handler)
    return path


class MetricWriter:
    """Writes scalar metrics to a JSONL file and (optionally) TensorBoard."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: dict) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for key, value in metrics.items():
                self._tb.add_scalar(key, float(value), int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StageTimer:
    """Per-stage wall-clock timers (the reference has only tqdm bars)."""

    def __init__(self):
        self.totals: dict = {}
        self._starts: dict = {}

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str) -> float:
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] = self.totals.get(name, 0.0) + dt
        return dt

    def summary(self) -> str:
        return ", ".join(f"{k}: {v:.2f}s" for k, v in sorted(self.totals.items()))
