"""Logging setup (role of reference utils.py:395-497): stream + file handlers."""
from __future__ import annotations

import logging
import os
import sys

_FMT = "%(asctime)s %(levelname).1s %(name)s: %(message)s"


def get_logger(name: str = "lp_gnn_tpu") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger().handlers:
        set_stream_logger()
    return logger


def set_stream_logger(level: int = logging.INFO) -> None:
    root = logging.getLogger()
    root.setLevel(level)
    for h in root.handlers:
        if isinstance(h, logging.StreamHandler) and not isinstance(h, logging.FileHandler):
            return
    h = logging.StreamHandler(sys.stderr)
    h.setFormatter(logging.Formatter(_FMT))
    root.addHandler(h)


def set_file_logger(log_dir: str, fname: str = "log-ing", level: int = logging.INFO) -> str:
    """Attach a file handler writing under ``log_dir`` (reference utils.py:490-497)."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, fname)
    root = logging.getLogger()
    root.setLevel(level)
    for h in root.handlers:
        if isinstance(h, logging.FileHandler) and getattr(h, "baseFilename", None) == os.path.abspath(path):
            return path
    h = logging.FileHandler(path)
    h.setFormatter(logging.Formatter(_FMT))
    root.addHandler(h)
    return path
