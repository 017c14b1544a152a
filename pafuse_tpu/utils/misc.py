"""Small host-side utilities (reference: common/utils.py, common/logging.py)."""

from __future__ import annotations

import hashlib
import os
import sys
from typing import Optional


def deterministic_random(min_value: int, max_value: int, data: str) -> int:
    """SHA-256-keyed deterministic draw (common/utils.py:39-42)."""
    digest = hashlib.sha256(data.encode()).digest()
    raw_value = int.from_bytes(digest[:4], byteorder="little", signed=False)
    return int(raw_value / (2 ** 32 - 1) * (max_value - min_value)) + min_value


class Logger:
    """stdout tee to a log file (common/logging.py:7-17)."""

    def __init__(self, filename: str, stream=None):
        self.terminal = stream or sys.stdout
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        self.log = open(filename, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)
        self.log.flush()

    def flush(self):
        self.terminal.flush()
        self.log.flush()


class Timer:
    """Wall-clock context timer (in_the_wild/utils.py:167-178)."""

    def __init__(self, message: str = "", show: bool = True):
        self.message = message
        self.show = show
        self.elapsed = 0.0

    def __enter__(self):
        import time
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        import time
        self.elapsed = time.perf_counter() - self._start
        if self.show:
            print(f"{self.message} {self.elapsed:.3f}s")
        return False
