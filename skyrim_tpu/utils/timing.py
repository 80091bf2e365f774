"""Wall-clock timing helpers (reference: skyrim/core/utils.py:8-16)."""

from __future__ import annotations

import functools
import time
from contextlib import contextmanager

from skyrim_tpu.utils.logging import logger


def timeit(fn):
    """Decorator logging the wall time of each call at DEBUG level."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        start = time.perf_counter()
        result = fn(*args, **kwargs)
        logger.debug("%s took %.3fs", fn.__qualname__, time.perf_counter() - start)
        return result

    return wrapper


class Timer:
    """Accumulating timer usable as a context manager.

    >>> t = Timer()
    >>> with t:
    ...     do_work()
    >>> t.elapsed  # seconds
    """

    def __init__(self):
        self.elapsed = 0.0
        self.count = 0
        self._start = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed += time.perf_counter() - self._start
        self.count += 1
        self._start = None
        return False

    @property
    def mean(self) -> float:
        return self.elapsed / max(self.count, 1)


@contextmanager
def log_time(label: str):
    start = time.perf_counter()
    yield
    logger.info("%s: %.3fs", label, time.perf_counter() - start)
