"""Wall-clock timing decorator (reference ``timeit``, src/utils.py:107-118)."""

from __future__ import annotations

import functools
import time


def timeit(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        print(f"{fn.__name__} took {time.perf_counter() - t0:.2f}s", flush=True)
        return out

    return wrapper
