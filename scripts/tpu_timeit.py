"""Ad-hoc TPU micro-benchmark helper for the axon remote tunnel.

The tunnel dispatches lazily and adds jittery RTT, so single measurements
and even two-length slopes can be poisoned (negative slopes observed).
``timeit`` runs a serialized data-dependent chain of ``n`` calls and takes
the MINIMUM per-call time across trials: the minimum of (t_chain / n) is
robust to hiccups and over-estimates by at most (dispatch+fetch)/n.

Usage: from scripts.tpu_timeit import timeit
"""

from __future__ import annotations

import time

import numpy as np


def timeit(step, x0, *args, n: int = 44, trials: int = 6, warmup: int = 3,
           label: str = "") -> float:
    """step(x, *args) -> next x (same shape/dtype). Returns best per-call
    seconds; prints all trials when label is given."""
    x = x0
    for _ in range(warmup):
        x = step(x, *args)
    np.asarray(x)
    per_call = []
    for _ in range(trials):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x, *args)
        np.asarray(x)
        per_call.append((time.perf_counter() - t0) / n)
    per_call.sort()
    if label:
        print(f"{label}: {[round(t * 1000, 3) for t in per_call[:4]]} ms")
    return per_call[0]
