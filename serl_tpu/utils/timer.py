"""Phase timer (capability parity: reference `utils/timer_utils.py:19-55`).

tick/tock + context manager; `get_average_times(reset=True)` returns the mean
wall time per phase since the last reset. The fused TPU loop mostly makes
this unnecessary (one program), but the async mode and host loops use it,
and `jax_profile` adds device-level tracing the reference lacked.
"""

import contextlib
import time
from collections import defaultdict


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.counts = defaultdict(int)
        self.times = defaultdict(float)
        self.start_times = {}

    def tick(self, key: str):
        if key in self.start_times:
            raise ValueError(f"Timer is already ticking for key: {key}")
        self.start_times[key] = time.perf_counter()

    def tock(self, key: str):
        if key not in self.start_times:
            raise ValueError(f"Timer is not ticking for key: {key}")
        self.counts[key] += 1
        self.times[key] += time.perf_counter() - self.start_times[key]
        del self.start_times[key]

    @contextlib.contextmanager
    def context(self, key: str):
        self.tick(key)
        try:
            yield
        finally:
            self.tock(key)

    def get_average_times(self, reset: bool = True):
        ret = {k: self.times[k] / self.counts[k] for k in self.counts}
        if reset:
            self.reset()
        return {k: round(v, 6) for k, v in ret.items()}


@contextlib.contextmanager
def jax_profile(logdir: str):
    """Capture a jax profiler trace around a code block (view in
    TensorBoard / xprof). New capability vs the reference (SURVEY.md §5)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
