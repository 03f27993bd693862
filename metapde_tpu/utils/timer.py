"""Wall-clock timing context manager (reference: src/util/timer.py:5-28).

Use together with jax.block_until_ready() for async-dispatch-correct timing.
"""

import time


class Timer:
    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.end = time.perf_counter()
        self.interval = self.end - self.start
        return False
