"""Wall-clock timer driving display cadence and the VAL_TIME trigger.

Port of ``lib/utils/timer.py:4-33``. The reference calls
``torch.cuda.synchronize()`` in tic/toc; the JAX analogue is blocking on
outstanding device work, optional here because callers time host-visible
events (the train loop blocks on metrics each DISPLAY interval anyway).
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self, sync=None):
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.start_time = time.time()

    def toc(self, average=True, sync=None):
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff
