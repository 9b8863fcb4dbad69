"""Profiling utilities: XLA trace capture + honest device timing.

The reference's only instrumentation is a cuda-synchronized Timer
(``lib/utils/timer.py``); here:

  - :func:`trace` wraps ``jax.profiler`` for TensorBoard-viewable traces
  - :func:`device_time` measures true device time by chaining `iters`
    executions inside one jitted ``lax.scan`` with a carried data
    dependency — REQUIRED on this setup: the axon TPU tunnel has ~30 ms
    host RTT and `block_until_ready` does not reflect device completion
    reliably, so naive timing loops are off by orders of magnitude
    (see bench.py).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn_body, example_input, iters: int = 20):
    """Mean device seconds per call of ``fn_body(x) -> scalar-reducible``.

    fn_body must return something summable to a float32 scalar; the carried
    perturbation (`x + c * 1e-20`) defeats CSE across iterations.
    """
    import jax
    import jax.numpy as jnp

    def repeated(x):
        def body(c, _):
            r = fn_body(x + c * 1e-20)
            return jnp.float32(jnp.sum(r)), ()

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    f = jax.jit(repeated)
    float(f(example_input))  # compile + drain
    t0 = time.perf_counter()
    float(f(example_input))
    return (time.perf_counter() - t0) / iters
