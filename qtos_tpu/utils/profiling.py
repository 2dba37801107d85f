"""Tracing / profiling (SURVEY.md §5.1).

The reference has no tracing at all — only wall-clock deltas in the sim loop
(reference: scripts/run.py:121, 152, 168) and IPOPT's own timing printout
captured in logs/towr_log.out:81-82.  Here profiling is first-class:

- ``trace(logdir)``: a context manager around ``jax.profiler.trace`` that
  captures a TensorBoard-viewable device trace (XLA ops, fusion, HBM traffic)
  of everything run inside it.
- ``annotate(name)``: named region that shows up inside the device trace.
- ``solve_telemetry(result, wall_s)``: per-batch solver telemetry —
  solves/s, convergence counts, violation quantiles — the batched analog of
  IPOPT's per-solve iteration/timing printout.
- ``Timer``: blocking wall timer for jitted calls (forces
  ``block_until_ready`` so async dispatch doesn't hide device time).
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str = "./logs/jax-trace"):
    """Capture a jax.profiler device trace of the enclosed block.

    View with: ``tensorboard --logdir logs/jax-trace`` (or xprof).
    """
    import jax

    with jax.profiler.trace(logdir):
        yield logdir


@contextlib.contextmanager
def annotate(name: str):
    """Named trace region (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Wall timer that blocks on device results.

    >>> with Timer() as t:
    ...     out = jitted(x)
    ...     t.block(out)
    >>> t.elapsed
    """

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.elapsed = None
        return self

    def block(self, *outs):
        """Force completion of `outs`.  Besides block_until_ready, fetches one
        element of each array to host: on tunneled/remote devices
        block_until_ready can return before the producing computation has
        executed, while a host fetch cannot."""
        import jax
        import numpy as np

        for o in outs:
            for leaf in jax.tree.leaves(o):
                jax.block_until_ready(leaf)
                if hasattr(leaf, "ravel") and getattr(leaf, "size", 0) > 0:
                    np.asarray(leaf.ravel()[0])

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False


def solve_telemetry(result, wall_s: float | None = None) -> dict:
    """Summarize a SolveResult batch into a flat metrics dict.

    Mirrors what the reference could only read off IPOPT's log tail
    (iterations, CPU seconds — logs/towr_log.out:44-82), but per-batch and
    machine-readable.
    """
    import numpy as np

    status = np.atleast_1d(np.asarray(result.status))
    viol = np.atleast_1d(np.asarray(result.max_violation))
    merit = np.atleast_1d(np.asarray(result.merit))
    B = int(status.shape[0])
    out = {
        "batch": B,
        "converged": int((status == 0).sum()),
        "convergence_rate": float((status == 0).mean()),
        "max_violation_p50": float(np.quantile(viol, 0.5)),
        "max_violation_p95": float(np.quantile(viol, 0.95)),
        "max_violation_max": float(viol.max()),
        "merit_p50": float(np.quantile(merit, 0.5)),
        "iters": int(np.max(np.atleast_1d(np.asarray(result.iters)))),
    }
    if wall_s is not None and wall_s > 0:
        out["wall_s"] = float(wall_s)
        out["solves_per_s"] = float(B / wall_s)
    return out
