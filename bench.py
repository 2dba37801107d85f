#!/usr/bin/env python3
"""Headline benchmark: batched SOLO12 gait-NLP solves per second on one chip.

Baseline: the reference's TOWR/IPOPT inner loop runs ~1.3 solves/s/core
(logs/towr_log.out:81-82: ~0.75 s CPU per solve — see BASELINE.md).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

BASELINE_SOLVES_PER_S = 1.3


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_default_matmul_precision", "highest")

    from qtos_tpu.solver import SolverConfig, default_spec
    from qtos_tpu.solver.solve import solve_batch
    from qtos_tpu.terrain import make_terrain

    terrain = make_terrain(["plane", "plane", "plane"])
    # 3 LM iterations under the retuned 0.75/2.0 damping schedule converge
    # this entire scenario distribution (measured r05: 8192/8192 at B=8192;
    # the round-4 regression was the old 0.4/4.0 schedule wasting iterations
    # in reject/back-off cycles).  The compacted rescue pass (12 more
    # iterations, cap grown to the actual failure mass) covers any tail —
    # a distribution shift degrades to "slower", never to unconverged
    # results.  (IPOPT runs 7-8 interior-point iterations per solve on this
    # problem class.)
    cfg = SolverConfig(max_iters=3, rescue_iters=12)
    K = 41

    def build(batch):
        goals = jnp.linspace(0.3, 0.8, batch)
        return jax.vmap(lambda g: default_spec(terrain, goal_xy=(g, 0.0), K=K))(goals)

    # NOTE: called eagerly — solve_batch jits its passes internally, and the
    # rescue pass needs the pass-1 statuses on host to compact the tail.
    solve_c = lambda s: solve_batch(s, terrain, cfg)  # noqa: E731

    import os

    best = 0.0
    # 1024 is near the throughput knee; 8192 squeezes out the last ~7% by
    # amortizing fixed per-call work (measured: 3.69k/s @1024, 3.95k/s @8192).
    sizes = tuple(
        int(s) for s in os.environ.get("QTOS_BENCH_BATCHES", "1024,8192").split(",")
    )
    # Peak used for the MFU estimate: TPU v5e MXU ~197 TFLOP/s bf16; the
    # solver runs f32 at `highest` precision (~1/4 of bf16 throughput on the
    # MXU), and most of its FLOPs are tiny-block (36-wide) ops that cannot
    # tile the 128x128 MXU anyway — MFU here measures how far this
    # latency-structured workload sits from the matmul roofline, to aim
    # future perf work (assembly vs solve), not a target to saturate.
    PEAK_F32 = 197e12 / 4

    for B in sizes:
        specs = build(B)
        res = solve_c(specs)
        _ = np.asarray(res.status)            # compile + warm (forced fetch)

        flops = None
        try:
            from qtos_tpu.solver.solve import _solve_pass

            pass1 = cfg.replace(rescue_iters=0)
            comp = _solve_pass.lower(specs, terrain, pass1).compile()
            ca = comp.cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            flops = float(ca.get("flops", 0.0)) or None
        except Exception as e:
            print(f"# cost_analysis unavailable: {e}", flush=True)

        t0 = time.time()
        res = solve_c(specs)
        # NOTE: end timing on a host fetch of the statuses: consuming them is
        # what real callers do, and it transitively forces the eager rescue
        # pass (which dispatches only after pass-1 statuses are read), making
        # it the honest end-to-end marker.
        conv = int(np.sum(np.asarray(res.status) == 0))
        dt = time.time() - t0
        rate = B / dt
        line = f"# B={B}: {dt:.3f}s -> {rate:.1f} solves/s ({conv}/{B} converged)"
        if flops:
            fps = flops / dt
            line += (f" | {flops/1e9:.1f} GFLOP pass-1 -> {fps/1e12:.3f} TFLOP/s"
                     f" (~{100*fps/PEAK_F32:.1f}% of f32 peak)")
        print(line, flush=True)
        if rate > best:
            best = rate

    print(
        json.dumps(
            {
                "metric": "gait_nlp_solves_per_s",
                "value": round(best, 1),
                "unit": "solves/s/chip",
                "vs_baseline": round(best / BASELINE_SOLVES_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
