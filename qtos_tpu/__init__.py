"""qtos_tpu — TPU-native Quadruped Trajectory Optimization Stack.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Alexyskoutnev/Quadruped-Trajectory-Optimization-Stack (arXiv:2309.09058):

- ``terrain``   : heightfield tile library + jittable height/gradient queries
                  (reference: QTOS/generateHeightField.py — there a file shipped to a
                  Docker container; here a solver input).
- ``models``    : analytic SOLO12 kinematics/dynamics in JAX
                  (reference: QTOS/robot/robot.py via PyBullet + Pinocchio).
- ``solver``    : batched collocation NLP for single-rigid-body gait optimization
                  (reference: the TOWR/ifopt/IPOPT C++ stack run via `docker exec`).
- ``sim``       : JAX soft-contact rigid-body simulator + PD motor model
                  (reference: PyBullet, QTOS/simulation.py + robot_motor.py).
- ``control``   : 1 kHz control loop, trajectory buffer stitching, receding-horizon
                  replanning (reference: scripts/run.py, scripts/main.py, QTOS/combiner.py).
- ``planner``   : A* global planner, spline paths, batched feasibility maps
                  (reference: QTOS/planner.py, the 32-process Docker sweep).
- ``parallel``  : device-mesh sharding of the scenario batch axis (new capability).
- ``ops``       : math kernels — rotations, Hermite splines, batched block-tridiagonal
                  KKT factorization (Pallas on TPU).
"""

__version__ = "0.1.0"


def _setup_compilation_cache() -> None:
    """Enable JAX's persistent compilation cache.

    The batched solver's Mosaic/XLA compile is minutes cold but milliseconds
    cached; replan loops, benchmarks, and repeated CLI runs all reuse the
    same (shape, config) executables.  Opt out with QTOS_NO_COMPILE_CACHE=1;
    relocate with JAX_COMPILATION_CACHE_DIR.
    """
    import os

    if os.environ.get("QTOS_NO_COMPILE_CACHE"):
        return
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/qtos_jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_compilation_cache()
