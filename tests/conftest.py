"""Test env: force CPU backend with 8 virtual devices so mesh/sharding tests
run without TPU hardware (reference had no test suite at all — SURVEY.md §4).

Note: the TPU platform plugin in this image force-registers itself and ignores
the JAX_PLATFORMS env var, so we override via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the equivalence tests compile large vmapped
# assembly programs (~1-2 min cold on CPU); warm reruns skip recompilation.
# The directory is keyed by a HOST FINGERPRINT (cpu flags + jaxlib version):
# XLA:CPU cache entries are AOT executables, and loading one compiled on a
# different machine in the fleet can SIGILL/SIGSEGV mid-suite (observed:
# deterministic exit 139 at ~76% of the suite with a cross-host .jax_cache).
import hashlib


def _host_cache_dir():
    try:
        info = open("/proc/cpuinfo").read()
        flags = next((l for l in info.splitlines() if l.startswith("flags")), "")
    except OSError:
        flags = ""
    # cpuinfo flags alone are NOT sufficient: two fleet hosts with an
    # identical flags line can still disagree on the feature set XLA bakes
    # into AOT entries (observed: +prefer-no-scatter mismatch warnings, then
    # a C-level abort mid-suite).  The machine-id pins entries to this boot's
    # host at the cost of cold compiles after a host change.
    try:
        machine = open("/etc/machine-id").read().strip()
    except OSError:
        machine = ""
    import jaxlib

    fp = hashlib.sha256(
        (flags + machine + jaxlib.__version__).encode()
    ).hexdigest()[:12]
    return os.path.join(os.path.dirname(__file__), "..", ".jax_cache", f"cpu-{fp}")


jax.config.update("jax_compilation_cache_dir", _host_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
