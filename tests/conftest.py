import os

# Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (mirrors the driver's dryrun_multichip environment).
# NB: this environment's TPU plugin swallows the JAX_PLATFORMS env var, so the
# platform must ALSO be pinned through jax.config (verified: env alone is
# ignored and tests would silently run on the tunneled TPU).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite's cost is dominated by dozens of jitted
# step-variant compiles on one CPU core; repeat runs hit the cache (keyed on
# HLO, so code changes recompile exactly what changed)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_state():
    """Drop live jit executables between test modules.

    A single full-tier process (pytest -m "") accumulates ~90 tests worth of
    XLA:CPU executables and has segfaulted mid-suite (rc=139,
    .hwq_results/pytest_full_tier_r4d.log) in a test that passes in
    isolation. Clearing the in-memory caches at module boundaries bounds
    that accumulation; recompiles stay cheap via the on-disk persistent
    cache above. tools/run_full_tier.sh (per-file processes) remains the
    belt-and-braces fallback."""
    yield
    jax.clear_caches()
