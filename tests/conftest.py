"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip sharding paths
can be validated without TPU hardware (SURVEY.md §4).

Note: this environment's sitecustomize registers the 'axon' TPU PJRT plugin and
overrides jax_platforms programmatically, so setting JAX_PLATFORMS=cpu in the
environment is NOT enough — we must update jax.config after import, before any
backend is initialized.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# ---- fast/slow test tiers (VERDICT r3 item 6) -------------------------------
# The full suite takes ~30 min on this 1-core host (Pallas interpret mode
# dominates); `pytest -m "not slow"` is the <5 min inner-loop tier.  Durations
# are appended to tests/.durations.txt on every run so the tier assignment
# stays data-driven (re-check when a module's time profile changes).

_DUR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".durations.txt")


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled-executable state between modules: a monolithic
    `pytest tests/` run segfaulted INSIDE the XLA CPU compiler (r5, twice,
    same spot — test_pallas_kernel's rewind case, ~130 tests in) while the
    same module alone passes 42/42.  The crash correlates with accumulated
    in-process compiler/executable state, and clearing the jit caches at
    module boundaries removes it; each module recompiles what it needs."""
    yield
    import jax

    jax.clear_caches()


def pytest_runtest_logreport(report):
    if report.when == "call":
        try:
            with open(_DUR_PATH, "a") as f:
                f.write(f"{report.duration:9.2f}  {report.nodeid}\n")
        except OSError:
            pass
