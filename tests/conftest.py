"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip sharding paths can
be validated without TPU hardware (SURVEY.md §4).  Environment must be set before the
first `import jax` anywhere in the test process.
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
