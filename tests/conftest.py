"""Test-tier setup: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 implication: unlike the reference (which has no
CPU-runnable tests), scheduler/allocator/attention semantics are all
validated on the JAX CPU backend with pallas interpret mode.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# persistent compile cache: engine jit signatures repeat across tests
# and across runs; re-runs of the suite skip most XLA compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache_tests")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

import jax  # noqa: E402

# The axon TPU plugin force-registers itself; config.update wins over env.
jax.config.update("jax_platforms", "cpu")
