"""Test-tier setup: run everything on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 implication: unlike the reference (which has no
CPU-runnable tests), scheduler/allocator/attention semantics are all
validated on the JAX CPU backend with pallas interpret mode.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

# The axon TPU plugin force-registers itself; config.update wins over env.
jax.config.update("jax_platforms", "cpu")
