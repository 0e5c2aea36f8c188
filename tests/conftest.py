"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/collective tests need multiple devices; real TPU hardware is not
required for correctness testing. The axon sitecustomize force-selects the
TPU platform via jax config, so the env var alone is not enough -- we update
the config directly before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
