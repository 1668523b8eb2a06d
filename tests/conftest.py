"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/collective tests exercise a multi-chip mesh without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# this jax build ships a tpu-tunnel plugin that ignores JAX_PLATFORMS;
# jax.config wins, so set it explicitly before any kernel compiles
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE = pathlib.Path("/root/reference")
