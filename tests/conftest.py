"""Test configuration: run on CPU with 8 virtual devices, float64 enabled.

Multi-chip sharding is validated on a virtual CPU mesh
(xla_force_host_platform_device_count=8); real-TPU behavior is exercised
by bench.py and the driver's graft entry checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# jax may already be imported by the interpreter's sitecustomize with a
# TPU platform pre-registered; override at the config level too (works as
# long as no backend has been initialized yet).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# No persistent compilation cache under pytest: the harness's hosts vary
# between sessions (and its remote-compile hook targets the compile
# server's ISA), so cached XLA:CPU AOT executables can carry machine
# features this host lacks — observed as cpu_aot_loader feature-mismatch
# warnings and intermittent SIGABRTs inside cache writes during full-suite
# runs. CPU test compiles are cheap; correctness beats cache warmth here.
jax.config.update("jax_enable_compilation_cache", False)
