import os

# Unit tests always run on CPU: the real-TPU 'axon' tunnel is slow (every
# jit round-trips a remote compile) and bench.py is what exercises the real
# chip. The axon backend is registered by a sitecustomize module at
# interpreter start, which imports jax before this file runs — so the
# platform must be overridden through jax.config, not the environment.
# Multi-chip sharding tests use a virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
