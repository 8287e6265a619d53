"""Test config: force the CPU backend with 8 virtual devices (the JAX
fake-backend technique from SURVEY.md §4) and enable x64 so numerical
-derivative checks are meaningful. Production TPU paths stay float32; modules
are dtype-generic.

Note: the session's sitecustomize registers the axon TPU plugin and already
imported jax; claiming the TPU tunnel costs ~150 s at first op, so we switch
platforms via jax.config (env vars are too late) BEFORE any operation runs.
"""
import os

# must precede backend initialization (read at PJRT client creation)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize; backend still uninitialized)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
