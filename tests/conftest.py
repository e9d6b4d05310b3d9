"""Test config: run on CPU with 8 virtual devices so sharding paths are
testable without a TPU pod (SURVEY §4 'Implication for the build').

Note: the env var JAX_PLATFORMS alone is NOT enough here — the installed
'axon' TPU plugin still claims the backend — so we also force the platform
through jax.config before any backend is initialized.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
