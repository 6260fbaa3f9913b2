"""Tests run on a virtual 8-device CPU mesh so sharding paths are exercised
without TPU hardware (the driver benches on the real chip separately).

The container pins JAX_PLATFORMS=axon via sitecustomize, so the env-var
route is not enough — force the platform through jax.config before any
backend initializes. Set MI_TPU_TESTS=1 to run the suite on the real chip.
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

if not os.environ.get("MI_TPU_TESTS"):
    import jax
    jax.config.update("jax_platforms", "cpu")

# expose the package's reference-parity test fixtures (mi.test.util)
from mitsuba3dopplertof_tpu.test.util import tmpfile  # noqa: F401,E402
