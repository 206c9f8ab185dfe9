"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding correctness is tested
against XLA's host-platform device virtualization, exactly as the driver's
dryrun does.

Note: on this image an experimental 'axon' TPU platform plugin overrides the
JAX_PLATFORMS environment variable, so we must also force the platform via
jax.config before any backend is initialized.
"""

import os

# Persistent-cache writes have segfaulted XLA:CPU late in the suite (large
# fused executable + many prior compiles); tests run with the cache off.
os.environ["DMVIO_XLA_CACHE"] = "off"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
