"""Test configuration: force an 8-virtual-device CPU platform.

Multi-device sharding tests run against a virtual CPU mesh (the TPU-native
substitute for a fake distributed backend — SURVEY §4).

NOTE: in this image jax is pre-imported at interpreter startup with the
platform pinned to the real TPU, so env-var tricks are too late; we override
through jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
