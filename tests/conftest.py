"""Test configuration: run on a virtual 8-device CPU mesh.

Tests never require TPU hardware; multi-device sharding is exercised via
XLA's host-platform device-count flag (the TPU analog of a fake distributed
backend).

Note: the JAX_PLATFORMS environment variable is ignored by the TPU plugin
in this image; the config API works, so we use it (and set it before any
test imports jax-heavy modules).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
