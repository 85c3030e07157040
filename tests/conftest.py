"""Test configuration: force an 8-device CPU mesh so sharding/collective
tests run without TPU hardware (SURVEY.md §4).

NOTE: on this image a sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon in a way that overrides the env var, so we must ALSO
update the jax config after import — env alone is ignored."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.default_backend() == "cpu", "tests must run on CPU"
assert len(jax.devices()) >= 8, "tests need 8 forced host devices"
