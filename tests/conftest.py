"""Test harness config: force CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md section 4 implication:
multi-host tests via JAX CPU backends).

NB something in this environment pins jax_platforms to the axon TPU plugin
regardless of JAX_PLATFORMS, so we also force it through jax.config."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
