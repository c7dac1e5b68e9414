"""Test configuration.

Tests default to the JAX CPU backend with 8 virtual devices so that all
sharding/mesh tests run hermetically on any machine (SURVEY.md §4.4).
Set MP3TPU_TEST_PLATFORM=tpu to run the kernel tests on real TPU hardware.

NOTE: on this environment `JAX_PLATFORMS=cpu` is ignored (experimental
"axon" platform intercepts it); `JAX_PLATFORM_NAME=cpu` works.
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (os.path.join(_REPO, "src"), os.path.join(_REPO, "tools")):
    if p not in sys.path:
        sys.path.insert(0, p)

_platform = os.environ.get("MP3TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    # This environment's sitecustomize imports jax at interpreter start
    # with JAX_PLATFORMS=axon (the TPU tunnel), binding the platform
    # before any env override can land — so force it via jax.config,
    # which wins over the captured env (otherwise the whole suite runs
    # on the shared TPU, ~50x slower).
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running soak/session tests")
