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
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
