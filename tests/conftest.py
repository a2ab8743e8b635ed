"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware by forcing the
host platform to expose 8 XLA CPU devices (must be set before jax imports).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the profile's axon default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin can re-force JAX_PLATFORMS at import time; the config
# update below wins as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the expensive programs here (8-device
# shard_map pipelines, transformer forwards) dominate the suite's wall
# clock on this 1-core box; warm reruns drop from ~7 to ~3 minutes
_cache_dir = os.path.expanduser("~/.cache/cellseg_tpu_xla_tests")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DATA = "/root/reference/data/Train_Labeled"


@pytest.fixture(scope="session")
def bundled_samples():
    """The three bundled (image, instance-label) pairs from the reference."""
    from cellseg_tpu.io import imread

    if not os.path.isdir(REFERENCE_DATA):
        pytest.skip("bundled reference data not available")
    names = ["cell_00225.png", "cell_00528.tif", "cell_00849.png"]
    out = []
    for n in names:
        img = imread(os.path.join(REFERENCE_DATA, "images", n))
        lbl = imread(
            os.path.join(REFERENCE_DATA, "labels", n.split(".")[0] + "_label.tiff")
        )
        out.append((n, np.asarray(img), np.asarray(lbl)))
    return out


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2022)
