"""Test harness config: CPU backend with 8 virtual devices.

Tests run on CPU (fast, deterministic, no TPU tunnel) with
``--xla_force_host_platform_device_count=8`` so the multi-chip sharding paths
(DP/TP meshes, sharded DCT all-to-all, distributed top-k) are exercised
without a pod -- the reference has nothing distributed to test (SURVEY.md
section 4), this is the harness it lacked.

NOTE: the axon sitecustomize forces JAX_PLATFORMS=axon; the env var cannot
override it, only ``jax.config.update`` can, and it must happen before any
backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# The distributed runtime works in this harness: multihost tests must FAIL,
# not skip, if it regresses (tests/test_multihost.py guard). Set the variable
# to "" to restore skipping in environments without loopback TCP.
os.environ.setdefault("SSW_REQUIRE_MULTIHOST", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
CAT_JPG = os.path.join(REFERENCE_DIR, "tests/porcelain_cat_grey_background.jpg")
GOLDEN_PNG = os.path.join(REFERENCE_DIR, "tests/watermarked_with_1.png")


@pytest.fixture(scope="session")
def cat_image():
    from spread_spectrum_watermarking_tpu.utils import image_io

    return image_io.load_rgb_u8(CAT_JPG)


@pytest.fixture(scope="session")
def golden_image():
    from spread_spectrum_watermarking_tpu.utils import image_io

    return image_io.load_rgb_u8(GOLDEN_PNG)
