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
# not skip, if it regresses (tests/test_multihost.py guard). But the JAX
# distributed runtime needs loopback TCP, which restricted sandboxes lack --
# promote skip to fail only where a loopback socket can actually bind
# (ADVICE r4: an unconditional default turns an environment limitation into
# a suite failure for other developers). Set SSW_REQUIRE_MULTIHOST=""/"1"
# explicitly to force either mode.


def _loopback_tcp_available() -> bool:
    import socket

    try:
        with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
            s.bind(("127.0.0.1", 0))
        return True
    except OSError:
        return False


if "SSW_REQUIRE_MULTIHOST" not in os.environ and _loopback_tcp_available():
    os.environ["SSW_REQUIRE_MULTIHOST"] = "1"

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
