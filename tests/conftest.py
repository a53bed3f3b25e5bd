"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; per SURVEY §4.3 we exercise
mesh/collective code paths with XLA's forced host platform device count.
Must run before jax initializes its backends, hence env vars set here.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override any pre-set TPU platform
os.environ["JAX_ENABLE_X64"] = "1"  # f64 available for parity tests (CPU only)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The image's sitecustomize imports jax and registers a TPU plugin before
# pytest starts, so env vars alone are too late — override via jax.config.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Optional: the reference implementation, used for exact parity tests when the
# tree is mounted (tests skip gracefully when it is absent).
REFERENCE_SRC = "/root/reference/src"
if os.path.isdir(REFERENCE_SRC) and REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)


def has_reference() -> bool:
    try:
        import ofdm_based_systems  # noqa: F401

        return True
    except Exception:
        return False
