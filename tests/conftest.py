"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware: multi-chip sharding is exercised on the
standard JAX stand-in (XLA_FLAGS=--xla_force_host_platform_device_count=8 on
the CPU backend — SURVEY.md §4). Must run before the first jax import.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# Tests must not read/write the cross-process schedule store (order
# independence); the persistence test overrides this with a tmp path.
os.environ.setdefault("CNR_SCHEDULE_MEMO", "")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize may already have imported jax (registering a
# TPU plugin) before this conftest runs, in which case the env vars above are
# too late — override via jax.config as well (backends initialize lazily, so
# this still wins as long as no computation ran yet).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of pytest invocation directory.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"
GEOMETRIES = os.path.join(REFERENCE_DIR, "neuralGeometries")
MATCAPS = os.path.join(REFERENCE_DIR, "matcaps")


def _asset(path: str) -> str:
    if not os.path.exists(path):
        pytest.skip(f"reference asset not available: {path}")
    return path


@pytest.fixture(scope="session")
def plane1_path() -> str:
    return _asset(os.path.join(GEOMETRIES, "plane_1.h5"))


@pytest.fixture(scope="session")
def car1_path() -> str:
    return _asset(os.path.join(GEOMETRIES, "car_1.h5"))


@pytest.fixture(scope="session")
def matcap_path() -> str:
    return _asset(os.path.join(MATCAPS, "Chrome.png"))


@pytest.fixture(scope="session")
def plane1_params(plane1_path):
    from cudaneuralrender_tpu.models import checkpoint

    return checkpoint.load_keras_h5(plane1_path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
