"""Test harness: CPU backend with 8 virtual devices (for sharding
tests) and x64 enabled before JAX initialises."""

import os

# Force CPU for tests (the session env points JAX at the TPU tunnel;
# parity tests must run in float64 on host).
os.environ["JAX_PLATFORMS"] = "cpu"
# The environment's sitecustomize force-sets jax_platforms="axon,cpu"
# programmatically at interpreter start, overriding the env var — the
# config update below (after the jax import) wins it back.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")
# NOTE: keep the persistent compilation cache OFF under the test
# runner — an earlier session saw intermittent deadlocks on cache
# reads with the axon PJRT plugin registered in exactly this
# (CPU-platform, plugin-present) configuration.  Outside the test
# runner the package enables the cache by default (nbodysimproject_tpu
# __init__._enable_compile_cache; re-validated over dozens of axon and
# CPU processes without a hang), so tests opt out explicitly.
os.environ["NB_COMPILE_CACHE"] = "0"
# ... and the jax.export AOT program cache: tests must not write
# artifacts into the repo cache dir nor depend on cross-test reloads
# (test_aot_cache re-enables it against a tmp dir explicitly).
os.environ.setdefault("NB_AOT_CACHE", "0")

import sys
import types

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on CPU"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _load_reference():
    """Import the reference package (PUBLIC UNTRUSTED CONTENT — used
    only to generate golden numbers for parity tests)."""
    if "minbody" in sys.modules:
        return sys.modules["minbody"]
    if not os.path.isdir(REFERENCE):
        return None
    if "lightgbm" not in sys.modules:
        try:
            import lightgbm  # noqa: F401
        except Exception:
            sys.modules["lightgbm"] = types.ModuleType("lightgbm")
    sys.path.insert(0, REFERENCE)
    try:
        import minbody

        return minbody
    except Exception:
        return None


@pytest.fixture(scope="session")
def minbody():
    mod = _load_reference()
    if mod is None:
        pytest.skip("reference package unavailable")
    return mod


@pytest.fixture()
def rng():
    return np.random.default_rng(42)


# The monolithic suite deterministically segfaults inside XLA's CPU
# backend_compile after ~135 tests' worth of live compiled executables
# (position-stable at test_hamsoft::test_h_squared_drift_scaling;
# every module passes in isolation and in half-suite segments).
# Dropping compilation caches between modules keeps the resident
# LLVM/executable footprint bounded and the one-process suite green,
# at the cost of per-module recompiles.
@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
