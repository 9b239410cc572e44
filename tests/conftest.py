"""Test configuration: run all tests on a virtual 8-device CPU mesh.

IMPORTANT environment note: this machine's sitecustomize registers the
axon TPU plugin at interpreter boot and *forces*
``jax.config.jax_platforms = "axon,cpu"`` -- overriding the JAX_PLATFORMS
env var.  Setting the env var (even in the shell) is NOT enough; the config
must be updated back after import, before any backend initializes.  Without
this, "CPU" tests silently remote-compile on the single tunneled TPU chip
and concurrent test processes deadlock each other.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# The persistent compilation cache is configured by sadvio_tpu/__init__.py
# with a CPU-fingerprinted directory: entries compiled by a previous round's
# DIFFERENT container host abort on deserialization (Fatal Python error in
# compilation_cache.get_executable_and_time; the cpu_aot_loader
# machine-feature-mismatch warnings are the tell). A mismatched host starts
# a fresh cache instead of loading poison.

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    A full-suite run accumulates ~100 jitted programs; on this machine the
    XLA CPU compiler aborts (SIGABRT/SIGSEGV inside backend_compile_and_load)
    when the 8-device GSPMD BA compile runs on top of all of them.  Bounding
    live executables per module keeps the session stable; per-module tests
    still share compilations where it matters.
    """
    yield
    jax.clear_caches()


@pytest.fixture()
def rng():
    # function-scoped: each test gets the same deterministic stream no matter
    # which subset of tests runs (a session-scoped rng made failures appear
    # and vanish with test selection)
    return np.random.default_rng(0)
