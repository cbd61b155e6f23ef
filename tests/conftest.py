"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
and collectives are exercised without TPU hardware."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the TPU backend; jax.config wins
# over the env var, so pin the platform explicitly before any computation.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import functools

import pytest


@functools.lru_cache(maxsize=16)
def _load_cached(path):
    from blingfire_tpu.models.loader import load_model

    return load_model(path)


@pytest.fixture(scope="session")
def gpt2_model():
    return _load_cached("/root/reference/ldbsrc/ldb/gpt2.bin")


@pytest.fixture(scope="session")
def roberta_model():
    return _load_cached("/root/reference/ldbsrc/ldb/roberta.bin")


@pytest.fixture(scope="session")
def xlnet_model():
    return _load_cached("/root/reference/ldbsrc/ldb/xlnet.bin")


@pytest.fixture(scope="session")
def laser100k_model():
    return _load_cached("/root/reference/ldbsrc/ldb/laser100k.bin")
