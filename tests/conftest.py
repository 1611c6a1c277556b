"""Test environment: simulate an 8-device TPU mesh on CPU (SURVEY.md §4.4).

Must set XLA flags before jax initializes a backend, so this runs at conftest
import time (pytest loads conftest before test modules import jax).
"""

import os

# Force CPU: the environment ships JAX_PLATFORMS=axon (one real TPU chip) and
# a sitecustomize that registers the axon PJRT plugin AND updates jax.config
# at interpreter start — so env vars are already consumed. Override the live
# config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from recommendation_tpu.data.interaction import Interaction  # noqa: E402
from recommendation_tpu.data.synthetic import make_synthetic_dataset  # noqa: E402
from recommendation_tpu.graph.device import DeviceGraph  # noqa: E402


@pytest.fixture(scope="session")
def tiny_data() -> Interaction:
    """Small deterministic dataset: ~60 users, ~100 items."""
    train, test = make_synthetic_dataset(
        n_users=60, n_items=100, n_interactions=2500, seed=3
    )
    return Interaction(train, test)


@pytest.fixture(scope="session")
def tiny_graph(tiny_data) -> DeviceGraph:
    return DeviceGraph(tiny_data, backend="dense")


@pytest.fixture(scope="session")
def tiny_graph_segment(tiny_data) -> DeviceGraph:
    return DeviceGraph(tiny_data, backend="segment")


@pytest.fixture(scope="session")
def tiny_social(tiny_data):
    from recommendation_tpu.data.social import synthesize_social

    return synthesize_social(tiny_data, threshold=0.35, top_k=5)


@pytest.fixture(scope="session")
def tiny_social_graph(tiny_data, tiny_social):
    from recommendation_tpu.graph.social_device import SocialDeviceGraph

    return SocialDeviceGraph(tiny_data, tiny_social, backend="dense")


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(0)
