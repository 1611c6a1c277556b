"""Model protocol.

A model is a bundle of pure functions over (params, state):

  * ``params`` — the optimizer-trained pytree;
  * ``state``  — explicitly carried non-gradient state. This replaces the
    reference's in-place side effects (SelfCF's momentum history
    `selfcf.py:502-510`, BUIR's EMA target rows `univariate/buir.py:251-257`,
    NCL's k-means centroids `ncl.py:340-345`) with functional state, which
    removes that race-hazard class entirely (SURVEY.md §5).

All methods must be jit-traceable except ``epoch_begin`` (which may launch
its own jitted subroutines, e.g. NCL's E-step or SEPT's per-epoch augmented
adjacency).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.sampling import PairwiseBatch


class ForwardOutput(NamedTuple):
    user_emb: jnp.ndarray
    item_emb: jnp.ndarray
    aux: Any = None


class Model:
    """Base model: subclasses override init/loss/eval_embeddings and
    optionally epoch_begin/post_step."""

    name: str = "model"

    def __init__(self, config):
        self.config = config
        self.emb_size = int(config.get("embedding.size", 64))
        self.reg = float(config.get("reg.lambda", 1e-4))

    # -- parameters -----------------------------------------------------------

    def init(self, rng: jax.Array, graph: DeviceGraph) -> tuple[Any, Any]:
        raise NotImplementedError

    def _init_table(
        self, rng: jax.Array, n: int, d: int, scale: float = 0.1, method: str = "xavier"
    ) -> jnp.ndarray:
        """xavier_uniform (the reference encoders' initializer,
        `directau.py:282-287`, `selfcf.py:468-473`) or scaled normal."""
        if method == "xavier":
            limit = jnp.sqrt(6.0 / (n + d))
            return jax.random.uniform(rng, (n, d), jnp.float32, -limit, limit)
        return scale * jax.random.normal(rng, (n, d), dtype=jnp.float32)

    def _init_linear(self, rng: jax.Array, d_in: int, d_out: int) -> dict:
        """Torch nn.Linear default init: U(-1/√d_in, 1/√d_in) for W and b."""
        kw, kb = jax.random.split(rng)
        bound = 1.0 / jnp.sqrt(d_in)
        return {
            "w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound),
        }

    # -- training -------------------------------------------------------------

    def make_optimizer(self, config):
        """Optional model-specific optimizer (e.g. ESRF's split G/D learning
        rates, G-BT's cosine schedule). None -> trainer default."""
        return None

    def loss(
        self,
        params: Any,
        state: Any,
        batch: PairwiseBatch,
        graph: DeviceGraph,
        rng: jax.Array,
    ) -> tuple[jnp.ndarray, Any]:
        """Returns (scalar loss, new_state)."""
        raise NotImplementedError

    def post_step(self, params: Any, state: Any, batch: PairwiseBatch) -> Any:
        """Non-gradient update after the optimizer step (EMA targets etc.)."""
        return state

    def epoch_begin(
        self, params: Any, state: Any, graph: DeviceGraph, rng: jax.Array, epoch: int
    ) -> Any:
        """Per-epoch state refresh (clustering E-steps, augmented views)."""
        return state

    # -- evaluation -----------------------------------------------------------

    def eval_embeddings(
        self, params: Any, state: Any, graph: DeviceGraph
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(user_emb, item_emb) used for ranking predict()."""
        raise NotImplementedError
