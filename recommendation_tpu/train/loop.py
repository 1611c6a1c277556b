"""Jit-compiled training machinery (layer L6 core).

The reference runs a Python batch loop with per-batch host↔device chatter
(`selfcf.py:547-563`, SURVEY.md §3.2). Here a whole epoch is ONE device
program: shuffle → negative sampling → ``lax.scan`` over fixed-shape batches
of (grad → optax update → post-step state update). The step compiles once and
is reused for every epoch and every tuner config with the same shapes.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.models.base import Model
from recommendation_tpu.sampling import (
    PairwiseBatch,
    epoch_batches,
)


def make_optimizer(config) -> optax.GradientTransformation:
    """optax mirror of the reference's configurable torch optimizers
    (`lightgcn.py:80` ``getattr(torch.optim, ...)``, `selfcf.py:541-546`
    adam/sgd switch). ``learning.rate`` may be a float or an optax
    schedule (injectable by :class:`BoldDriver`)."""
    lr = config.get("learning.rate", 1e-3)
    if not callable(lr):
        lr = float(lr)
    name = str(config.get("optimizer", "adam")).lower()
    if name == "adam":
        return optax.adam(lr)
    if name == "adamw":
        return optax.adamw(lr, weight_decay=float(config.get("weight.decay", 0.01)))
    if name == "sgd":
        return optax.sgd(lr, momentum=float(config.get("momentum", 0.9)))
    raise ValueError(f"unknown optimizer {name!r}")


class BoldDriver:
    """The legacy stack's adaptive learning rate
    (`univariate/diffnet.py:756-763`): ×1.05 when |loss| improved over the
    previous epoch, ×0.5 otherwise, capped at ``max_lrate``. Host-side —
    drives an ``optax.inject_hyperparams`` learning_rate between epochs."""

    def __init__(self, lrate: float, max_lrate: float = 0.0):
        self.lrate = lrate
        self.max_lrate = max_lrate
        self.last_loss: float | None = None

    def update(self, epoch: int, loss: float) -> float:
        if epoch > 1 and self.last_loss is not None:
            if abs(self.last_loss) > abs(loss):
                self.lrate *= 1.05
            else:
                self.lrate *= 0.5
        if self.max_lrate > 0 and self.lrate > self.max_lrate:
            self.lrate = self.max_lrate
        self.last_loss = loss
        return self.lrate


def make_bold_driver_optimizer(config):
    """Adam/SGD wrapped in inject_hyperparams so the per-epoch BoldDriver
    rate lands in opt_state.hyperparams['learning_rate']."""
    name = str(config.get("optimizer", "adam")).lower()
    lr = float(config.get("learning.rate", 1e-3))
    if name == "sgd":
        opt = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=float(config.get("momentum", 0.9))
        )
    else:
        opt = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    return opt, BoldDriver(lr, float(config.get("max.learning.rate", 0.0)))


def make_epoch_fn(
    model: Model,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    n_negs_redraws: int = 4,
    steps_per_call: int | None = None,
) -> Callable:
    """Build a jitted function running one full epoch on device.

    Signature: epoch_fn(graph, params, opt_state, state, rng)
            -> (params, opt_state, state, mean_loss)

    ``steps_per_call`` bounds the scan length of a single device execution,
    splitting the epoch into several device calls (at most two compiled
    shapes: the full chunk and the remainder). Use for very large graphs
    where one multi-minute execution would trip runtime watchdogs; the
    extra dispatch round trips are negligible against chunk compute.
    """

    def loss_wrapper(params, state, batch, graph, rng):
        loss, new_state = model.loss(params, state, batch, graph, rng)
        return loss, new_state

    grad_fn = jax.value_and_grad(loss_wrapper, has_aux=True)

    def epoch_fn(graph: DeviceGraph, params, opt_state, state, rng):
        shuffle_key, neg_key, step_key = jax.random.split(rng, 3)
        # whole-epoch shuffle + negatives through the ONE shared entry point
        # (edge-order fused sampler where the graph supports it — see
        # sampling.epoch_batches; per-step sampling measured ~32 us/step in
        # round 4, the per-position epoch sampler's membership gather
        # ~12 us/step in round 5)
        users, items, negs, weights, n_batches = epoch_batches(
            shuffle_key, neg_key, graph, batch_size, n_negs_redraws
        )
        step_keys = jax.random.split(step_key, n_batches)

        def step(carry, xs):
            params, opt_state, state = carry
            u, i, j, w, k = xs
            batch = PairwiseBatch(u, i, j, w)
            (loss, new_state), grads = grad_fn(params, state, batch, graph, k)
            # per-step NaN guard: a non-finite loss skips the update instead
            # of poisoning the tables (stronger than the reference's
            # epoch-level abort, `univariate/diffnet.py:782-786`)
            ok = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_state, state
            )
            new_state = model.post_step(params, new_state, batch)
            return (params, opt_state, new_state), loss

        (params, opt_state, state), losses = jax.lax.scan(
            step, (params, opt_state, state), (users, items, negs, weights, step_keys)
        )
        finite = jnp.isfinite(losses)
        mean_loss = jnp.sum(jnp.where(finite, losses, 0.0)) / jnp.maximum(
            jnp.sum(finite), 1
        )
        # all-NaN epoch -> surface NaN so the trainer's abort guard fires
        mean_loss = jnp.where(jnp.any(finite), mean_loss, jnp.nan)
        return params, opt_state, state, mean_loss

    if steps_per_call is None:
        return jax.jit(epoch_fn)

    # -- chunked variant ------------------------------------------------------

    def sample_all(graph, rng):
        shuffle_key, neg_key, step_key = jax.random.split(rng, 3)
        users, items, negs, weights, n_batches = epoch_batches(
            shuffle_key, neg_key, graph, batch_size, n_negs_redraws
        )
        step_keys = jax.random.split(step_key, n_batches)
        return users, items, negs, weights, step_keys

    sample_all_jit = jax.jit(sample_all)

    def slice_fn(graph, params, opt_state, state, xs):
        def step(carry, x):
            params, opt_state, state = carry
            u, i, j, w, k = x
            batch = PairwiseBatch(u, i, j, w)
            (loss, new_state), grads = grad_fn(params, state, batch, graph, k)
            ok = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_state, state
            )
            new_state = model.post_step(params, new_state, batch)
            return (params, opt_state, new_state), loss

        (params, opt_state, state), losses = jax.lax.scan(
            step, (params, opt_state, state), xs
        )
        return params, opt_state, state, losses

    slice_jit = jax.jit(slice_fn)

    def chunked_epoch(graph, params, opt_state, state, rng):
        users, items, negs, weights, step_keys = sample_all_jit(graph, rng)
        n_batches = users.shape[0]
        all_losses = []
        start = 0
        while start < n_batches:
            size = min(steps_per_call, n_batches - start)
            xs = tuple(
                a[start:start + size] for a in (users, items, negs, weights, step_keys)
            )
            params, opt_state, state, losses = slice_jit(
                graph, params, opt_state, state, xs
            )
            all_losses.append(losses)
            start += size
        losses = jnp.concatenate(all_losses)
        finite = jnp.isfinite(losses)
        mean_loss = jnp.sum(jnp.where(finite, losses, 0.0)) / jnp.maximum(
            jnp.sum(finite), 1
        )
        mean_loss = jnp.where(jnp.any(finite), mean_loss, jnp.nan)
        return params, opt_state, state, mean_loss

    return chunked_epoch


def make_multi_epoch_fn(
    model: Model,
    optimizer: optax.GradientTransformation,
    batch_size: int,
    n_epochs: int,
    n_negs_redraws: int = 4,
) -> Callable:
    """N full epochs in ONE device execution (outer scan over epochs).

    Removes the per-epoch dispatch round trip — on remote-attached devices
    that RTT (~70-80 ms) can rival the epoch's compute. Used by the trainer
    to fuse ``eval.interval`` epochs per device call (the reference pays a
    full Python batch loop per epoch instead, `selfcf.py:547-563`) and by
    the bench's steady-state measurement.

    Returns fn(graph, params, opt_state, state, rng) -> (params, opt_state,
    state, per_epoch_losses[n_epochs]). ``rng`` may be a single PRNG key
    (split internally) or a stacked [n_epochs] array of per-epoch keys —
    passing the exact keys the trainer's unfused loop would have used makes
    the fused path bit-identical to N separate `make_epoch_fn` calls (the
    epoch body is the same code; tests/test_train_extras.py pins this)."""

    def loss_wrapper(params, state, batch, graph, rng):
        loss, new_state = model.loss(params, state, batch, graph, rng)
        return loss, new_state

    grad_fn = jax.value_and_grad(loss_wrapper, has_aux=True)

    # memory gate for hoisting every epoch's batch arrays at once:
    # 4 arrays (users/items/negs i32, weights f32) of [E, nb, B] plus the
    # step keys. 64M elements ≈ 1 GB total — far below HBM but far above
    # any fused-epoch window the trainer or bench actually uses.
    HOIST_ALL_MAX_ELEMENTS = 64 * 1024 * 1024
    # vmapping epoch_arrays also batches the sampler's membership row gather
    # ([E·nb·B, row_words] i32); if XLA materializes it before the word-
    # select reduce that intermediate dwarfs the batch arrays on wide-bitmap
    # graphs (ADVICE r4). Gate the hoist on its size too: 512M words = 2 GB.
    HOIST_ALL_MAX_GATHER_WORDS = 512 * 1024 * 1024

    def run(graph: DeviceGraph, params, opt_state, state, rng):
        def epoch_arrays(epoch_rng):
            """Shuffle + key material + negatives for ONE epoch. Every
            epoch-level path (make_epoch_fn plain + chunked, this one) draws
            through the same ``sample_negatives_epoch``, so fused, unfused
            and chunked trainers stay bit-identical to each other
            (tests/test_train_extras.py)."""
            shuffle_key, neg_key, step_key = jax.random.split(epoch_rng, 3)
            users, items, negs, weights, n_batches = epoch_batches(
                shuffle_key, neg_key, graph, batch_size, n_negs_redraws
            )
            step_keys = jax.random.split(step_key, n_batches)
            return users, items, negs, weights, step_keys

        def step(carry, xs):
            params, opt_state, state = carry
            u, i, j, w, k = xs
            batch = PairwiseBatch(u, i, j, w)
            (loss, new_state), grads = grad_fn(params, state, batch, graph, k)
            ok = jnp.isfinite(loss)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok, new, old), new_state, state
            )
            new_state = model.post_step(params, new_state, batch)
            return (params, opt_state, new_state), loss

        def scan_epoch(carry, xs):
            carry, losses = jax.lax.scan(step, carry, xs)
            # same finite-masked mean as make_epoch_fn so the fused path is
            # bit-identical to N separate epoch calls
            finite = jnp.isfinite(losses)
            mean_loss = jnp.sum(jnp.where(finite, losses, 0.0)) / jnp.maximum(
                jnp.sum(finite), 1
            )
            mean_loss = jnp.where(jnp.any(finite), mean_loss, jnp.nan)
            return carry, mean_loss

        # Stacked per-epoch keys from the trainer vs a single key to split:
        # legacy uint32 keys are shape [2] (single) / [n, 2] (stacked); typed
        # PRNG keys are shape [] / [n]. Dispatch on the key-data ndim so a
        # typed stacked array is never silently re-split as one key (which
        # would break the fused==unfused bit-identity guarantee).
        single_ndim = 0 if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key) else 1
        if rng.ndim == single_ndim + 1:
            if rng.shape[0] != n_epochs:
                raise ValueError(
                    f"stacked epoch keys have length {rng.shape[0]}, "
                    f"expected n_epochs={n_epochs}"
                )
            epoch_rngs = rng
        else:
            epoch_rngs = jax.random.split(rng, n_epochs)

        n_batches = max(1, -(-graph.n_edges // batch_size))
        if getattr(graph, "has_edge_bitmap_fb", False):
            # edge-order sampler: no batched membership gather — the widest
            # vmapped intermediate is the [k+1, E] bits block
            row_words = 8
        elif getattr(graph, "has_pos_bitmap", False):
            row_words = graph.user_bitmap_fb.shape[1]
        elif getattr(graph, "has_pos_table", True) and hasattr(graph, "user_positives"):
            row_words = graph.user_positives.shape[1]
        else:
            row_words = 1
        n_examples = n_epochs * n_batches * batch_size
        if (
            n_examples <= HOIST_ALL_MAX_ELEMENTS
            and n_examples * row_words <= HOIST_ALL_MAX_GATHER_WORDS
        ):
            # hoist EVERY epoch's shuffle + negatives out of the epoch scan:
            # the E permutation sorts collapse into one batched sort and the
            # E×nb threefry blocks into a handful of big vectorized calls —
            # this was ~66 us/step of epoch machinery (~40% of the bench
            # step) when run serially inside the scan (round-4 ablation)
            all_xs = jax.vmap(epoch_arrays)(epoch_rngs)
            (params, opt_state, state), epoch_losses = jax.lax.scan(
                scan_epoch, (params, opt_state, state), all_xs
            )
        else:

            def one_epoch(carry, epoch_rng):
                return scan_epoch(carry, epoch_arrays(epoch_rng))

            (params, opt_state, state), epoch_losses = jax.lax.scan(
                one_epoch, (params, opt_state, state), epoch_rngs
            )
        return params, opt_state, state, epoch_losses

    return jax.jit(run)


def tree_copy(tree: Any) -> Any:
    """Snapshot a pytree (JAX arrays are immutable; identity refs suffice)."""
    return jax.tree_util.tree_map(lambda x: x, tree)
