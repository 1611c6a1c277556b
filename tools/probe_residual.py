"""Headline-step residual decomposition (VERDICT-r4 #1).

The round-4 bare-step budget (BASELINE.md) left ~15 us/step of "loss/misc"
unprobed — the second-largest line after the one-hot batch grads. This tool
isolates, at the exact headline shape (ML-100K 943x1682, d=64, B=2048,
bf16 dense bipartite propagation):

  A. step decomposition    step_full / no_reg / no_guard / fwd_loss /
                           fwd_rank / adam_only — where the residual lives
  B. propagation ceiling   chain_dots (the 6 fwd dots alone, then fwd+bwd)
                           vs the production propagate (mean accumulation
                           included) — is prop at the d=64 MXU ceiling?
  C. one-hot spellings     the batch-grad one-hot matmul in f32 (production)
                           vs bf16 variants (where-select generation, padded
                           N=128 lanes) — round 4's bf16 attempt measured
                           WORSE (30.4 vs 28.7 us); these spellings test
                           whether that was a convert-materialization
                           artifact rather than the MXU bf16 ceiling.

Protocol: paired scan lengths ((long - short) / delta), one scalar fence —
dispatch RTT and fence cancel (see tools/ablate_step.py v2 notes).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_residual.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import optax

from recommendation_tpu.config import default_config
from recommendation_tpu.data.interaction import Interaction
from recommendation_tpu.data.synthetic import make_synthetic_dataset
from recommendation_tpu.graph.device import DeviceGraph
from recommendation_tpu.losses import bpr_loss, l2_reg_loss
from recommendation_tpu.models.lightgcn import LightGCN
from recommendation_tpu.ops.rows import take_rows
from recommendation_tpu.sampling import PairwiseBatch
from recommendation_tpu.train.loop import make_optimizer

EMB, LAYERS, BATCH = 64, 3, 2048
N_SHORT, N_LONG = 256, 1024


def timed_pair(make_fn, make_args, label, repeats=3):
    times = {}
    for n in (N_SHORT, N_LONG):
        fn = make_fn(n)
        args = make_args(n)
        float(fn(*args))
        best = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn(*args))
            best.append(time.perf_counter() - t0)
        times[n] = min(best)
    per_step = (times[N_LONG] - times[N_SHORT]) / (N_LONG - N_SHORT) * 1e6
    print(f"{label:<16} {per_step:8.1f} us/step", flush=True)
    return per_step


def _scalarize(out):
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype"):
            acc = acc + jnp.sum(leaf).astype(jnp.float32) * 1e-20
    return acc


def scan_variant(step, init, xs_for):
    def make(n):
        @jax.jit
        def run(init, xs):
            carry, ys = jax.lax.scan(step, init, xs)
            return _scalarize((carry, ys))
        return run
    return make, lambda n: (init, xs_for(n))


def length_variant(step, init):
    def make(n):
        @jax.jit
        def run(init):
            carry, ys = jax.lax.scan(step, init, None, length=n)
            return _scalarize((carry, ys))
        return run
    return make, lambda n: (init,)


def main():
    train, test = make_synthetic_dataset(n_users=943, n_items=1682,
                                         n_interactions=100_000, seed=7)
    data = Interaction(train, test)
    config = default_config(**{
        "embedding.size": EMB, "batch.size": BATCH,
        "LightGCN.n_layers": LAYERS, "learning.rate": 1e-3,
    })
    graph = DeviceGraph(data, backend="auto", compute_dtype="bfloat16")
    model = LightGCN(config)
    params, state = model.init(jax.random.PRNGKey(0), graph)
    optimizer = make_optimizer(config)
    opt_state = optimizer.init(params)

    config0 = default_config(**{
        "embedding.size": EMB, "batch.size": BATCH,
        "LightGCN.n_layers": LAYERS, "learning.rate": 1e-3,
        "reg.lambda": 0.0,
    })
    model0 = LightGCN(config0)

    # precomputed epoch-style xs (outside timing)
    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def build_xs(rng, n):
        ku, ki, kj, kk = jax.random.split(rng, 4)
        us = jax.random.randint(ku, (n, BATCH), 0, graph.n_users)
        its = jax.random.randint(ki, (n, BATCH), 0, graph.n_items)
        js = jax.random.randint(kj, (n, BATCH), 0, graph.n_items)
        ks = jax.random.split(kk, n)
        return us, its, js, ks

    xs_cache = {}

    def xs_for(n):
        if n not in xs_cache:
            xs_cache[n] = jax.block_until_ready(build_xs(jax.random.PRNGKey(1), n))
        return xs_cache[n]

    def full_step_for(m, guard=True):
        grad_fn = jax.value_and_grad(
            lambda p, batch, k: m.loss(p, state, batch, graph, k)[0])

        def step(carry, xs):
            p, o = carry
            u, i, j, k = xs
            batch = PairwiseBatch(u, i, j, jnp.ones(u.shape, jnp.float32))
            loss, grads = grad_fn(p, batch, k)
            if guard:
                ok = jnp.isfinite(loss)
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, o = optimizer.update(grads, o, p)
            p = optax.apply_updates(p, updates)
            return (p, o), loss

        return step

    print("== A. step decomposition (precomputed negatives) ==")
    t_full = timed_pair(*scan_variant(full_step_for(model), (params, opt_state), xs_for),
                        "step_full")
    t_noreg = timed_pair(*scan_variant(full_step_for(model0), (params, opt_state), xs_for),
                         "step_no_reg")
    t_nogrd = timed_pair(*scan_variant(full_step_for(model, guard=False),
                                       (params, opt_state), xs_for), "step_no_guard")

    def fwd_only(m):
        def step(carry, xs):
            u, i, j, k = xs
            batch = PairwiseBatch(u, i, j, jnp.ones(u.shape, jnp.float32))
            loss, _ = m.loss(params, state, batch, graph, k)
            return carry + loss * 1e-20, loss
        return step

    t_fwd = timed_pair(*scan_variant(fwd_only(model), jnp.float32(0.0), xs_for),
                       "fwd_loss")
    t_fwdr = timed_pair(*scan_variant(fwd_only(model0), jnp.float32(0.0), xs_for),
                        "fwd_rank")

    def adam_only(carry, x):
        del x
        p, o = carry
        g = jax.tree_util.tree_map(lambda a: a * 1e-20, p)
        updates, o = optimizer.update(g, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), None

    t_adam = timed_pair(*length_variant(adam_only, (params, opt_state)), "adam_only")

    print("\n== B. propagation ceiling (bf16 dots at 943x1682, d=64) ==")
    r = graph.interaction_norm_dense.astype(jnp.bfloat16)

    def mm(a, b):
        return jnp.dot(a, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    def chain_dots(u0, i0):
        u, i = u0, i0
        for _ in range(LAYERS):
            u, i = mm(r, i), mm(r.T, u)
        return jnp.sum(u) + jnp.sum(i)

    u0, i0 = params["user_emb"], params["item_emb"]

    def dots_fwd(carry, x):
        del x
        u = u0 * (1.0 + carry * 1e-20)
        return carry + chain_dots(u, i0) * 1e-20, None

    t_dots = timed_pair(*length_variant(dots_fwd, jnp.float32(0.0)), "chain_dots_fwd")

    dots_g = jax.grad(chain_dots, argnums=(0, 1))

    def dots_fb(carry, x):
        del x
        u = u0 * (1.0 + carry * 1e-20)
        gu, gi = dots_g(u, i0)
        return carry + (jnp.sum(gu) + jnp.sum(gi)) * 1e-20, None

    t_dotsfb = timed_pair(*length_variant(dots_fb, jnp.float32(0.0)), "chain_dots_fb")

    def prop_fwd(carry, x):
        del x
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), params)
        ua, ia = model.propagate(p, graph)
        return carry + (jnp.sum(ua) + jnp.sum(ia)) * 1e-20, None

    t_pf = timed_pair(*length_variant(prop_fwd, jnp.float32(0.0)), "prop_fwd")

    prop_g = jax.grad(lambda p: sum(jnp.sum(t) for t in
                                    jax.tree_util.tree_leaves(model.propagate(p, graph))))

    def prop_fb(carry, x):
        del x
        p = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), params)
        g = prop_g(p)
        return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-20, None

    t_pfb = timed_pair(*length_variant(prop_fb, jnp.float32(0.0)), "prop_fwd_bwd")

    print("\n== C. one-hot batch-grad spellings ==")
    ua0, ia0 = jax.jit(lambda p: model.propagate(p, graph))(params)
    jax.block_until_ready((ua0, ia0))

    def make_take(bwd):
        @jax.custom_vjp
        def take(table, idx):
            return table[idx]

        def fwd(table, idx):
            return table[idx], (idx, table.shape[0])

        take.defvjp(fwd, bwd)
        return take

    def bwd_f32(res, g):
        idx, n = res
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(g.dtype)
        return jax.lax.dot_general(oh, g, (((0,), (0,)), ((), ()))), None

    def bwd_bf16_astype(res, g):
        idx, n = res
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(jnp.bfloat16)
        return jax.lax.dot_general(oh, g.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32), None

    def bwd_bf16_where(res, g):
        idx, n = res
        eq = idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]
        oh = jnp.where(eq, jnp.bfloat16(1), jnp.bfloat16(0))
        return jax.lax.dot_general(oh, g.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32), None

    def bwd_bf16_pad(res, g):
        idx, n = res
        eq = idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]
        oh = jnp.where(eq, jnp.bfloat16(1), jnp.bfloat16(0))
        gp = jnp.pad(g.astype(jnp.bfloat16), ((0, 0), (0, 128 - g.shape[1])))
        d = jax.lax.dot_general(oh, gp, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return d[:, :g.shape[1]], None

    def bwd_f32_pad(res, g):
        idx, n = res
        oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]).astype(g.dtype)
        gp = jnp.pad(g, ((0, 0), (0, 128 - g.shape[1])))
        d = jax.lax.dot_general(oh, gp, (((0,), (0,)), ((), ())))
        return d[:, :g.shape[1]], None

    for label, bwd in (
        ("oh_f32", bwd_f32),
        ("oh_bf16_astype", bwd_bf16_astype),
        ("oh_bf16_where", bwd_bf16_where),
        ("oh_bf16_pad128", bwd_bf16_pad),
        ("oh_f32_pad128", bwd_f32_pad),
    ):
        take = make_take(bwd)

        def batch_loss(tabs, u, i, j, take=take):
            a, b = tabs
            return bpr_loss(take(a, u), take(b, i), take(b, j))

        bg = jax.grad(batch_loss)

        def batch_grad(carry, x, bg=bg):
            u, i, j, _ = x
            tabs = jax.tree_util.tree_map(lambda a: a * (1.0 + carry * 1e-20), (ua0, ia0))
            g = bg(tabs, u, i, j)
            return carry + sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g)) * 1e-20, None

        timed_pair(*scan_variant(batch_grad, jnp.float32(0.0), xs_for), label)

    print("\nderived:")
    print(f"  reg total (fwd+bwd+update interplay) ~{t_full - t_noreg:6.1f} us")
    print(f"  reg fwd alone                        ~{t_fwd - t_fwdr:6.1f} us")
    print(f"  guard                                ~{t_full - t_nogrd:6.1f} us")
    print(f"  backward+update (full - fwd_loss)    ~{t_full - t_fwd:6.1f} us")
    print(f"  adam_only                            ~{t_adam:6.1f} us")
    print(f"  prop accumulation tax (prop - dots)  fwd ~{t_pf - t_dots:6.1f}, "
          f"fwd+bwd ~{t_pfb - t_dotsfb:6.1f} us")


if __name__ == "__main__":
    main()
