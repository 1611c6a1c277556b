"""A/B: XLA dense chain vs the opt-in Pallas propagation kernel, plus the
per-round Mosaic compile/value smoke (VERDICT-r4 #5 and #7).

Round 4 flipped the fused Pallas chain kernel (`ops/pallas_prop.py`) to
opt-in-off on an A/B that lived only in a commit message. This harness
commits the experiment:

  1. headline-bench paired-scan estimator (the exact `bench.py` protocol,
     baseline skipped) run in BOTH orders — kernel off/on/on/off — in one
     process, so session drift cannot masquerade as a mode difference;
  2. Mosaic compile + value smoke of every kernel variant reachable at HEAD
     (bf16 chain, f32 chain, `dense_chain_mean_layer`) against the XLA
     chain, values AND grads — the rot guard VERDICT-r4 #7 asked for
     (interpret-mode tests cover CPU only; this exercises the real
     Mosaic lowering on the chip).

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_prop_kernel.py
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def smoke():
    from recommendation_tpu.ops.pallas_prop import (
        chain_supported,
        dense_chain_mean,
        dense_chain_mean_layer,
    )

    nu, ni, d, layers = 943, 1682, 64, 3
    ku, ki, kr = jax.random.split(jax.random.PRNGKey(0), 3)
    u0 = jax.random.normal(ku, (nu, d), jnp.float32) * 0.1
    i0 = jax.random.normal(ki, (ni, d), jnp.float32) * 0.1
    r_f32 = jax.nn.softmax(jax.random.normal(kr, (nu, ni), jnp.float32), axis=1)

    def xla_chain(r, u, i, mm):
        acc_u, acc_i = u, i
        for _ in range(layers):
            u, i = mm(r, i), mm(r.T, u)
            acc_u, acc_i = acc_u + u, acc_i + i
        inv = 1.0 / (layers + 1.0)
        return acc_u * inv, acc_i * inv

    ok = True
    for tag, r, itemsize in (("bf16", r_f32.astype(jnp.bfloat16), 2), ("f32", r_f32, 4)):
        assert chain_supported(nu, ni, d, r_itemsize=itemsize), f"{tag}: gate rejects headline shape"

        if tag == "bf16":
            def mm(a, b):
                return jnp.dot(a, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        else:
            def mm(a, b):
                return jnp.dot(a, b, preferred_element_type=jnp.float32)

        def loss_k(u, i, r=r):
            au, ai = dense_chain_mean(r, u, i, layers)
            return jnp.sum(au * au) + jnp.sum(ai * ai)

        def loss_x(u, i, r=r, mm=mm):
            au, ai = xla_chain(r, u, i, mm)
            return jnp.sum(au * au) + jnp.sum(ai * ai)

        vk, gk = jax.jit(jax.value_and_grad(loss_k, argnums=(0, 1)))(u0, i0)
        vx, gx = jax.jit(jax.value_and_grad(loss_x, argnums=(0, 1)))(u0, i0)
        dv = abs(float(vk) - float(vx)) / max(abs(float(vx)), 1e-9)
        dg = max(
            float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(b))), 1e-9)
            for a, b in zip(gk, gx)
        )
        line_ok = dv < 2e-2 and dg < 2e-2
        ok &= line_ok
        print(f"smoke dense_chain_mean[{tag}]: value rel {dv:.2e}, grad rel "
              f"{dg:.2e} {'OK' if line_ok else 'FAIL'}", flush=True)

    # layer variant (NCL layer-contrast path): forward + grad vs XLA stack
    rb = r_f32.astype(jnp.bfloat16)

    def mmb(a, b):
        return jnp.dot(a, b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)

    def loss_kl(u, i):
        au, ai, uk, ik = dense_chain_mean_layer(rb, u, i, layers, layers)
        return jnp.sum(au * au) + jnp.sum(ik * ik)

    def loss_xl(u, i):
        uu, ii = u, i
        acc_u, acc_i = u, i
        for _ in range(layers):
            uu, ii = mmb(rb, ii), mmb(rb.T, uu)
            acc_u, acc_i = acc_u + uu, acc_i + ii
        inv = 1.0 / (layers + 1.0)
        return jnp.sum((acc_u * inv) ** 2) + jnp.sum(ii * ii)

    vk, gk = jax.jit(jax.value_and_grad(loss_kl, argnums=(0, 1)))(u0, i0)
    vx, gx = jax.jit(jax.value_and_grad(loss_xl, argnums=(0, 1)))(u0, i0)
    dv = abs(float(vk) - float(vx)) / max(abs(float(vx)), 1e-9)
    dg = max(
        float(jnp.max(jnp.abs(a - b))) / max(float(jnp.max(jnp.abs(b))), 1e-9)
        for a, b in zip(gk, gx)
    )
    line_ok = dv < 2e-2 and dg < 2e-2
    ok &= line_ok
    print(f"smoke dense_chain_mean_layer[bf16]: value rel {dv:.2e}, grad rel "
          f"{dg:.2e} {'OK' if line_ok else 'FAIL'}", flush=True)
    return ok


def main():
    if jax.default_backend() == "cpu":
        print("needs the TPU (Mosaic lowering + real timing); aborting", file=sys.stderr)
        sys.exit(2)

    print(f"== Mosaic compile/value smoke (backend={jax.default_backend()}) ==")
    if not smoke():
        sys.exit(1)

    print("\n== A/B: headline paired-scan estimator, both orders ==")
    data = bench.build_dataset()
    results = []
    for mode in ("off", "on", "on", "off"):
        os.environ["RECTPU_PROP_KERNEL"] = mode
        ex_s = bench.bench_tpu(data, epochs=16, compute_dtype="bfloat16")
        results.append((mode, ex_s))
        print(f"kernel={mode:<3}  {ex_s:,.0f} ex/s", flush=True)
    off = [v for m, v in results if m == "off"]
    on = [v for m, v in results if m == "on"]
    print(f"\nXLA chain (off): {np.mean(off):,.0f} ex/s (runs: "
          f"{', '.join(f'{v:,.0f}' for v in off)})")
    print(f"Pallas chain (on): {np.mean(on):,.0f} ex/s (runs: "
          f"{', '.join(f'{v:,.0f}' for v in on)})")


if __name__ == "__main__":
    main()
