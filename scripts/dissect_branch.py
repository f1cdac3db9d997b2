"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Ablate the fused branch kernel's stages in ONE compiled program and
read each variant's device time from a single xplane trace (robust to
tunnel jitter: device self-times, one compile).

Variants are separate pallas_calls over the same input; outputs are summed
so nothing is DCE'd. Run: python scripts/dissect_branch.py
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from scripts.tpu_profile import trace_and_report  # noqa: E402

BLOCK, HALO, WIN = 8, 1, 10
B, H, W, C = 8, 96, 96, 16
WC, NW, NH = W, W // BLOCK, H // BLOCK


def make_call(mode, gb):
    wp_full = W + 2
    blk = BLOCK

    def kernel(xa, xb, wq, wk, wv, relh, relw, out):
        z = jnp.concatenate([xa[:], xb[:, :2]], axis=1)  # (gb, 10, 98, 16)
        g = z.shape[0]
        zf = z.reshape(g * WIN * (W + 2), C)
        if mode == "io":  # just touch input -> output
            out[:] = z[:, 1:9, 1:97, :].astype(out.dtype)
            return
        k_full = jnp.dot(zf, wk[:], preferred_element_type=jnp.float32)
        k_full = k_full.reshape(g, WIN, W + 2, C)
        v_full = jnp.dot(zf, wv[:], preferred_element_type=jnp.float32)
        v_full = v_full.reshape(g, WIN, W + 2, C)
        zq = z[:, 1:1 + blk, 1:1 + W, :].reshape(g * blk * W, C)
        q_full = jnp.dot(zq, wq[:], preferred_element_type=jnp.float32)
        q_full = q_full.reshape(g, blk, W, C) * (C ** -0.5)
        if mode == "qkv":
            out[:] = (q_full + k_full[:, :8, :96] + v_full[:, :8, :96]
                      ).astype(out.dtype)
            return
        relhv = relh[:].astype(jnp.float32)
        relwv = relw[:].astype(jnp.float32)
        k_full = jnp.concatenate(
            [k_full[..., :C // 2] + relhv[None, :, None, :],
             k_full[..., C // 2:]], axis=-1)

        def patches(a):
            a = jnp.pad(a, ((0, 0), (0, 0), (0, (NW + 1) * blk - (W + 2)),
                            (0, 0)))
            al = a[:, :, :NW * blk].reshape(g, WIN, NW, blk, C)
            sh = a[:, :, blk:(NW + 1) * blk].reshape(g, WIN, NW, blk, C)
            return jnp.concatenate([al, sh[:, :, :, :2]], axis=3)

        kb = patches(k_full)  # (g, WIN, NW, WIN, C)
        vb = patches(v_full)
        kb = kb.transpose(0, 2, 1, 3, 4)
        vb = vb.transpose(0, 2, 1, 3, 4)
        if mode == "transonly":
            out[:] = (q_full * (1.0 + kb.mean() + vb.mean())
                      ).astype(out.dtype)
            return
        kb = jnp.concatenate(
            [kb[..., :C // 2], kb[..., C // 2:] + relwv[None, None, None]],
            axis=-1).reshape(g * NW, WIN * WIN, C)
        vb = vb.reshape(g * NW, WIN * WIN, C)
        qb = q_full.reshape(g, blk, NW, blk, C).transpose(0, 2, 1, 3, 4)
        qb = qb.reshape(g * NW, blk * blk, C)
        sim = jax.lax.dot_general(qb, kb, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        if mode == "qk_only":
            o = sim[:, :, :C].reshape(g, NW, blk, blk, C)
            out[:] = o.transpose(0, 2, 1, 3, 4).reshape(
                g, blk, W, C).astype(out.dtype)
            return
        sim = sim - jnp.max(sim, axis=-1, keepdims=True)
        e = jnp.exp(sim)
        attn = e / jnp.sum(e, axis=-1, keepdims=True)
        if mode == "nosoftmax":
            attn = sim
        o = jax.lax.dot_general(attn, vb, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o.reshape(g, NW, blk, blk, C).transpose(0, 2, 1, 3, 4)
        out[:] = o.reshape(g, blk, W, C).astype(out.dtype)

    band = lambda off: pl.BlockSpec(  # noqa: E731
        (gb, BLOCK, wp_full, C), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)

    def call(xp, wq, wk, wv, rel):
        return pl.pallas_call(
            kernel,
            grid=(B // gb, NH),
            in_specs=[band(0), band(1), const((C, C)), const((C, C)),
                      const((C, C)), const((WIN, C // 2)),
                      const((WIN, C // 2))],
            out_specs=pl.BlockSpec((gb, BLOCK, W, C),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
        )(xp, xp, wq, wk, wv, rel, rel)

    return call


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    key = jax.random.PRNGKey(0)
    wq = jax.random.normal(key, (C, C), jnp.bfloat16) * 0.25
    rel = jax.random.normal(key, (WIN, C // 2), jnp.float32)

    modes = [("io", 4), ("qkv", 4), ("transonly", 4), ("qk_only", 4),
             ("nosoftmax", 4), ("full", 4), ("full", 1), ("full", 2)]
    calls = [make_call(m, g) for m, g in modes]

    @jax.jit
    def step(x):
        xp = jnp.pad(x, ((0, 0), (1, 7), (1, 1), (0, 0)))
        acc = 0.0
        for c in calls:
            acc = acc + c(xp, wq, wq, wq, rel).astype(jnp.float32).mean()
        return x * 0.999 + acc.astype(x.dtype) * 1e-6

    x0 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    print("modes in order:", modes)
    trace_and_report(step, x0, steps=6)


if __name__ == "__main__":
    main()
