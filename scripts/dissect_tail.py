"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Ablate the fused band tail's stages in ONE compiled program (device
self-times from a single trace). Variants: io / stage1 / stages (no
conv) / nogelu (linear stages + conv) / full.

Run: python scripts/dissect_tail.py
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

from m2trans_tpu.ops.pallas.tail_band import _gelu  # noqa: E402
from scripts.tpu_profile import trace_and_report  # noqa: E402

B, H, W, NF = 8, 96, 96, 64
CP = 1024


def make_call(mode):
    def kernel(y_a, y_b, w0, b0, w1, b1, k, out):
        band = jnp.concatenate([y_a[0], y_b[0, :2]], axis=0)
        rows = band.shape[0]
        if mode == "io":
            out[0] = jnp.pad(band[:8, :, :48], ((0, 0), (0, 0), (0, 0)))
            return
        flat = band.reshape(rows * W, NF)
        h = jnp.dot(flat, w0[:], preferred_element_type=jnp.float32)
        act = (lambda v: v) if mode == "nogelu" else _gelu
        h = act(h + b0[:].astype(jnp.float32))
        if mode == "stage1":
            out[0] = h.reshape(rows, W, 256)[:8, :, :48].astype(out.dtype)
            return
        parts = []
        for grp in range(4):
            hg = h[:, grp * NF:(grp + 1) * NF].astype(band.dtype)
            og = jnp.dot(hg, w1[:], preferred_element_type=jnp.float32)
            parts.append(act(og + b1[:].astype(jnp.float32)))
        ph = jnp.concatenate(parts, axis=-1).reshape(rows, W, CP)
        if mode == "stages":
            out[0] = ph[:8, :, :48].astype(out.dtype)
            return
        ph = jnp.pad(ph, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((8 * W, 48), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                win = ph[dr:dr + 8, dc:dc + W].reshape(8 * W, CP)
                acc = acc + jnp.dot(win.astype(band.dtype), k[dr, dc],
                                    preferred_element_type=jnp.float32)
        out[0] = acc.reshape(8, W, 48).astype(out.dtype)

    band = lambda off: pl.BlockSpec(  # noqa: E731
        (1, 8, W, NF), lambda b, i, o=off: (b, i + o, 0, 0),
        memory_space=pltpu.VMEM)
    const = lambda shp: pl.BlockSpec(  # noqa: E731
        shp, lambda b, i: tuple(0 for _ in shp), memory_space=pltpu.VMEM)

    def call(yp, w0, b0, w1, b1, k):
        return pl.pallas_call(
            kernel,
            grid=(B, H // 8),
            in_specs=[band(0), band(1), const((NF, 256)), const((256,)),
                      const((NF, 256)), const((256,)),
                      const((3, 3, CP, 48))],
            out_specs=pl.BlockSpec((1, 8, W, 48), lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, 48), jnp.bfloat16),
        )(yp, yp, w0, b0, w1, b1, k)

    return call


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, (NF, 256), jnp.bfloat16) * 0.1
    b0 = jax.random.normal(key, (256,), jnp.bfloat16) * 0.1
    k = jax.random.normal(key, (3, 3, CP, 48), jnp.bfloat16) * 0.02

    modes = ["io", "stage1", "stages", "nogelu", "full"]
    calls = [make_call(m) for m in modes]

    @jax.jit
    def step(x):
        yp = jnp.pad(x, ((0, 0), (1, 15), (0, 0), (0, 0)))
        acc = 0.0
        for c in calls:
            acc = acc + c(yp, w0, b0, w0, b0, k).astype(jnp.float32).mean()
        return x * 0.999 + acc.astype(x.dtype) * 1e-6

    x0 = jax.random.normal(key, (B, H, W, NF), jnp.bfloat16)
    print("modes in order:", modes)
    trace_and_report(step, x0, steps=6)


if __name__ == "__main__":
    main()
