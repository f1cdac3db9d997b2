"""Tail cost attribution, level 2: ab_tail_parts.py showed the band
kernel's ARITHMETIC is fully hidden (shell delta +0.15 ms), so the
~1.5 ms exposed tail cost (ab_budget.py no_tail) lives in the structure
around it. Split it: phase_edges XLA prep | the kernel launch/DMA/grid
itself | pixel_shuffle_fast.

Usage: python scripts/ab_tail_parts2.py [HW]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.ops.pallas.tail_band as tb  # noqa: E402
import m2trans_tpu.ops.tail_phase as tp  # noqa: E402
from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from scripts.ab import fresh, compare  # noqa: E402


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, hw, hw, 3))

    def fwd(xx):
        y = m2trans_apply(params, xx, cfg, policy=policy)
        return xx * 0.999 + y.astype(jnp.float32).mean() * 1e-3

    import m2trans_tpu.models.m2trans as mm

    orig_edges = tp.phase_edges
    orig_ps = tb.pixel_shuffle_fast
    orig_kern = tb.tail_band_fused
    orig_w = tp.tail_phase_weights
    orig_tail = mm.tail_apply

    def cheap_edges(p, xx, *, scale, dtype=jnp.bfloat16, precision=None,
                    pad_rows=0):
        b, h, w, nf = xx.shape
        cp = scale * scale * nf
        rows = pad_rows if pad_rows else h + 2
        m = xx.astype(jnp.float32).mean()
        z = lambda shp: jnp.broadcast_to(m, shp)  # noqa: E731
        return (z((b, rows, 1, cp)), z((b, rows, 1, cp)),
                z((b, 1, w + 2, cp)), z((b, 1, w + 2, cp)))

    def cheap_ps(out, scale):
        # wrong values, right shape/dtype: cheap channel slice + tile
        b, h, w, c = out.shape
        return jnp.broadcast_to(
            out[..., :3].reshape(b, h, 1, w, 1, 3),
            (b, h, scale, w, scale, 3)).reshape(b, h * scale, w * scale, 3)

    def no_kernel(y, w0, b0, w1, b1, k, lc, rc, top, bot, *, scale,
                  rgb_range, interpret, precision=None, tap_packed=True):
        b, h, w, nf = y.shape
        m = (y.astype(jnp.float32).mean() + lc.mean() + rc.mean()
             + top.mean() + bot.mean()).astype(y.dtype)
        return jnp.broadcast_to(m, (b, h, w, scale * scale * 3))

    def cheap_weights(p, *, scale, dtype=jnp.bfloat16, precision=None):
        nf = p["c0"]["w"].shape[-2]
        P = scale * scale
        m = p["c0"]["w"].astype(jnp.float32).mean().astype(dtype)
        z = lambda shp: jnp.broadcast_to(m, shp)  # noqa: E731
        r = 2 if scale == 4 else scale
        return (z((nf, r * r * nf)), z((r * r * nf,)),
                z((nf, r * r * nf)), z((r * r * nf,)),
                z((3, 3, P * nf, P * 3)))

    def cheap_tail(p, y, *, scale, policy, rgb_range=1.0):
        # ab_budget.py's whole-tail ablation, for same-process accounting
        b, h, w, _ = y.shape
        return jnp.broadcast_to(
            y.astype(jnp.float32).mean(axis=-1, keepdims=True),
            (b, h, w, 1)).repeat(scale, 1).repeat(scale, 2) \
            .reshape(b, h * scale, w * scale, 1).repeat(3, -1) \
            .astype(y.dtype)

    variants = {}
    for name, patches in (
            ("full", {}),
            ("cheap_edges", {"edges": cheap_edges}),
            ("cheap_ps", {"ps": cheap_ps}),
            ("no_kernel", {"kern": no_kernel}),
            ("cheap_weights", {"w": cheap_weights}),
            ("no_tail_at_all", {"tail": cheap_tail}),
            ("structure_only", {"edges": cheap_edges, "ps": cheap_ps,
                                "w": cheap_weights})):
        if "edges" in patches:
            tp.phase_edges = patches["edges"]
        if "ps" in patches:
            tb.pixel_shuffle_fast = patches["ps"]
        if "kern" in patches:
            tb.tail_band_fused = patches["kern"]
        if "w" in patches:
            tp.tail_phase_weights = patches["w"]
        if "tail" in patches:
            mm.tail_apply = patches["tail"]
        try:
            variants[name] = jax.jit(fresh(fwd)).lower(x).compile()
            print(f"  {name}: compiled", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: FAILED ({str(e)[:120]})", flush=True)
        finally:
            tp.phase_edges = orig_edges
            tb.pixel_shuffle_fast = orig_ps
            tb.tail_band_fused = orig_kern
            tp.tail_phase_weights = orig_w
            mm.tail_apply = orig_tail

    compare(variants, (x,), n1=8, n2=40, trials=6)


if __name__ == "__main__":
    main()
