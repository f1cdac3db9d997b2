"""In-context GRAD-step budget: ablate one component at a time in the
REAL train-policy grad program and interleave all variants in one
process (scripts.ab ABBA compare).

Each variant monkeypatches ONE component to a differentiable
passthrough before tracing; gradients become wrong, dataflow/layouts
stay. The full-vs-ablated slope difference is that component's EXPOSED
forward+backward cost — the honest number for deciding what to optimize
in the backward (VERDICT r3 item 2: x4 <= ~20, x3 <= ~60, x2 <= ~100
ms/step).

Usage: python scripts/ab_budget_grad.py [SCALE]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import m2trans_tpu.models.m2trans as mm  # noqa: E402
import m2trans_tpu.ops.pallas.halo_attn as ha  # noqa: E402
from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.losses.pixel import l1_loss  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from scripts.ab import compare  # noqa: E402

B, OUT = 8, 384


def main():
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h = OUT // scale
    cfg = Config(scale=scale, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg, for_training=True)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, h, h, 3))
    y = jax.random.uniform(jax.random.PRNGKey(2), (B, OUT, OUT, 3))

    def loss_fn(p, xx, yy):
        return l1_loss(m2trans_apply(p, xx, cfg, policy=policy), yy)

    grad = jax.grad(loss_fn)

    real_branch = ha.cftm_branch_fused
    real_tail = mm.tail_apply
    real_conv = mm.conv2d

    def branch_skipper(skip_levels):
        def fake(xx, w_qkv, rel_h, rel_w, s, t, *, x_add=None, r=0.5,
                 block=8, halo=1, levels=0, interpret=None,
                 precision=None):
            if levels in skip_levels:
                # differentiable shape-true passthrough (wrong values)
                return xx + (w_qkv.astype(jnp.float32).mean()
                             * 1e-6).astype(xx.dtype)
            return real_branch(xx, w_qkv, rel_h, rel_w, s, t,
                               x_add=x_add, r=r, block=block, halo=halo,
                               levels=levels, interpret=interpret,
                               precision=precision)
        return fake

    def cheap_tail(p, yy, *, scale, policy, rgb_range=1.0):
        b_, hh, ww, _ = yy.shape
        m = jnp.mean(yy.astype(jnp.float32), axis=-1, keepdims=True)
        up = jnp.broadcast_to(m[:, :, None, :, None, :],
                              (b_, hh, scale, ww, scale, 1))
        return up.reshape(b_, hh * scale, ww * scale, 1) \
            .repeat(3, -1).astype(yy.dtype)

    def cheap_square_conv(xx, w, b=None, **k):
        if w.shape[2] == w.shape[3]:  # ff convs only (square channels)
            return xx + (w.astype(jnp.float32).mean()
                         * 1e-6).astype(xx.dtype)
        return real_conv(xx, w, b, **k)

    variants = {}

    def build(name, patches):
        for mod, attr, val in patches:
            setattr(mod, attr, val)
        try:
            variants[name] = jax.jit(
                lambda xx: grad(params, xx, y)["head"]["b"]) \
                .lower(x).compile()
            print(f"  {name}: compiled", flush=True)
        finally:
            for mod, attr, _ in patches:
                setattr(mod, attr,
                        {"cftm_branch_fused": real_branch,
                         "tail_apply": real_tail,
                         "conv2d": real_conv}[attr])

    build("full", [])
    build("no_b_l0", [(ha, "cftm_branch_fused", branch_skipper({0}))])
    build("no_b_l1", [(ha, "cftm_branch_fused", branch_skipper({1}))])
    build("no_b_l2", [(ha, "cftm_branch_fused", branch_skipper({2}))])
    build("no_tail", [(mm, "tail_apply", cheap_tail)])
    build("no_ff", [(mm, "conv2d", cheap_square_conv)])

    def feed(prev, args):
        if prev is None:
            return args
        return (args[0] + prev[0] * 1e-9,)

    compare(variants, (x,), feed=feed, n1=4, n2=16, trials=5)


if __name__ == "__main__":
    main()
