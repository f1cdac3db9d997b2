"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Ablate the packed-body CFTM's glue to size the round-4 levers.

Variants of the flagship x4 forward (B=8, 96^2, bf16+Pallas), each
removing one piece of the per-CFTM XLA glue (outputs become WRONG —
layouts and dataflow stay, so slopes are honest):

  full        — the real m2trans_apply (packed body flow)
  noff        — concat kept; unpack/ff-conv/residual/next-pack removed
                (next CFTM consumes the branch concat directly; stats
                from the packed tensor) -> glue+ff savings ceiling
  nob2restack — branch 2's half restacks removed (runs the L=1 kernel
                on one 64-lane half twice... replaced by passthrough)
  nostats     — IN statistics replaced by constants (stats cost)

Usage: python scripts/dissect_glue.py
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from m2trans_tpu.models.m2trans import _packed_body_ok  # noqa: E402
from m2trans_tpu.ops.conv import conv2d  # noqa: E402
from m2trans_tpu.ops.pad import pad_to_multiple  # noqa: E402
from scripts.ab import compare  # noqa: E402

B, HW = 8, 96


def packed_stats(xp, g=8, nb=4):
    """Per-image IN stats from the branch-major packed tensor."""
    xf = xp.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2))          # (bp, 512)
    v = jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(m)
    bp = xp.shape[0]
    cb = xp.shape[-1] // (g * nb)

    def to_img(a):  # lane p = k*(g*cb) + s*cb + c -> image (b, k*cb+c)
        return a.reshape(bp, nb, g, cb).transpose(0, 2, 1, 3) \
                .reshape(bp * g, nb * cb)
    inv = lax.rsqrt(to_img(v) + 1e-5)
    return inv, -to_img(m) * inv


def make_cftm_variant(which, cfg, policy):
    """A copy of _cftm_apply_fused_packed on an ALREADY-PACKED input,
    with one glue piece ablated. Returns f(blk_params, xp) -> packed out."""
    from m2trans_tpu.ops.pallas.halo_attn import _is_tpu_backend
    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        packed_cascade_core,
        packed_front_core,
        pick_packed_front,
        unpack_body,
        pack_body,
    )

    block, halo = cfg.block_size, cfg.halo_size
    g = 8

    def run(p, xp):
        bp = xp.shape[0]
        bsz = bp * g
        cb = xp.shape[-1] // 32
        if which == "nostats":
            inv = jnp.ones((bsz, 4 * cb), jnp.float32)
            tfull = jnp.zeros((bsz, 4 * cb), jnp.float32)
        else:
            inv, tfull = packed_stats(xp)

        def st_packed(k):
            sk = inv[:, k * cb:(k + 1) * cb].reshape(bp, g * cb)
            tk = tfull[:, k * cb:(k + 1) * cb].reshape(bp, g * cb)
            return sk, tk

        def fold(xk, prev, sk, tk):
            if prev is None:
                return xk, sk, tk
            sk, tk = sk * 0.5, tk * 0.5
            xk = (xk.astype(jnp.float32) + prev.astype(jnp.float32)
                  * (0.5 / sk)[:, None, None, :]).astype(policy.dtype)
            return xk, sk, tk

        def wq(name, levels):
            c = cb * 4 ** levels
            return p[name]["qkv_w"].reshape(c, 3 * c).astype(policy.dtype)

        def block_k(k):
            return xp[..., k * 128:(k + 1) * 128]

        kw = dict(cb=cb, block=block, halo=halo, r=0.0,
                  interpret=not _is_tpu_backend(),
                  precision=policy.precision)

        s1, t1 = st_packed(0)
        o1 = packed_cascade_core(block_k(0), None, s1, t1, wq("attn1", 0),
                                 p["attn1"]["rel_h"], p["attn1"]["rel_w"],
                                 levels=0, g=8, **kw)
        s2, t2 = st_packed(1)
        x2, s2, t2 = fold(block_k(1), o1, s2, t2)
        if which == "nob2restack":
            o2 = x2  # branch 2 + restacks ablated entirely
        else:
            x2h = jnp.concatenate([x2[..., :64], x2[..., 64:]], axis=0)
            s2h = jnp.concatenate([s2[:, :64], s2[:, 64:]], axis=0)
            t2h = jnp.concatenate([t2[:, :64], t2[:, 64:]], axis=0)
            o2h = packed_cascade_core(x2h, None, s2h, t2h, wq("attn2", 1),
                                      p["attn2"]["rel_h"],
                                      p["attn2"]["rel_w"], levels=1, g=4,
                                      **kw)
            o2 = jnp.concatenate([o2h[:bp], o2h[bp:]], axis=-1)

        pf = pick_packed_front(bsz, xp.shape[2], cb, 2, block, halo)
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            packed_front_tiled,
            pick_packed_front_tiled,
        )

        pft = (None if pf is not None else
               pick_packed_front_tiled(bsz, xp.shape[2], cb, 2, block,
                                       halo))

        def branch_l2(name, xk, sk, tk):
            if pf is not None:
                return packed_front_core(xk, None, sk, tk, wq(name, 2),
                                         p[name]["rel_h"], p[name]["rel_w"],
                                         levels=2, g=8, sub=pf[1], **kw)
            return packed_front_tiled(xk, None, sk, tk, wq(name, 2),
                                      p[name]["rel_h"], p[name]["rel_w"],
                                      levels=2, g=pft[0], sub=pft[1],
                                      slab=pft[2], **kw)

        s3, t3 = st_packed(2)
        x3, s3, t3 = fold(block_k(2), o2, s3, t3)
        o3 = branch_l2("attn3", x3, s3, t3)
        s4, t4 = st_packed(3)
        x4, s4, t4 = fold(block_k(3), o3, s4, t4)
        o4 = branch_l2("attn4", x4, s4, t4)

        oc = jnp.concatenate([o1, o2, o3, o4], axis=-1)
        if which == "noff":
            return oc  # skip unpack/ff/residual/repack
        xc = unpack_body(oc, g)
        ff = conv2d(xc, p["ff"]["w"], p["ff"]["b"], padding="zeros",
                    dtype=policy.dtype, precision=policy.precision)
        yp = pack_body(ff, g)
        return yp + xp

    return run


def main():
    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (B, HW, HW, 3))
    assert _packed_body_ok(B, HW, HW, 16, 8, 1)

    full = jax.jit(lambda xx: m2trans_apply(params, xx, cfg, policy=policy)
                   .astype(jnp.float32).mean()[None, None, None, None]
                   * jnp.ones((B, HW, HW, 3)) + xx * 0.999)

    from m2trans_tpu.ops.pallas.halo_attn_packed import pack_body

    def make_body_fn(which):
        run = make_cftm_variant(which, cfg, policy)

        def f(xx):
            xi = pad_to_multiple(xx, cfg.pad_multiple).astype(policy.dtype)
            res = conv2d(xi, params["head"]["w"], params["head"]["b"],
                         padding="reflect", dtype=policy.dtype,
                         precision=policy.precision)
            yp = pack_body(res, 8)
            for blk in params["body"]:
                yp = run(blk, yp)
            m = yp.astype(jnp.float32).mean()
            return xx * 0.999 + m * 1e-3

        return jax.jit(f)

    variants = {
        "packedbody_full": make_body_fn("realff"),
        "noff": make_body_fn("noff"),
        "nostats": make_body_fn("nostats"),
        "nob2restack": make_body_fn("nob2restack"),
        "model_full": full,
    }
    compare(variants, (x,), n1=6, n2=30, trials=5)


if __name__ == "__main__":
    main()
