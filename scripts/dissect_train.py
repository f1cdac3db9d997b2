"""DEPRECATED INSTRUMENT (r5): per-op device self-times double-count
overlapped work and python-loop chains clip at the ~4.4 ms dispatch
floor (NOTES_ROUND5 measurement-layer rebuild). Kept for the kernel
isolation harness only - do NOT quote its numbers for dispatch or
default decisions; use scripts/ab.py compare_fori ablations instead.

Split the flagship train step's device time into forward and backward
and print per-op self-times for the gradient step.

Three timed programs, one compile each, slope-method wall times plus an
xplane trace of the full step:
  fwd   — loss value only (no grad), same policy as training;
  grad  — jax.grad of the loss (fwd + bwd, no optimizer);
  step  — the real jitted train step (grad + optax update).

Usage: python scripts/dissect_train.py [--trace]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.losses.pixel import l1_loss  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
from m2trans_tpu.train.loop import make_optimizer, make_train_step  # noqa: E402

B, LR_SIZE = 8, 96


def slope(fn, *args, n1=8, n2=40, trials=6):
    """Serialized-chain slope, minimum across trials: chain-of-n2 minus
    chain-of-n1 per extra step. The min (not median) is the right
    statistic for the jittery axon tunnel — hiccups only ADD time."""
    t1 = min(chain(fn, n1, *args) for _ in range(trials))
    t2 = min(chain(fn, n2, *args) for _ in range(trials))
    return (t2 - t1) / (n2 - n1)


def chain(fn, n, *args):
    t0 = time.perf_counter()
    out = None
    for i in range(n):
        out = fn(i, out, *args)
    jax.tree_util.tree_map(np.asarray, out)
    return time.perf_counter() - t0


def main():
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm tunnel
    scale, n_blocks = 4, 8
    for a in sys.argv[1:]:
        if a.startswith("--scale="):
            scale = int(a.split("=")[1])
        if a.startswith("--blocks="):
            n_blocks = int(a.split("=")[1])
    lr_size = (LR_SIZE * 4) // scale  # same 384^2 HR patch at every scale
    cfg = Config(scale=scale, n_feats=64, n_blocks=n_blocks, colors=3,
                 dtype="bfloat16", use_pallas=True, batch_size=B,
                 patch_size=lr_size * scale, cutmix=False, lambda_l1=1.0,
                 lambda_clip=0.0)
    policy = policy_from_config(cfg, for_training=True)
    key = jax.random.PRNGKey(0)
    params = init_m2trans(key, cfg)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    opt_state = tx.init(params)
    lr_img = jax.random.uniform(key, (B, lr_size, lr_size, 3))
    hr_img = jax.random.uniform(key, (B, lr_size * scale, lr_size * scale,
                                      3))

    def loss_fn(p, x, y):
        sr = m2trans_apply(p, x, cfg, policy=policy)
        return l1_loss(sr, y)

    fwd = jax.jit(loss_fn)
    grad = jax.jit(jax.grad(loss_fn))
    step = make_train_step(cfg, tx)

    # data-dependent chains: feed a scalar of the previous output back in
    def fwd_link(i, prev, p, x, y):
        if prev is not None:
            x = x + prev * 1e-9
        return fwd(p, x, y)

    def grad_link(i, prev, p, x, y):
        if prev is not None:
            x = x + prev["head"]["b"][0] * 1e-9
        return grad(p, x, y)

    state = {"params": params, "opt": opt_state}

    def step_link(i, prev, x, y):
        # the step donates params/opt buffers; give each chain its own
        # copies so the template state survives across chains
        st = prev or jax.tree_util.tree_map(jnp.copy, state)
        p2, o2, _ = step(st["params"], st["opt"], x, y,
                         jax.random.PRNGKey(i), None)
        return {"params": p2, "opt": o2}

    if "--split" in sys.argv:
        # attribute the backward: body-only vs tail-only grads
        from m2trans_tpu.models.m2trans import (
            cftm_apply,
            pad_to_multiple,
            tail_apply,
        )
        from m2trans_tpu.ops.conv import conv2d

        def body_out(p, x):
            xx = pad_to_multiple(x, cfg.pad_multiple).astype(policy.dtype)
            res = conv2d(xx, p["head"]["w"], p["head"]["b"],
                         padding="reflect", dtype=policy.dtype,
                         precision=policy.precision)
            y = res
            for blk in p["body"]:
                y = cftm_apply(blk, y, policy=policy)
            return res + y

        def loss_body(p, x):
            return jnp.mean(jnp.abs(body_out(p, x).astype(jnp.float32)))

        def loss_tail(p, x, y):
            z = jax.lax.stop_gradient(body_out(p, x))
            sr = tail_apply(p["tail"], z, scale=cfg.scale, policy=policy)
            return l1_loss(sr.astype(jnp.float32), y)

        gb = jax.jit(jax.grad(loss_body))
        gt = jax.jit(jax.grad(loss_tail))

        def body_link(i, prev, p, x):
            if prev is not None:
                x = x + prev["head"]["b"][0] * 1e-9
            return gb(p, x)

        def tail_link(i, prev, p, x, y):
            if prev is not None:
                x = x + prev["head"]["b"][0] * 1e-9
            return gt(p, x, y)

        print("compiling body grad...", flush=True)
        t_b = slope(body_link, params, lr_img)
        print(f"body fwd+bwd grad:    {t_b * 1e3:7.1f} ms/step", flush=True)
        print("compiling tail grad...", flush=True)
        t_t = slope(tail_link, params, lr_img, hr_img)
        print(f"tail-only grad (+body fwd): {t_t * 1e3:7.1f} ms/step",
              flush=True)

    print("compiling fwd...", flush=True)
    t_fwd = slope(fwd_link, params, lr_img, hr_img)
    print(f"fwd (loss only):      {t_fwd * 1e3:7.1f} ms/step", flush=True)
    print("compiling grad...", flush=True)
    t_grad = slope(grad_link, params, lr_img, hr_img)
    print(f"grad (fwd+bwd):       {t_grad * 1e3:7.1f} ms/step   "
          f"-> bwd ~ {(t_grad - t_fwd) * 1e3:.1f} ms", flush=True)
    print("compiling step...", flush=True)
    t_step = slope(step_link, lr_img, hr_img)
    print(f"train step (full):    {t_step * 1e3:7.1f} ms/step   "
          f"-> optax/aug ~ {(t_step - t_grad) * 1e3:.1f} ms", flush=True)

    if "--trace" in sys.argv:
        from scripts.tpu_profile import trace_and_report

        # trace the REAL train step (donation-friendly chain state)
        def traced(st, x, y):
            p2, o2, _ = step(st["params"], st["opt"], x, y,
                             jax.random.PRNGKey(0), None)
            return {"params": p2, "opt": o2}

        st0 = jax.tree_util.tree_map(jnp.copy, state)
        trace_and_report(traced, st0, lr_img, hr_img, steps=6)


if __name__ == "__main__":
    main()
