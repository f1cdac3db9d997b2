"""Real-scale clip-regularized train step on the TPU (VERDICT r2 item 4):
full-size random-init MedCLIP (Swin-tiny/224 + BERT-base) through the
SemanticLoss, lambda_clip>0, flagship x4 model, batch 8.

Prints ms/step with clip off vs on; --trace additionally dumps per-op
device self-times for the clip-on step.

Usage: python scripts/bench_clip_train.py [--trace]
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
from m2trans_tpu.losses.semantic import SemanticLossFn  # noqa: E402
from m2trans_tpu.models import init_m2trans  # noqa: E402
from m2trans_tpu.models.medclip.model import (  # noqa: E402
    MedCLIPConfig,
    init_medclip,
)
from m2trans_tpu.train.loop import (  # noqa: E402
    make_optimizer,
    make_train_step,
)

BATCH, LR_SIZE = 8, 96


def time_steps(step_fn, params, opt, lr_img, hr_img, toks, n=10):
    key = jax.random.PRNGKey(0)
    # warmup/compile
    params, opt, aux = step_fn(params, opt, lr_img, hr_img, key, toks)
    float(aux["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        key, k = jax.random.split(key)
        params, opt, aux = step_fn(params, opt, lr_img, hr_img, k, toks)
    float(aux["loss"])  # force the chain
    return (time.perf_counter() - t0) / n


def main():
    trace = "--trace" in sys.argv
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

    rng = np.random.default_rng(0)
    lr_img = jnp.asarray(rng.uniform(0, 1, (BATCH, LR_SIZE, LR_SIZE, 3)),
                         jnp.float32)
    hr_img = jnp.asarray(rng.uniform(0, 1, (BATCH, 4 * LR_SIZE,
                                            4 * LR_SIZE, 3)), jnp.float32)
    # static-padded token batch (the Trainer tokenizes on host; shapes are
    # what the jitted loss sees)
    toks = {"input_ids": jnp.asarray(
                rng.integers(1000, 20000, (BATCH, 64)), jnp.int32),
            "attention_mask": jnp.ones((BATCH, 64), jnp.int32),
            "token_type_ids": jnp.zeros((BATCH, 64), jnp.int32)}

    mcfg = MedCLIPConfig()  # full size: Swin-tiny/224 + BERT-base
    mc_params = init_medclip(jax.random.PRNGKey(1), mcfg)
    n_mc = sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(mc_params))
    print(f"MedCLIP params: {n_mc / 1e6:.1f} M (full size)")
    sem = SemanticLossFn(mc_params, mcfg, tokenizer=None)
    sem.__dict__["tokenize"] = None  # host tokenizer not needed here

    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True, batch_size=BATCH,
                 lambda_clip=0.0, cutmix=0.5, cutout=1)
    tx = make_optimizer(cfg, steps_per_epoch=100)
    step = make_train_step(cfg, tx, None)
    params = init_m2trans(jax.random.PRNGKey(2), cfg)
    opt = tx.init(params)
    t_off = time_steps(step, params, opt, lr_img, hr_img, None)
    print(f"clip OFF: {t_off * 1e3:.1f} ms/step "
          f"({BATCH / t_off:.1f} samples/s)")

    # The monolithic clip-on step exceeds the axon tunnel's remote-compile
    # HTTP body limit (413) — an environment artifact, not a device limit.
    # Measure the exact split formulation instead: total loss
    # L = l1(sr) + lam*clip(sr); dL/dp = vjp_model(dl1/dsr + lam*dclip/dsr),
    # so program A computes (clip, dclip/dsr) on the frozen SR image and
    # program B injects that cotangent into the model step via
    # <sr, stop_grad(g_clip)>. A+B serial == the monolithic step's math.
    from m2trans_tpu.models import m2trans_apply, policy_from_config

    policy = policy_from_config(cfg)           # inference: fwd_only
    # the differentiable model step needs the training policy (the
    # whole-CFTM packed-body flow is forward-only; its cores carry no vjp)
    policy_tr = policy_from_config(cfg, for_training=True)
    lam = 0.01

    @jax.jit
    def clip_grad(mc_p, sr, hr, ids, mask, tti, key):
        def f(s):
            from m2trans_tpu.losses.semantic import semantic_loss

            return semantic_loss(mc_p, mcfg, s, hr, ids, mask, key,
                                 token_type_ids=tti)

        val, g = jax.value_and_grad(f)(sr)
        return val, g

    @jax.jit
    def fwd_only(p, lr):
        return m2trans_apply(p, lr, cfg, policy=policy)

    from functools import partial as _partial

    @_partial(jax.jit, donate_argnums=(0, 1))
    def model_step(p, opt_state, lr, hr, g_clip, key):
        def loss_fn(pp):
            sr = m2trans_apply(pp, lr, cfg, policy=policy_tr)
            l1 = jnp.mean(jnp.abs(sr.astype(jnp.float32)
                                  - hr.astype(jnp.float32)))
            inj = jnp.sum(sr.astype(jnp.float32)
                          * jax.lax.stop_gradient(g_clip))
            return l1 + lam * inj

        loss, grads = jax.value_and_grad(loss_fn)(p)
        import optax as _optax

        updates, opt_new = tx.update(grads, opt_state, p)
        return _optax.apply_updates(p, updates), opt_new, loss

    key = jax.random.PRNGKey(0)
    ids, msk, tti = (toks["input_ids"], toks["attention_mask"],
                     toks["token_type_ids"])

    for mc_dt, mc_label in ((None, "f32 MedCLIP"),
                            (jnp.bfloat16, "bf16 MedCLIP")):
        mc_p = (mc_params if mc_dt is None else jax.tree_util.tree_map(
            lambda x: x.astype(mc_dt)
            if x.dtype == jnp.float32 else x, mc_params))

        def split_step(p, opt_state, key, mc_p=mc_p):
            sr = fwd_only(p, lr_img)
            cval, g = clip_grad(mc_p, sr, hr_img, ids, msk, tti, key)
            p, opt_state, loss = model_step(p, opt_state, lr_img, hr_img,
                                            g.astype(jnp.float32), key)
            return p, opt_state, loss, cval

        params2 = init_m2trans(jax.random.PRNGKey(2), cfg)
        opt2 = tx.init(params2)
        params2, opt2, loss, cval = split_step(params2, opt2, key)
        float(loss)
        t0 = time.perf_counter()
        n = 8
        for i in range(n):
            key, k = jax.random.split(key)
            params2, opt2, loss, cval = split_step(params2, opt2, k)
        float(loss), float(cval)
        t_on = (time.perf_counter() - t0) / n
        print(f"clip ON (lambda {lam}, split A+B, {mc_label}): "
              f"{t_on * 1e3:.1f} ms/step ({BATCH / t_on:.1f} samples/s); "
              f"clip overhead {(t_on - t_off) * 1e3:.1f} ms")

    if trace:
        from scripts.tpu_profile import report

        outdir = f"/tmp/m2t_clip_trace_{os.getpid()}"
        with jax.profiler.trace(outdir):
            for _ in range(2):
                key, k = jax.random.split(key)
                params2, opt2, loss, cval = split_step(params2, opt2, k)
            float(loss)
        report(outdir, steps=2, top=20)


if __name__ == "__main__":
    main()
