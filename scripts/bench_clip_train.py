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

    for lam, label in ((0.0, "clip OFF"), (0.01, "clip ON  (lambda 0.01)")):
        cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                     dtype="bfloat16", use_pallas=True, batch_size=BATCH,
                     lambda_clip=lam, cutmix=0.5, cutout=1)
        tx = make_optimizer(cfg, steps_per_epoch=100)
        step = make_train_step(cfg, tx, sem if lam > 0 else None)
        params = init_m2trans(jax.random.PRNGKey(2), cfg)
        opt = tx.init(params)
        t = time_steps(step, params, opt, lr_img, hr_img,
                       toks if lam > 0 else None)
        print(f"{label}: {t * 1e3:.1f} ms/step "
              f"({BATCH / t:.1f} samples/s)")
        if trace and lam > 0:
            from scripts.tpu_profile import report

            outdir = f"/tmp/m2t_clip_trace_{os.getpid()}"
            key = jax.random.PRNGKey(9)
            with jax.profiler.trace(outdir):
                for _ in range(3):
                    key, k = jax.random.split(key)
                    params, opt, aux = step(params, opt, lr_img, hr_img,
                                            k, toks)
                float(aux["loss"])
            report(outdir, steps=3, top=24)


if __name__ == "__main__":
    main()
