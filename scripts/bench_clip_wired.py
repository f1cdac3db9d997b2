"""The PRODUCTION clip-regularized train step (make_train_step with the
staged CLIP loss + traced MedCLIP weights) on the real TPU at the x4
flagship recipe — the step the Trainer actually dispatches.

History: the r2-r4 monolithic clip-on step could not even compile
through the remote tunnel (closure-captured 89 MB BERT table -> HTTP
413), so scripts/bench_clip_train.py measured an equivalent two-program
split. With clip_params traced (e24fcd2) and the loss staged inside the
step (const stage outside value_and_grad), the real step compiles and
this script times it directly, clip off vs on.

Usage: python scripts/bench_clip_wired.py [--out CLIPSTEP_rNN.json]
"""

import json
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


def time_steps(step_fn, params, opt, lr_img, hr_img, toks, clip_p,
               n=20):
    key = jax.random.PRNGKey(0)
    params, opt, aux = step_fn(params, opt, lr_img, hr_img, key, toks,
                               clip_params=clip_p)
    float(aux["loss"])  # compile + warm
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            key, k = jax.random.split(key)
            params, opt, aux = step_fn(params, opt, lr_img, hr_img, k,
                                       toks, clip_params=clip_p)
        float(aux["loss"])
        dt = (time.perf_counter() - t0) / n
        best = dt if best is None else min(best, dt)
    return best, aux


def main():
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

    rng = np.random.default_rng(0)
    lr_img = jnp.asarray(rng.uniform(0, 1, (BATCH, LR_SIZE, LR_SIZE, 3)),
                         jnp.float32)
    hr_img = jnp.asarray(rng.uniform(0, 1, (BATCH, 4 * LR_SIZE,
                                            4 * LR_SIZE, 3)), jnp.float32)
    toks = {"input_ids": jnp.asarray(
                rng.integers(1000, 20000, (BATCH, 64)), jnp.int32),
            "attention_mask": jnp.ones((BATCH, 64), jnp.int32),
            "token_type_ids": jnp.zeros((BATCH, 64), jnp.int32)}

    mcfg = MedCLIPConfig()
    mc_params = init_medclip(jax.random.PRNGKey(1), mcfg)
    sem = SemanticLossFn(mc_params, mcfg, tokenizer=None,
                         dtype=jnp.bfloat16)

    results = {}
    for label, lam in (("off", 0.0), ("on", 0.01)):
        cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3,
                     dtype="bfloat16", use_pallas=True,
                     batch_size=BATCH, lambda_clip=lam,
                     medclip_dtype="bfloat16", cutmix=0.5, cutout=1)
        tx = make_optimizer(cfg, steps_per_epoch=100)
        step = make_train_step(cfg, tx, sem if lam > 0 else None)
        params = init_m2trans(jax.random.PRNGKey(2), cfg)
        opt = tx.init(params)
        dt, aux = time_steps(step, params, opt, lr_img, hr_img,
                             toks if lam > 0 else None,
                             sem.params if lam > 0 else None)
        results[label] = round(dt * 1e3, 1)
        print(f"clip {label}: {dt * 1e3:.1f} ms/step "
              f"({BATCH / dt:.1f} samples/s) loss={float(aux['loss']):.4f}"
              f" clip={float(aux['clip']):.6f}", flush=True)

    if out_path:
        with open(out_path, "w") as f:
            json.dump({
                "metric": "production_clip_train_step_ms",
                "recipe": "make_train_step, x4 flagship nf64 nb8, batch "
                          "8, 96->384, bf16+Pallas, staged CLIP loss, "
                          "full-size bf16 MedCLIP traced as clip_params, "
                          "cutmix+cutout on",
                "ms_per_step": results}, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
