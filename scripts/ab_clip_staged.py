"""A/B the staged CLIP-loss formulation (VERDICT r3 #5) at real scale:

  full   — value_and_grad over sr of the monolithic semantic_loss
           (text encoder + hr-side Swin inside the grad program);
  staged — a fwd-only const stage (text embed + crop offsets + hr-side
           sims) re-run every step, then value_and_grad of
           semantic_loss_staged (only the sr-side Swin inside).

Both at the r3 recipe: full-size random-init MedCLIP (Swin-tiny/224 +
BERT-base), batch 8, n_patches 3, 384^2 sr/hr. Reports paired deltas
for f32 and bf16 MedCLIP dtypes.

Usage: python scripts/ab_clip_staged.py [f32|bf16|both]
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.losses.semantic import (  # noqa: E402
    clip_image_sims,
    clip_text_embed,
    crop_offsets,
    semantic_loss,
    semantic_loss_staged,
)
from m2trans_tpu.models.medclip.model import (  # noqa: E402
    MedCLIPConfig,
    init_medclip,
)
from scripts.ab import compare  # noqa: E402

BATCH, HR = 8, 384
NP_, CS = 3, 224


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm tunnel

    rng = np.random.default_rng(0)
    sr0 = jnp.asarray(rng.uniform(0, 1, (BATCH, HR, HR, 3)), jnp.float32)
    hr = jnp.asarray(rng.uniform(0, 1, (BATCH, HR, HR, 3)), jnp.float32)
    ids = jnp.asarray(rng.integers(1000, 20000, (BATCH, 64)), jnp.int32)
    mask = jnp.ones((BATCH, 64), jnp.int32)
    key = jax.random.PRNGKey(3)

    mcfg = MedCLIPConfig()
    mc_f32 = init_medclip(jax.random.PRNGKey(1), mcfg)

    for label in (("f32", "bf16") if which == "both" else (which,)):
        mc_p = (mc_f32 if label == "f32" else jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, mc_f32))
        kw = dict(n_patches=NP_, clip_size=CS)

        # mc_p MUST be an explicit jit argument: a closed-over param tree
        # is baked into the compile payload as HLO constants and the
        # 89 MB BERT table blows the remote-compile body limit
        # (HTTP 413 through the axon tunnel) — the reason this number
        # was never captured in r4.
        @jax.jit
        def full_p(mc, sr, hr_, kw=kw):
            def f(s):
                return semantic_loss(mc, mcfg, s, hr_, ids, mask, key,
                                     **kw)
            return jax.value_and_grad(f)(sr)

        @jax.jit
        def const_stage(mc, hr_, kw=kw):
            ys, xs = crop_offsets(key, BATCH, HR, HR, NP_ - 1, CS)
            t = clip_text_embed(mc, mcfg, ids, mask)
            sim_y = clip_image_sims(mc, mcfg, hr_, ys, xs, t, **kw)
            return ys, xs, t, sim_y

        @jax.jit
        def grad_stage(mc, sr, ys, xs, t, sim_y, kw=kw):
            def f(s):
                return semantic_loss_staged(mc, mcfg, s, ys, xs, t,
                                            sim_y, **kw)
            return jax.value_and_grad(f)(sr)

        def full(sr, mc_p=mc_p):
            return full_p(mc_p, sr, hr)

        def staged(sr, mc_p=mc_p):
            # the const stage re-runs every step (captions/hr/key change
            # per step in training) — charged to this variant
            return grad_stage(mc_p, sr, *const_stage(mc_p, hr))

        # numerical sanity once per dtype
        v0, g0 = full(sr0)
        v1, g1 = staged(sr0)
        print(f"[{label}] value full={float(v0):.6f} staged={float(v1):.6f}"
              f"  max|dg|={float(jnp.abs(g0 - g1).max()):.3e}", flush=True)

        print(f"--- MedCLIP {label} ---", flush=True)
        compare({"full": full, "staged": staged}, (sr0,),
                n1=2, n2=10, trials=5)


if __name__ == "__main__":
    main()
