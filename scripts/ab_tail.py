"""Within-process model A/B: tap-packed vs per-tap tail phase conv."""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans,
    m2trans_apply,
    policy_from_config,
)
import m2trans_tpu.ops.pallas.tail_band as tb  # noqa: E402
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

    tb._TAP_PACKED = False
    a = jax.jit(fresh(fwd)).lower(x).compile()
    tb._TAP_PACKED = True
    b = jax.jit(lambda xx: fwd(xx) + 0.0).lower(x).compile()

    compare({"pertap_r3": a, "tap_packed_r4": b}, (x,), n1=8, n2=40,
            trials=6)


if __name__ == "__main__":
    main()
