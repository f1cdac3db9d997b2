"""Ad-hoc: profile the flagship bf16+Pallas x4 forward on the real TPU."""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import (  # noqa: E402
    init_m2trans, m2trans_apply, policy_from_config)
from scripts.tpu_profile import trace_and_report  # noqa: E402


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # tunnel warmup

    cfg = Config(scale=4, n_feats=64, n_blocks=8, colors=3, dtype="bfloat16",
                 use_pallas=True)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def step(x):
        y = m2trans_apply(params, x, cfg, policy=policy)
        m = y.astype(jnp.float32).mean()
        return x * 0.999 + m * 1e-3

    x0 = jax.random.uniform(jax.random.PRNGKey(1), (batch, 96, 96, 3))
    trace_and_report(step, x0, steps=8)


if __name__ == "__main__":
    main()
