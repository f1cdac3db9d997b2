"""Worker process for tests/test_multihost.py: one of N jax.distributed
processes on the CPU backend, running data-parallel train steps over the
GLOBAL device mesh with per-host batch contribution — the real multi-host
code path of train.py:29-32 / Trainer._put_batch.

Usage: python tests/_multihost_worker.py <coordinator_port> <process_id> \
           <num_processes>
Prints one JSON line {"loss0":..., "loss1":..., "psum":...} on success.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4")
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc, jax.devices()

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.train.loop import make_optimizer, make_train_step

    cfg = Config(scale=2, n_feats=8, n_blocks=1, patch_size=16,
                 batch_size=4 * nproc, lr=1e-3, epochs=2,
                 data_augment=0, cutmix=0.0, cutout=0.0)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg, steps_per_epoch=2)
    opt_state = opt.init(params)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    batch_sharding = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    opt_state = jax.device_put(opt_state, rep)

    step = make_train_step(cfg, opt)

    losses = []
    for it in range(2):
        # identical global batch on every host (deterministic), local slice
        # contributed through make_array_from_process_local_data — the same
        # recipe as Trainer._put_batch
        rng = np.random.default_rng(100 + it)
        g_lr = rng.uniform(0, 1, (cfg.batch_size, 8, 8, 3)).astype(
            np.float32)
        g_hr = rng.uniform(0, 1, (cfg.batch_size, 16, 16, 3)).astype(
            np.float32)
        sl = slice(pid * 4, (pid + 1) * 4)
        lr = jax.make_array_from_process_local_data(batch_sharding,
                                                    g_lr[sl])
        hr = jax.make_array_from_process_local_data(batch_sharding,
                                                    g_hr[sl])
        params, opt_state, metrics = step(
            params, opt_state, lr, hr, jax.random.PRNGKey(it), None,
            do_cutout=False)
        losses.append(float(metrics["loss"]))

    psum = float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree_util.tree_leaves(params)))
    print(json.dumps({"loss0": losses[0], "loss1": losses[1],
                      "psum": psum}), flush=True)


if __name__ == "__main__":
    main()
