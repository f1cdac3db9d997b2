"""Multi-host data parallelism: 2 jax.distributed processes on localhost
(CPU backend, 4 virtual devices each -> one global 8-device 'data' mesh).

Exercises the previously write-only train.py:29-32 path end-to-end: both
processes run the real jitted train step over the global mesh, contribute
their local batch slice via make_array_from_process_local_data (the
Trainer._put_batch recipe), and must agree with each other AND with a
single-process 8-device run of the identical problem.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_parallel_train_step():
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_COMPILATION_CACHE_DIR")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(WORKER))
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(port), str(pid), "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both hosts observe identical global loss and end in identical params
    assert outs[0] == outs[1], outs

    # single-process reference over the same global 8-device mesh
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.train.loop import make_optimizer, make_train_step

    cfg = Config(scale=2, n_feats=8, n_blocks=1, patch_size=16,
                 batch_size=8, lr=1e-3, epochs=2,
                 data_augment=0, cutmix=0.0, cutout=0.0)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg, steps_per_epoch=2)
    opt_state = opt.init(params)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = jax.device_put(opt_state, NamedSharding(mesh, P()))
    sharding = NamedSharding(mesh, P("data"))
    step = make_train_step(cfg, opt)

    losses = []
    for it in range(2):
        rng = np.random.default_rng(100 + it)
        lr = jax.device_put(
            rng.uniform(0, 1, (8, 8, 8, 3)).astype(np.float32), sharding)
        hr = jax.device_put(
            rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32), sharding)
        params, opt_state, metrics = step(
            params, opt_state, lr, hr, jax.random.PRNGKey(it), None,
            do_cutout=False)
        losses.append(float(metrics["loss"]))

    psum = float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree_util.tree_leaves(params)))
    np.testing.assert_allclose(
        [outs[0]["loss0"], outs[0]["loss1"], outs[0]["psum"]],
        [losses[0], losses[1], psum], rtol=1e-5)
