"""Fused packed feed-forward conv (ops/pallas/ff_packed.py) — interpret-
mode parity with the unpack -> conv2d -> repack composition it replaces,
including the packed residual add and zero edge padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m2trans_tpu.ops.conv import conv2d
from m2trans_tpu.ops.pallas.ff_packed import packed_ff_conv
from m2trans_tpu.ops.pallas.halo_attn_packed import pack_body, unpack_body


@pytest.mark.parametrize("h,w", [(32, 32), (32, 96), (24, 40)])
def test_packed_ff_conv_matches_composition(h, w, rng):
    g, nb, cb = 8, 4, 16
    c = nb * cb
    x = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(0, 0.5, (g, h, w, c)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(0, 0.1, (3, 3, c, c)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (c,)).astype(np.float32))

    oc = pack_body(x, g, interpret=True)
    xp = pack_body(res, g, interpret=True)

    got = packed_ff_conv(oc, xp, wgt.astype(jnp.bfloat16), bias, g=g,
                         nb=nb, interpret=True)
    got_u = np.asarray(unpack_body(got, g, interpret=True), np.float32)

    ff = conv2d(x, wgt, bias, padding="zeros", dtype=jnp.bfloat16)
    want = np.asarray((ff.astype(jnp.float32)
                       + res.astype(jnp.float32)).astype(jnp.bfloat16),
                      np.float32)
    np.testing.assert_allclose(got_u, want, atol=3e-2, rtol=3e-2)
    assert float(np.abs(got_u - want).mean()) < 3e-3


def test_packed_ff_conv_in_model_packed_core(rng, monkeypatch):
    """_FF_MODE='fused' must reproduce the default 'unpack' CFTM output
    through the whole packed-core path."""
    import m2trans_tpu.models.m2trans as mm
    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.models.m2trans import (
        ComputePolicy,
        _cftm_apply_fused_packed,
    )

    cfg = Config(scale=4, n_feats=64, n_blocks=1)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)["body"][0]
    pol = ComputePolicy(dtype=jnp.bfloat16, precision=None,
                        use_pallas=True, packed_body=True)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 64)).astype(np.float32))

    want = np.asarray(_cftm_apply_fused_packed(
        params, x, policy=pol, block=8, halo=1), np.float32)
    monkeypatch.setattr(mm, "_FF_MODE", "fused")
    got = np.asarray(_cftm_apply_fused_packed(
        params, x, policy=pol, block=8, halo=1), np.float32)
    scale = float(np.abs(want).max()) or 1.0
    np.testing.assert_allclose(got, want, atol=3e-2 * scale)
    assert float(np.abs(got - want).mean()) < 3e-3 * scale
