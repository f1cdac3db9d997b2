"""Spatial (image-domain) model parallelism: full frames sharded over a
``space`` mesh axis with halo exchange — the image analog of ring/context
parallelism (SURVEY.md §2.5/§5; north-star streaming cine-loop config).

The reference has no distributed support at all (nn.DataParallel only,
reference train.py:73); this is new capability. Full-frame ultrasound SR
shards the image H dimension across devices; every stage that needs
neighbor pixels exchanges a halo over ICI via ``lax.ppermute`` inside
``shard_map``:

  * head 3x3 conv: 1-row halo, reflect-filled at true frame edges (emulates
    the conv's reflect padding);
  * each CFTM: 96-row halo (multi-hop ppermute when shards are shorter),
    zero-filled beyond the frame (both the windowed attention's unfold and
    the feed-forward conv zero-pad at the frame edge; see HALO_ROWS for the
    block-aligned receptive-depth derivation), with the beyond-frame-zeros
    invariant re-established after every stage;
  * instance norm: per-(sample, channel) statistics are global over the
    frame -> computed from shard interiors and ``psum``-reduced over the
    ``space`` axis;
  * tail: pointwise up to the last 3x3 reflect conv, which runs after a
    1-row halo exchange at the upscaled resolution.

Exactness: outputs are bit-comparable (float-associativity-level) to the
single-device forward whenever the padded height splits evenly
(H_pad % (32 * n_space) == 0) — verified on a CPU mesh in
tests/test_spatial.py. Composes with data parallelism over a 2-D
(data, space) mesh: pass ``batch_axis='data'``.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from m2trans_tpu.config import Config
from m2trans_tpu.models.m2trans import (
    ComputePolicy,
    make_branch_fn,
    policy_from_config,
)
from m2trans_tpu.ops.conv import conv2d, gelu_exact
from m2trans_tpu.ops.pixel_shuffle import pixel_shuffle_fast, ps_weight_perm

Params = Dict[str, Any]

# Per-CFTM halo width. The invalid-region depth at an extension boundary
# grows through the branch cascade because windowed attention is
# block-aligned (radius = one block + halo per level): attn1 invalidates
# the top 8 rows, attn2 (1/2 res) 16, attn3 (1/4) 32, attn4 compounds to
# 64, the feed-forward conv +1 -> 65. The halo must exceed that AND stay a
# multiple of the 32-px window-alignment unit -> 96.
HALO_ROWS = 96


def _gather_halo_rows(z: jnp.ndarray, m: int, n: int):
    """(top_halo, bottom_halo) of m rows each, gathered from as many
    neighbor shards as needed (multi-hop ppermute when m > shard height).
    Rows beyond the frame arrive as zeros (unpermuted ppermute targets)."""
    hs = z.shape[1]
    hops = -(-m // hs)
    above_parts, below_parts = [], []
    for k in range(1, hops + 1):
        above_parts.append(lax.ppermute(
            z, "space", [(i, i + k) for i in range(n - k)]))
        below_parts.append(lax.ppermute(
            z, "space", [(i, i - k) for i in range(k, n)]))
    above = jnp.concatenate(above_parts[::-1], axis=1)[:, -m:]
    below = jnp.concatenate(below_parts, axis=1)[:, :m]
    return above, below


def _exchange_rows(z: jnp.ndarray, m: int, n: int, fill: str) -> jnp.ndarray:
    """Concat [halo_from_above | z | halo_from_below] along H.

    Halos come from neighbor shards via ppermute; at true frame edges they
    are filled to emulate the stage's global padding: 'zeros' (rows beyond
    the frame already arrive as zeros) or 'reflect' (single-hop only)."""
    from_above, from_below = _gather_halo_rows(z, m, n)
    if fill == "reflect":
        assert m <= z.shape[1], "reflect fill requires m <= shard height"
        idx = lax.axis_index("space")
        top_fill = z[:, 1:m + 1][:, ::-1]
        bot_fill = z[:, -m - 1:-1][:, ::-1]
        from_above = jnp.where(idx == 0, top_fill, from_above)
        from_below = jnp.where(idx == n - 1, bot_fill, from_below)
    return jnp.concatenate([from_above, z, from_below], axis=1)


def _instance_norm_global(x_ext: jnp.ndarray, m: int, n: int,
                          eps: float = 1e-5) -> jnp.ndarray:
    """Instance norm with frame-global statistics: moments from the shard
    interior, psum-reduced over 'space', applied to interior + halos."""
    interior = x_ext[:, m:-m].astype(jnp.float32)
    cnt = interior.shape[1] * interior.shape[2] * n
    s = lax.psum(jnp.sum(interior, axis=(1, 2)), "space")
    ss = lax.psum(jnp.sum(interior * interior, axis=(1, 2)), "space")
    mean = s / cnt
    var = ss / cnt - mean * mean
    mean = mean[:, None, None, :]
    inv = lax.rsqrt(var + eps)[:, None, None, :]
    return ((x_ext.astype(jnp.float32) - mean) * inv).astype(x_ext.dtype)


def _edge_halo_mask(h_ext: int, m: int, n: int, dtype,
                    shard_h: int) -> jnp.ndarray:
    """(1, H_ext, 1, 1) multiplicative mask that zeroes extended rows lying
    beyond the global frame. The global model's ops see ZEROS beyond the
    frame edge (attention's zero-padded unfold, the zero-padded
    feed-forward conv); IN shifts zeros and attention writes into halo
    rows, so the invariant must be re-established after each stage."""
    idx = lax.axis_index("space")
    g = jnp.arange(h_ext) - m + idx * shard_h  # global row index
    ok = (g >= 0) & (g < n * shard_h)
    return ok.astype(dtype)[None, :, None, None]


def _cftm_sharded(p: Params, x: jnp.ndarray, *, n: int,
                  policy: ComputePolicy, block: int, halo: int
                  ) -> jnp.ndarray:
    """One CFTM on a shard: halo-extend, frame-global IN, the usual branch
    cascade, crop back to the interior. Mirrors models.m2trans.cftm_apply
    (reference CFTM.forward :132-164) with distributed statistics.

    bf16+Pallas shards route each branch through cftm_branch_fused — the
    SAME packed/banded/column-slab-tiled dispatch (and Pallas custom_vjp
    backward) the single-device path uses (VERDICT r3 item 3: per-shard
    frame widths exceed the banded gate on exactly the large frames
    sharding exists for, and the column-slab tiled cascade is the
    round-3 win there). The normalization is already applied globally,
    so the branch runs with an identity affine (s=1, t=0: out = B(z)+z,
    bit-matching the previous branch(z)+z composition)."""
    m = HALO_ROWS
    xe = _exchange_rows(x, m, n, fill="zeros")
    mask = _edge_halo_mask(xe.shape[1], m, n, xe.dtype, x.shape[1])
    use_fused = policy.use_pallas and policy.dtype == jnp.bfloat16

    xn = _instance_norm_global(xe, m, n) * mask
    x1, x2, x3, x4 = jnp.split(xn, 4, axis=-1)

    if use_fused:
        from m2trans_tpu.ops.pallas.halo_attn import cftm_branch_fused

        bsz, cb = x.shape[0], x.shape[-1] // 4
        ones = jnp.ones((bsz, cb), jnp.float32)

        def fused(name, z, levels, s):
            c = cb * 4 ** levels
            w_qkv = p[name]["qkv_w"].reshape(c, 3 * c).astype(policy.dtype)
            return cftm_branch_fused(
                z.astype(policy.dtype), w_qkv, p[name]["rel_h"],
                p[name]["rel_w"], ones * s, ones * 0.0, r=0.0,
                block=block, halo=halo, levels=levels)

        # cascade averages folded into the kernel affine: z=(xk+prev)/2
        # = (xk + prev) * 0.5, so feed the XLA sum with s=0.5
        x1 = fused("attn1", x1, 0, 1.0) * mask
        x2 = fused("attn2", x2 + x1, 1, 0.5) * mask
        x3 = fused("attn3", x3 + x2, 2, 0.5) * mask
        x4 = fused("attn4", x4 + x3, 2, 0.5) * mask
    else:
        branch = make_branch_fn(p, policy, block=block, halo=halo)
        x1 = (branch("attn1", x1, 0) + x1) * mask
        x2 = (x2 + x1) * 0.5
        x2 = (branch("attn2", x2, 1) + x2) * mask
        x3 = (x3 + x2) * 0.5
        x3 = (branch("attn3", x3, 2) + x3) * mask
        x4 = (x4 + x3) * 0.5
        x4 = (branch("attn4", x4, 2) + x4) * mask

    xc = jnp.concatenate([x1, x2, x3, x4], axis=-1)
    ff = conv2d(xc, p["ff"]["w"], p["ff"]["b"], padding="zeros",
                dtype=policy.dtype, precision=policy.precision)
    out = ff + xe
    return out[:, m:-m]


def _tail_sharded(p: Params, x: jnp.ndarray, *, scale: int, n: int,
                  policy: ComputePolicy) -> jnp.ndarray:
    kw = dict(dtype=policy.dtype, precision=policy.precision)

    def conv_ps_gelu(z, w, b, r):
        perm = ps_weight_perm(w.shape[-1] // (r * r), r)
        y = conv2d(z, w[..., perm], b[perm], padding="valid", **kw)
        return pixel_shuffle_fast(gelu_exact(y), r)

    if scale == 4:
        x = conv_ps_gelu(x, p["c0"]["w"], p["c0"]["b"], 2)
        x = conv_ps_gelu(x, p["c1"]["w"], p["c1"]["b"], 2)
        last_w = p["c2"]["w"]
    else:
        x = conv_ps_gelu(x, p["c0"]["w"], p["c0"]["b"], scale)
        last_w = p["c1"]["w"]
    # final 3x3 reflect conv at HR resolution: 1-row halo
    xe = _exchange_rows(x, 1, n, fill="reflect")
    y = conv2d(xe, last_w, padding="reflect", **kw)
    return y[:, 1:-1]


def spatial_sharded_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: Config,
    *,
    mesh: Mesh,
    policy: Optional[ComputePolicy] = None,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Full-frame SR forward with the frame sharded over mesh axis 'space'.

    x: (B, H, W, colors) global array. Returns (B, H*scale, W*scale, 3),
    sharded over 'space' on the H axis (crop included). Requires the padded
    height to split evenly: pad-to-32(H) % (32 * n_space) == 0.
    """
    if policy is None:
        policy = policy_from_config(cfg)
    n = mesh.shape["space"]
    h, w = x.shape[1], x.shape[2]
    mult = cfg.pad_multiple
    ph = (mult - h % mult) % mult
    pw = (mult - w % mult) % mult
    if (h + ph) % (mult * n) != 0:
        raise ValueError(
            f"padded height {h + ph} must divide over {n} shards in "
            f"multiples of {mult}; pick H so that pad32(H) % {mult * n} == 0")
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

    fwd = _build_sharded_fwd(mesh, _model_key(cfg), policy, batch_axis, n)
    out = fwd(params, x)
    return out[:, : h * cfg.scale, : w * cfg.scale, :]


def _model_key(cfg: Config):
    """The Config fields the sharded forward actually closes over (Config
    itself holds lists and is unhashable)."""
    return (cfg.scale, cfg.rgb_range, cfg.block_size, cfg.halo_size)


@lru_cache(maxsize=None)
def _build_sharded_fwd(mesh: Mesh, model_key, policy: ComputePolicy,
                       batch_axis: Optional[str], n: int):
    """Jitted shard_map forward, cached so repeated calls (eval loops,
    streaming) re-trace only per (mesh, model, policy, shape)."""
    scale, rgb_range, block, halo = model_key
    bspec = batch_axis  # None -> replicated batch
    in_spec = P(bspec, "space", None, None)
    out_spec = P(bspec, "space", None, None)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), in_spec), out_specs=out_spec, check_vma=False)
    def fwd(prm, xl):
        xl = xl.astype(policy.dtype)
        # head: 3x3 reflect conv with a 1-row halo
        xe = _exchange_rows(xl, 1, n, fill="reflect")
        res = conv2d(xe, prm["head"]["w"], prm["head"]["b"],
                     padding="reflect", dtype=policy.dtype,
                     precision=policy.precision)[:, 1:-1]
        y = res
        for blk in prm["body"]:
            y = _cftm_sharded(blk, y, n=n, policy=policy,
                              block=block, halo=halo)
        y = res + y
        y = _tail_sharded(prm["tail"], y, scale=scale, n=n, policy=policy)
        return jnp.clip(y.astype(jnp.float32), 0.0, rgb_range)

    return jax.jit(fwd)


def fused_gate_ok(w: int, n_feats: int, block: int = 8,
                  halo: int = 1) -> bool:
    """True if every CFTM branch level fits the Pallas banded-kernel VMEM
    gate at frame width ``w`` (the gate scales with W — bands span the full
    width). Beyond it the branches fall back to the slower XLA composition.
    ``block``/``halo`` must match what the model threads into the kernels
    (cfg.block_size / cfg.halo_size — ADVICE r2)."""
    from m2trans_tpu.ops.pallas.halo_attn import (
        _banded_limit,
        _banded_vmem_bytes,
    )

    cb = n_feats // 4
    for levels in (0, 1, 2):
        c = cb * 4 ** levels
        if _banded_vmem_bytes(w, cb, c, block, halo,
                              levels) > _banded_limit(levels):
            return False
    return True


# Frames at/above this pixel count are sharded even when the fused kernels
# would still fit (compute division beats single-chip latency regardless).
_AUTO_PX_THRESHOLD = 512 * 512


def auto_space_mesh(h: int, w: int, cfg: Config,
                    policy: Optional[ComputePolicy] = None,
                    devices=None) -> Optional[Mesh]:
    """Pick a 'space' mesh for a frame that is too large for the
    single-chip fast path, or None to stay single-chip.

    Engages only in bf16 mode (f32 parity mode stays exactly
    single-device-reproducible) when >1 device is visible and the frame
    either exceeds the fused-kernel VMEM gate or is large outright. Splits
    H over the largest device count that divides the padded height into
    32-row units — each shard carries 1/n of the compute, so large-frame
    p50 latency drops ~n-fold even where the per-shard width still takes
    the XLA branch path (the gate scales with W, not H)."""
    return auto_space_mesh_multi([(h, w)], cfg, policy, devices)


def auto_space_mesh_multi(shapes, cfg: Config,
                          policy: Optional[ComputePolicy] = None,
                          devices=None) -> Optional[Mesh]:
    """auto_space_mesh over a SET of (h, w) frame shapes (a mixed-size cine
    directory): engages if any frame wants sharding, with a shard count
    that divides EVERY frame's padded height — a mesh picked from one
    frame must not make another frame raise mid-stream (ADVICE r2).

    Defaults to ``jax.local_devices()``: the callers feed host-local
    arrays, so in a multi-host run a mesh over non-addressable global
    devices could not be used (ADVICE r2)."""
    import math

    import numpy as _np

    if policy is None:
        policy = policy_from_config(cfg)
    if policy.dtype != jnp.bfloat16:
        return None
    devices = list(devices if devices is not None else jax.local_devices())
    if len(devices) < 2:
        return None
    mult = cfg.pad_multiple
    big = False
    units_gcd = 0
    for h, w in shapes:
        big = big or (policy.use_pallas
                      and not fused_gate_ok(w, cfg.n_feats, cfg.block_size,
                                            cfg.halo_size)) \
            or h * w >= _AUTO_PX_THRESHOLD
        units = (h + (mult - h % mult) % mult) // mult  # padded 32-row units
        units_gcd = math.gcd(units_gcd, units)
    if not big:
        return None
    n = 1
    for cand in range(2, min(len(devices), units_gcd) + 1):
        if units_gcd % cand == 0:
            n = cand
    if n < 2:
        return None
    return Mesh(_np.asarray(devices[:n]), ("space",))
