"""M2Trans — coarse-to-fine wavelet-pyramid halo-attention super-resolution
model, as a pure-functional JAX/NHWC network.

Architecture parity with the reference (models/M2Trans_network.py):
  head 3x3 reflect conv (colors -> n_feats) -> n_blocks x CFTM -> global
  residual -> pixel-shuffle tail -> clamp[0, rgb_range] -> crop to (H*s, W*s).
Inputs are reflect-padded to a multiple of LCM(8,16,32)=32 first (:78-86).

Each CFTM (reference :114-196, constructed with norm=True at :37):
  InstanceNorm -> channel-chunk into 4 branches of n_feats/4; branch k runs
  halo window attention at 1/2^(k-1) spatial scale via stacked Haar DWT with
  cascaded fusion x_k = (x_k + x_{k-1})/2; concat -> 3x3 conv feed-forward ->
  residual from the un-normalized input.

Params are a plain pytree (nested dicts / lists). The dead-but-checkpointed
``sub_mean``/``add_mean`` MeanShift convs (reference :30-31, constructed but
never called in forward, :370-379) are kept in the pytree for checkpoint-key
parity and marked frozen for the optimizer (see trainable_mask).

TPU-first notes:
  * NHWC keeps channels on the lane axis; every conv is an MXU matmul.
  * A ComputePolicy selects f32+HIGHEST contractions (bit-parity eval) or
    bf16 (speed); params always stay f32.
  * The whole forward is one jittable function with static shapes; the
    Pallas fused halo-attention kernel is switched in via policy.use_pallas.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax import lax

from m2trans_tpu.config import Config
from m2trans_tpu.ops.conv import conv2d, gelu_exact
from m2trans_tpu.ops.halo_attention import halo_attention
from m2trans_tpu.ops.norm import instance_norm
from m2trans_tpu.ops.pad import pad_to_multiple
from m2trans_tpu.ops.pixel_shuffle import pixel_shuffle_fast, ps_weight_perm
from m2trans_tpu.ops.wavelet import haar_dwt, haar_iwt

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ComputePolicy:
    """Numerics policy threaded through the forward pass."""

    dtype: Any = jnp.float32
    # HIGHEST gives true-f32 contractions (JAX's default runs reduced
    # precision); bf16 mode leaves it None for full MXU speed.
    precision: Optional[lax.Precision] = lax.Precision.HIGHEST
    use_pallas: bool = False
    # Whole-CFTM packed flow (inference-only: the packed-core kernels
    # carry no vjp): pack the 64-ch body tensor once per CFTM into a
    # branch-major (B/8, H, W, 512) lane layout, run every branch and
    # cascade fold packed, unpack once before the ff conv. Eliminates
    # the per-branch pack/unpack round trips AND the XLA staging copies
    # that 16-lane slicing of a 64-lane tensor forces. Engaged only when
    # every branch's packed gate passes (_packed_body_ok); training
    # keeps this False.
    packed_body: bool = False


def policy_from_config(cfg: Config, *,
                       for_training: bool = False) -> ComputePolicy:
    """Numerics policy for ``cfg``. ``for_training`` disables the
    forward-only packed-body flow (its core kernels carry no vjp; the
    differentiable per-branch fused path is used under jax.grad)."""
    if cfg.dtype == "bfloat16":
        return ComputePolicy(dtype=jnp.bfloat16, precision=None,
                             use_pallas=cfg.use_pallas,
                             packed_body=not for_training)
    return ComputePolicy(dtype=jnp.float32, precision=lax.Precision.HIGHEST,
                         use_pallas=cfg.use_pallas)


# ---------------------------------------------------------------------------
# Initialization (matches PyTorch's distributions so from-scratch training is
# statistically equivalent; exact values are irrelevant to checkpoint parity).
# ---------------------------------------------------------------------------


def _conv_init(key, kh, kw, cin, cout, bias=True):
    """PyTorch Conv2d default init: kaiming_uniform(a=sqrt(5)) on the weight
    -> U(+-sqrt(1/fan_in)); bias U(+-1/sqrt(fan_in)); fan_in = cin*kh*kw."""
    wkey, bkey = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    p = {"w": jax.random.uniform(wkey, (kh, kw, cin, cout), jnp.float32,
                                 -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(bkey, (cout,), jnp.float32, -bound, bound)
    return p


def _tblock_init(key, ch, block=8, halo=1):
    """TBlock init (reference :342-345): qkv kaiming_normal(fan_out, relu)
    = N(0, sqrt(2/fan_out)) with conv fan_out = 3*ch; rel_h/rel_w ~ N(0,1)."""
    k1, k2, k3 = jax.random.split(key, 3)
    win = block + 2 * halo
    std = math.sqrt(2.0 / (3 * ch))
    return {
        "qkv_w": jax.random.normal(k1, (1, 1, ch, 3 * ch), jnp.float32) * std,
        "rel_h": jax.random.normal(k2, (win, ch // 2), jnp.float32),
        "rel_w": jax.random.normal(k3, (win, ch // 2), jnp.float32),
    }


def _mean_shift(sign: float, rgb_range: float) -> Params:
    """Frozen DIV2K MeanShift 1x1 conv (reference :27-31, :370-379) — dead in
    forward but present in checkpoints; kept for key parity."""
    rgb_mean = jnp.array([0.4488, 0.4371, 0.4040], jnp.float32)
    return {
        "w": jnp.eye(3, dtype=jnp.float32).reshape(1, 1, 3, 3),
        "b": sign * rgb_range * rgb_mean,
    }


def init_m2trans(key: jax.Array, cfg: Config) -> Params:
    nf = cfg.n_feats
    keys = jax.random.split(key, cfg.n_blocks + 8)
    params: Params = {
        "sub_mean": _mean_shift(-1.0, cfg.rgb_range),
        "add_mean": _mean_shift(+1.0, cfg.rgb_range),
        "head": _conv_init(keys[0], 3, 3, cfg.colors, nf),
    }
    body: List[Params] = []
    for i in range(cfg.n_blocks):
        bk = jax.random.split(keys[1 + i], 5)
        body.append({
            # branch widths: nf/4 full-res; DWT x4 channels per level
            # (reference :119-122 and channel arithmetic in SURVEY.md §2.1)
            "attn1": _tblock_init(bk[0], nf // 4),
            "attn2": _tblock_init(bk[1], nf),
            "attn3": _tblock_init(bk[2], nf * 4),
            "attn4": _tblock_init(bk[3], nf * 4),
            "ff": _conv_init(bk[4], 3, 3, nf, nf),
        })
    params["body"] = body

    tk = jax.random.split(keys[-1], 3)
    if cfg.scale == 4:
        params["tail"] = {
            "c0": _conv_init(tk[0], 1, 1, nf, nf * 4),
            "c1": _conv_init(tk[1], 1, 1, nf, nf * 4),
            "c2": _conv_init(tk[2], 3, 3, nf, 3, bias=False),
        }
    else:
        s = cfg.scale
        params["tail"] = {
            "c0": _conv_init(tk[0], 1, 1, nf, nf * s * s),
            "c1": _conv_init(tk[1], 3, 3, nf, 3, bias=False),
        }
    return params


def trainable_mask(params: Params) -> Params:
    """True for trainable leaves; sub_mean/add_mean are frozen
    (requires_grad=False in the reference, :378-379)."""
    def mask_for(path_top, sub):
        frozen = path_top in ("sub_mean", "add_mean")
        return jax.tree_util.tree_map(lambda _: not frozen, sub)

    return {k: mask_for(k, v) for k, v in params.items()}


def param_count(params: Params, trainable_only: bool = False) -> int:
    if trainable_only:
        mask = trainable_mask(params)
        leaves = zip(jax.tree_util.tree_leaves(params),
                     jax.tree_util.tree_leaves(mask))
        return sum(x.size for x, m in leaves if m)
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def tblock_apply(p: Params, x: jnp.ndarray, *, block: int = 8, halo: int = 1,
                 policy: ComputePolicy = ComputePolicy()) -> jnp.ndarray:
    """Halo-attention transformer block (reference TBlock.forward :290-340).

    Pads H/W to a multiple of ``block`` with reflect padding and crops back
    (:296-305, :338-340) — never triggered inside the composed model whose
    inputs are already 32-aligned at every pyramid level, but kept for parity
    of the standalone op.
    """
    h, w = x.shape[1], x.shape[2]
    ph = (block - h % block) % block
    pw = (block - w % block) % block
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

    # The fused Pallas kernel is the bf16 fast path. In f32 parity mode the
    # XLA path runs with HIGHEST-precision contractions instead — HIGHEST
    # inside Mosaic triggers multi-pass matmul expansion that the remote
    # TPU compiler handles poorly, and parity mode is about exactness, not
    # speed.
    if policy.use_pallas and policy.dtype == jnp.bfloat16:
        from m2trans_tpu.ops.pallas.halo_attn import halo_attention_qkv_fused

        c = x.shape[-1]
        w_qkv = p["qkv_w"].reshape(c, 3 * c).astype(policy.dtype)
        out = halo_attention_qkv_fused(x.astype(policy.dtype), w_qkv,
                                       p["rel_h"], p["rel_w"],
                                       block=block, halo=halo)
    else:
        qkv = conv2d(x, p["qkv_w"], padding="valid", dtype=policy.dtype,
                     precision=policy.precision)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = halo_attention(q, k, v, p["rel_h"], p["rel_w"], block=block,
                             halo=halo, precision=policy.precision)
    if ph or pw:
        out = out[:, :h, :w]
    return out


def make_branch_fn(p: Params, policy: ComputePolicy, *, block: int = 8,
                   halo: int = 1):
    """Returns branch(name, z, levels) computing one CFTM wavelet branch:
    DWT^levels -> halo attention -> IWT^levels. The bf16+Pallas fast path
    runs the whole branch as one fused kernel (no coarse-tensor HBM
    round-trips); otherwise XLA ops. Shared by the single-device forward
    and the spatially-sharded forward."""
    use_fused = policy.use_pallas and policy.dtype == jnp.bfloat16

    def branch(name, z, levels):
        if use_fused:
            from m2trans_tpu.ops.pallas.halo_attn import (
                halo_attention_qkv_fused,
            )

            c = z.shape[-1] * 4 ** levels
            w_qkv = p[name]["qkv_w"].reshape(c, 3 * c).astype(policy.dtype)
            return halo_attention_qkv_fused(
                z.astype(policy.dtype), w_qkv, p[name]["rel_h"],
                p[name]["rel_w"], block=block, halo=halo, levels=levels)
        out = z
        for _ in range(levels):
            out = haar_dwt(out)
        out = tblock_apply(p[name], out, block=block, halo=halo,
                           policy=policy)
        for _ in range(levels):
            out = haar_iwt(out)
        return out

    return branch


def cftm_apply(p: Params, x: jnp.ndarray, *, policy: ComputePolicy,
               block: int = 8, halo: int = 1) -> jnp.ndarray:
    """Coarse-to-Fine Transformer Module (reference CFTM.forward :132-164,
    norm=True path)."""
    if policy.use_pallas and policy.dtype == jnp.bfloat16:
        if (policy.packed_body
                and _packed_body_ok(x.shape[0], x.shape[1], x.shape[2],
                                    x.shape[-1] // 4, block, halo)):
            return _cftm_apply_fused_packed(p, x, policy=policy,
                                            block=block, halo=halo)
        return _cftm_apply_fused(p, x, policy=policy, block=block,
                                 halo=halo)
    branch = make_branch_fn(p, policy, block=block, halo=halo)
    xn = instance_norm(x)
    x1, x2, x3, x4 = jnp.split(xn, 4, axis=-1)

    x1 = branch("attn1", x1, 0) + x1

    x2 = (x2 + x1) * 0.5
    x2 = branch("attn2", x2, 1) + x2

    x3 = (x3 + x2) * 0.5
    x3 = branch("attn3", x3, 2) + x3

    x4 = (x4 + x3) * 0.5
    x4 = branch("attn4", x4, 2) + x4

    xc = jnp.concatenate([x1, x2, x3, x4], axis=-1)
    ff = conv2d(xc, p["ff"]["w"], p["ff"]["b"], padding="zeros",
                dtype=policy.dtype, precision=policy.precision)
    return ff + x


def _packed_body_ok(bsz: int, h: int, w: int, cb: int, block: int,
                    halo: int) -> bool:
    """True when every CFTM branch has a Pallas kernel at this shape, so
    the whole-CFTM packed flow can engage (see ComputePolicy.packed_body):
    L=0 full-pack g=8, L=1 full-pack g=4, L=2 packed-front where its VMEM
    gate admits the width, otherwise the width-tolerant banded/tiled
    kernels on a per-branch unpack (the ×2/×3 body widths W=192/128)."""
    from m2trans_tpu.ops.pallas.halo_attn import (
        _banded_limit,
        _banded_vmem_bytes,
    )
    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        pick_pack_g,
        pick_packed_front,
    )

    from m2trans_tpu.ops.pallas.halo_attn_packed import pick_packed_tiled

    if cb * 8 != 128 or bsz % 8 or h % (block * 4) or w % (block * 4):
        return False

    def l_ok(levels, want_g):
        if pick_pack_g(bsz, w, cb, levels, block, halo) == want_g:
            return True
        gs = pick_packed_tiled(bsz, w, cb, levels, block, halo)
        return gs is not None and gs[0] == want_g

    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        pick_packed_front_tiled,
    )

    def l1_ok():
        # L=1 prefers the packed-attention front kernel (no restacks);
        # the g=4 restacked full-pack/tiled cascade is the fallback
        if pick_packed_front(bsz, w, cb, 1, block, halo) is not None:
            return True
        if pick_packed_front_tiled(bsz, w, cb, 1, block,
                                   halo) is not None:
            return True
        return l_ok(1, 4)

    if not (l_ok(0, 8) and l1_ok()):
        return False
    if pick_packed_front(bsz, w, cb, 2, block, halo) is not None:
        return True
    # L=2 fallback: branches 3/4 run unpacked through the fused dispatch;
    # require a non-XLA kernel (banded fits, or the tiled cascade is
    # calibrated for L=2 and a single-slab band fits)
    from m2trans_tpu.ops.pallas.device import gate_profile

    c = cb * 16
    if _banded_vmem_bytes(w, cb, c, block, halo, 2) <= _banded_limit(2):
        return True
    blk_full = block * 4
    return (2 in gate_profile().get("tiled_levels", ())
            and w > blk_full
            and _banded_vmem_bytes(blk_full, cb, c, block, halo,
                                   2) <= _banded_limit(2))


# ff-conv formulation inside the packed body flow (perf experiment knob):
# "unpack"  per-CFTM unpack -> per-image conv -> repack (r3 default);
# "pair"    pair-major lane permutation -> block-diagonal 2-image conv
#           (K=128 full MXU depth) -> inverse permutation (r5): per-CFTM
#           MXU tile-unit count 4896 vs unpack's 9792 — the unpack/pack
#           selection einsums contract K=512 to produce 64 lanes/slot
#           (8x K-redundant, 2304 units each) and the per-image conv
#           contracts K=64 (half the MXU depth idle, 5184 units); the
#           pair form pays 2x conv FLOPs to run every contraction at
#           full depth;
# "scatter" slot-scattered packed 512-lane conv (exact, 8x FLOPs —
#           measured slower, +4.3 ms/step r5 compare_fori);
# "fused"   one Pallas kernel: packed band in -> per-image 3x3 conv via
#           f32 staging -> packed band out + residual (r4; +0.69 ms/step
#           vs unpack, r5 compare_fori);
# "skip"    ABLATION ONLY (wrong values): bypass ff entirely to expose
#           the unpack+conv+pack cost in scripts/ab_budget.py.
_FF_MODE = "unpack"


@functools.lru_cache(maxsize=None)
def _pair_perm_np(g: int = 8, nb: int = 4, cb: int = 16):
    """(G*nb*cb, G*nb*cb) 0/1 permutation: branch-major packed lane
    l = k*(g*cb) + s*cb + c  ->  pair-major lane
    m = (s//2)*(2*nb*cb) + (s%2)*(nb*cb) + k*cb + c, so each 128-lane
    block holds ONE IMAGE PAIR's full channel set and the ff conv
    becomes a block-diagonal K=128 contraction that never crosses
    blocks. Returns (P, P_inv) as float32 numpy."""
    import numpy as np

    n = g * nb * cb
    c_im = nb * cb
    p = np.zeros((n, n), np.float32)
    for k in range(nb):
        for s in range(g):
            for c in range(cb):
                l = k * (g * cb) + s * cb + c
                m = (s // 2) * (2 * c_im) + (s % 2) * c_im + k * cb + c
                p[l, m] = 1.0
    return p, p.T


def _ff_pair_conv(oc: jnp.ndarray, xp: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray, *, g: int,
                  precision=None) -> jnp.ndarray:
    """Packed ff conv via pair-major blocks (_FF_MODE="pair"; also the
    differentiation path of the fused "pairk" kernel mode).

    oc/xp: (bp, H, W, g*C) branch-major packed; w: (3, 3, C, C) HWIO;
    b: (C,). Exactly pack(conv2d(unpack(oc), w, b, zeros)) + xp up to
    f32 tap-summation order (the permutation einsums accumulate one
    product per output lane — exact for bf16; the conv rounds to bf16 at
    the same point as the unpack-mode conv2d)."""
    bp, hh, ww, gc = oc.shape
    c = gc // g
    nb, cb = 4, c // 4
    npair = g // 2
    p_np, pinv_np = _pair_perm_np(g, nb, cb)
    p_m = jnp.asarray(p_np, oc.dtype)
    pinv_m = jnp.asarray(pinv_np, oc.dtype)
    kw = dict(preferred_element_type=jnp.float32, precision=precision)

    # branch-major -> pair-major (one 512x512 permutation einsum)
    xpair = jnp.einsum("bhwl,lm->bhwm", oc, p_m, **kw).astype(oc.dtype)

    # block-diagonal 2-image conv: each 128-lane block = one image
    # pair's channels; W2 = kron(I2, W_tap) per tap, K=128 full depth
    w2 = jax.vmap(jax.vmap(
        lambda wt: jnp.kron(jnp.eye(2, dtype=wt.dtype), wt)))(
        w.astype(oc.dtype))                      # (3, 3, 2C, 2C)
    xpad = jnp.pad(xpair, ((0, 0), (1, 1), (1, 1), (0, 0)))
    xpad = xpad.reshape(bp, hh + 2, ww + 2, npair, 2 * c)
    acc = jnp.zeros((bp, hh, ww, npair, 2 * c), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            win = xpad[:, dr:dr + hh, dc:dc + ww]
            acc = acc + jnp.einsum("bhwjl,lm->bhwjm", win, w2[dr, dc],
                                   **kw)
    # round-to-dtype BEFORE the bias add, exactly like conv2d's
    # bf16(conv) + bf16(bias) sequence in the unpack path
    b2 = jnp.tile(b, 2).astype(oc.dtype)         # (2C,)
    y = (acc.astype(oc.dtype) + b2).reshape(bp, hh, ww, gc)

    # pair-major -> branch-major, then the module residual
    yb = jnp.einsum("bhwm,ml->bhwl", y, pinv_m, **kw).astype(oc.dtype)
    return yb + xp


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _ff_pairk(oc, xp, w, b, g, precision, interpret):
    """Fused pair-major ff kernel with the exact XLA pair composition as
    its differentiation path (same math, parity-tested; the kernel has
    no auto-VJP)."""
    from m2trans_tpu.ops.pallas.ff_pair import ff_pair_conv_fused

    return ff_pair_conv_fused(oc, xp, w, b, g=g, interpret=interpret,
                              precision=precision)


def _ff_pairk_fwd(oc, xp, w, b, g, precision, interpret):
    return _ff_pairk(oc, xp, w, b, g, precision, interpret), \
        (oc, xp, w, b)


def _ff_pairk_bwd(g, precision, interpret, res, ct):
    oc, xp, w, b = res
    _, vjp = jax.vjp(
        lambda o, x, ww, bb: _ff_pair_conv(o, x, ww, bb, g=g,
                                           precision=precision),
        oc, xp, w, b)
    return vjp(ct)


_ff_pairk.defvjp(_ff_pairk_fwd, _ff_pairk_bwd)


def _pack_ff_weight(w: jnp.ndarray, b: jnp.ndarray, g: int = 8,
                    nb: int = 4):
    """Slot-scattered packed feed-forward conv weight.

    Lifts the per-image (3, 3, C, C) conv to the branch-major packed
    layout (3, 3, nb*g*cb, nb*g*cb): Wp[.., p_in, p_out] =
    W[.., d(p_in), d(p_out)] * (slot(p_in) == slot(p_out)) with
    p = k*(g*cb) + s*cb + c. 8x the per-image FLOPs, but the dense
    512-lane conv runs at full MXU utilization where the 64-channel
    per-image conv measured ~6 TFLOP/s — net ~3x faster AND it keeps
    the body packed across CFTMs (no per-CFTM unpack/pack)."""
    kh, kw_, cin, cout = w.shape
    cb = cin // nb
    eye = jnp.eye(g, dtype=w.dtype)
    w6 = w.reshape(kh, kw_, nb, cb, nb, cb)
    wp = jnp.einsum("hwabcd,ij->hwaibcjd", w6, eye)
    wp = wp.reshape(kh, kw_, nb * g * cb, nb * g * cb)
    bp = jnp.broadcast_to(b.reshape(nb, 1, cb),
                          (nb, g, cb)).reshape(nb * g * cb)
    return wp, bp


def _packed_in_stats(xp: jnp.ndarray):
    """Instance-norm statistics on a branch-major packed body tensor.

    pack_body is a pure relayout of (B, H, W, C) onto (B/g, H, W, g*C)
    lanes with H, W untouched, so the per-lane mean/var over (H, W) IS
    the per-image per-channel statistic, already in the lane order the
    packed branch kernels consume — no transposes at all."""
    xf = xp.astype(jnp.float32)
    m = jnp.mean(xf, axis=(1, 2))
    v = jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(m)
    inv = lax.rsqrt(v + 1e-5)
    return inv, -m * inv


def _cftm_apply_fused_packed(p: Params, x: jnp.ndarray, *,
                             policy: ComputePolicy, block: int,
                             halo: int) -> jnp.ndarray:
    """bf16+Pallas CFTM with the body held PACKED through the cascade
    (per-CFTM wrapper around _cftm_apply_packed_core for callers holding
    unpacked tensors; the model body loop packs ONCE and stays packed —
    see m2trans_apply). Matches _cftm_apply_fused output to
    f32-accumulation noise (reference CFTM.forward :132-164)."""
    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        pack_body,
        unpack_body,
    )

    g = 8
    xp = pack_body(x.astype(policy.dtype), g)  # (bp, H, W, 512)
    inv_p, t_p = _packed_in_stats(xp)
    yp = _cftm_apply_packed_core(p, xp, inv_p, t_p, policy=policy,
                                 block=block, halo=halo)
    return unpack_body(yp, g)


def _cftm_apply_packed_core(p: Params, xp: jnp.ndarray,
                            inv_p: jnp.ndarray, t_p: jnp.ndarray, *,
                            policy: ComputePolicy, block: int,
                            halo: int) -> jnp.ndarray:
    """Fully-packed CFTM: packed input, packed IN statistics, packed
    branch kernels, slot-scattered packed ff conv, packed residual —
    the only XLA between branch kernels is the elementwise cascade
    folds. pack_body lays the (B, H, W, 4*cb) tensor out branch-major
    as (B/8, H, W, 32*cb) — branch k's 8-image slot-major pack is the
    contiguous 128-lane block at offset k*128, so each branch kernel
    consumes/produces its native packed layout with no per-branch
    pack/unpack and no XLA relayout staging."""
    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        packed_cascade_core,
        packed_front_core,
        pick_packed_front,
    )

    bp = xp.shape[0]
    g = 8
    bsz = bp * g
    cb = xp.shape[-1] // 32
    x = xp  # frame dims below come from the packed tensor

    def st_packed(k):
        # branch-k packed affine: the contiguous 128-lane block of the
        # packed statistics (see _packed_in_stats)
        sk = inv_p[:, k * g * cb:(k + 1) * g * cb]
        tk = t_p[:, k * g * cb:(k + 1) * g * cb]
        return sk, tk

    def fold(xk, prev, sk, tk):
        # cascade average folded into the affine (see _cftm_apply_fused)
        if prev is None:
            return xk, sk, tk
        sk, tk = sk * 0.5, tk * 0.5
        xk = (xk.astype(jnp.float32)
              + prev.astype(jnp.float32)
              * (0.5 / sk)[:, None, None, :]).astype(policy.dtype)
        return xk, sk, tk

    def wq(name, levels):
        c = cb * 4 ** levels
        return p[name]["qkv_w"].reshape(c, 3 * c).astype(policy.dtype)

    def block_k(k):
        return xp[..., k * 128:(k + 1) * 128]

    from m2trans_tpu.ops.pallas.halo_attn import _is_tpu_backend

    kw = dict(cb=cb, block=block, halo=halo, r=0.0,
              interpret=not _is_tpu_backend(),
              precision=policy.precision)

    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        packed_cascade_tiled,
        pick_pack_g,
        pick_packed_tiled,
    )

    def run_packed(xk, sk, tk, name, levels, want_g):
        # full-width where its VMEM budget admits; column slabs of the
        # verified width otherwise (robust AND as fast — the wide
        # full-width kernels are scoped-VMEM-marginal)
        args = (xk, None, sk, tk, wq(name, levels),
                p[name]["rel_h"], p[name]["rel_w"])
        if pick_pack_g(bsz, x.shape[2], cb, levels, block,
                       halo) == want_g:
            return packed_cascade_core(*args, levels=levels, g=want_g,
                                       **kw)
        gs = pick_packed_tiled(bsz, x.shape[2], cb, levels, block, halo)
        return packed_cascade_tiled(*args, levels=levels, g=gs[0],
                                    slab=gs[1], **kw)

    # branch 1: L=0, full-pack g=8
    s1, t1 = st_packed(0)
    o1 = run_packed(block_k(0), s1, t1, "attn1", 0, 8)

    # branch 2: L=1 — packed-attention front kernel on the (bp, .., 128)
    # block directly (two gc=256 subgroup iterations inside the kernel;
    # kills the XLA lane-half restacks, ~2 ms/step at the flagship —
    # scripts/dissect_glue.py). Fallback: restack halves onto the batch
    # axis and run the g=4 full-pack cascade.
    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        packed_front_tiled,
        pick_packed_front_tiled,
    )

    s2, t2 = st_packed(1)
    x2, s2, t2 = fold(block_k(1), o1, s2, t2)
    pf1 = pick_packed_front(bsz, x.shape[2], cb, 1, block, halo)
    pft1 = (None if pf1 is not None
            else pick_packed_front_tiled(bsz, x.shape[2], cb, 1, block,
                                         halo))
    if pf1 is not None:
        o2 = packed_front_core(x2, None, s2, t2, wq("attn2", 1),
                               p["attn2"]["rel_h"], p["attn2"]["rel_w"],
                               levels=1, g=8, sub=pf1[1], **kw)
    elif pft1 is not None:
        o2 = packed_front_tiled(x2, None, s2, t2, wq("attn2", 1),
                                p["attn2"]["rel_h"], p["attn2"]["rel_w"],
                                levels=1, g=pft1[0], sub=pft1[1],
                                slab=pft1[2], **kw)
    else:
        x2h = jnp.concatenate([x2[..., :64], x2[..., 64:]], axis=0)
        s2h = jnp.concatenate([s2[:, :64], s2[:, 64:]], axis=0)
        t2h = jnp.concatenate([t2[:, :64], t2[:, 64:]], axis=0)
        o2h = run_packed(x2h, s2h, t2h, "attn2", 1, 4)
        o2 = jnp.concatenate([o2h[:bp], o2h[bp:]], axis=-1)

    # branches 3, 4: L=2 — packed-front g=8 where its VMEM gate admits
    # the width; otherwise per-branch unpack -> the width-tolerant
    # banded/tiled fused dispatch -> repack (×2/×3 body widths)
    pf = pick_packed_front(bsz, x.shape[2], cb, 2, block, halo)

    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        packed_front_tiled,
        pick_packed_front_tiled,
    )

    pft = (None if pf is not None
           else pick_packed_front_tiled(bsz, x.shape[2], cb, 2, block,
                                        halo))

    def branch_l2(name, xk, sk, tk):
        if pf is not None:
            return packed_front_core(xk, None, sk, tk, wq(name, 2),
                                     p[name]["rel_h"], p[name]["rel_w"],
                                     levels=2, g=8, sub=pf[1], **kw)
        if pft is not None:
            # column-slab packed-front: the full-width kernel's VMEM gate
            # rejects the x2/x3 body widths; slabs of the verified width
            # keep the packed full-res stages (the L=2 cost is dominated
            # by 16-lane full-res work in the unpacked fallbacks)
            return packed_front_tiled(xk, None, sk, tk, wq(name, 2),
                                      p[name]["rel_h"], p[name]["rel_w"],
                                      levels=2, g=pft[0], sub=pft[1],
                                      slab=pft[2], **kw)
        from m2trans_tpu.ops.pallas.halo_attn import cftm_branch_fused
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            pack_batch,
            unpack_batch,
        )

        ou = cftm_branch_fused(
            unpack_batch(xk, g), wq(name, 2), p[name]["rel_h"],
            p[name]["rel_w"], sk.reshape(bsz, cb), tk.reshape(bsz, cb),
            levels=2, block=block, halo=halo, interpret=kw["interpret"],
            precision=policy.precision)
        return pack_batch(ou, g)

    s3, t3 = st_packed(2)
    x3, s3, t3 = fold(block_k(2), o2, s3, t3)
    o3 = branch_l2("attn3", x3, s3, t3)
    s4, t4 = st_packed(3)
    x4, s4, t4 = fold(block_k(3), o3, s4, t4)
    o4 = branch_l2("attn4", x4, s4, t4)

    oc = jnp.concatenate([o1, o2, o3, o4], axis=-1)
    if _FF_MODE == "skip":  # ablation: expose the ff-block cost
        return oc + xp
    if _FF_MODE == "pair":
        return _ff_pair_conv(oc, xp, p["ff"]["w"], p["ff"]["b"], g=g,
                             precision=policy.precision)
    if _FF_MODE == "pairk":
        from m2trans_tpu.ops.pallas.device import gate_profile
        from m2trans_tpu.ops.pallas.ff_pair import ff_pair_vmem_bytes

        lim = gate_profile().get("ff_pair_limit", 0.0)
        if ff_pair_vmem_bytes(x.shape[2], oc.shape[-1]) <= lim:
            return _ff_pairk(oc, xp,
                             p["ff"]["w"].astype(policy.dtype),
                             p["ff"]["b"].astype(jnp.float32), g,
                             policy.precision, kw["interpret"])
        return _ff_pair_conv(oc, xp, p["ff"]["w"], p["ff"]["b"], g=g,
                             precision=policy.precision)
    if _FF_MODE == "fused":
        from m2trans_tpu.ops.pallas.ff_packed import packed_ff_conv

        return packed_ff_conv(
            oc, xp, p["ff"]["w"].astype(policy.dtype),
            p["ff"]["b"].astype(jnp.float32), g=g,
            interpret=kw["interpret"], precision=policy.precision)
    if _FF_MODE == "scatter":
        w_ff, b_ff = _pack_ff_weight(p["ff"]["w"].astype(policy.dtype),
                                     p["ff"]["b"].astype(jnp.float32), g)
        # 9 shifted matmuls instead of conv_general_dilated: the batch-1
        # 512-channel conv lowers pathologically on v5e (~1.1 ms/CFTM
        # more than the per-image conv; the explicit dots tile cleanly
        # onto the MXU)
        bpx, hh, ww, gc = oc.shape
        ocp = jnp.pad(oc, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.broadcast_to(b_ff, (bpx, hh, ww, gc)).astype(jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = ocp[:, dy:dy + hh, dx:dx + ww, :].reshape(-1, gc)
                acc = acc + jnp.dot(
                    sl, w_ff[dy, dx], preferred_element_type=jnp.float32,
                    precision=policy.precision).reshape(bpx, hh, ww, gc)
        return acc.astype(policy.dtype) + xp
    from m2trans_tpu.ops.pallas.halo_attn_packed import (
        pack_body,
        unpack_body,
    )

    xc = unpack_body(oc, g)
    ff = conv2d(xc, p["ff"]["w"], p["ff"]["b"], padding="zeros",
                dtype=policy.dtype, precision=policy.precision)
    return pack_body(ff, g) + xp


def _cftm_apply_fused(p: Params, x: jnp.ndarray, *, policy: ComputePolicy,
                      block: int, halo: int) -> jnp.ndarray:
    """bf16+Pallas CFTM: instance-norm application, cascade averages, zero
    halo padding, attention, and branch residuals all run inside the fused
    branch kernels (ops/pallas/halo_attn.cftm_branch_fused); XLA keeps only
    the IN statistics reduce, the concat, and the feed-forward conv +
    module residual."""
    from m2trans_tpu.ops.pallas.halo_attn import cftm_branch_fused

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2))
    var = jnp.mean(jnp.square(xf), axis=(1, 2)) - jnp.square(mean)
    inv = lax.rsqrt(var + 1e-5)
    tfull = -mean * inv
    cb = x.shape[-1] // 4

    def branch(name, xk, prev, levels, k):
        c = cb * 4 ** levels
        w_qkv = p[name]["qkv_w"].reshape(c, 3 * c).astype(policy.dtype)
        sk = inv[:, k * cb:(k + 1) * cb]
        tk = tfull[:, k * cb:(k + 1) * cb]
        if prev is not None:
            # fold the cascade average into the affine instead of a second
            # banded kernel input: z = (xn_k + prev)/2 = (x + prev/inv) *
            # (inv/2) + t/2 — the x_add path costs ~3.4 MB of VMEM views in
            # the L=2 backward kernel, pushing it over the 16 MB limit
            sk, tk = sk * 0.5, tk * 0.5
            xk = (xk.astype(jnp.float32)
                  + prev.astype(jnp.float32)
                  * (0.5 / sk)[:, None, None, :])
        return cftm_branch_fused(
            xk.astype(policy.dtype), w_qkv, p[name]["rel_h"],
            p[name]["rel_w"], sk, tk, x_add=None, r=0.0, block=block,
            halo=halo, levels=levels)

    x1, x2, x3, x4 = jnp.split(x, 4, axis=-1)
    o1 = branch("attn1", x1, None, 0, 0)
    o2 = branch("attn2", x2, o1, 1, 1)
    o3 = branch("attn3", x3, o2, 2, 2)
    o4 = branch("attn4", x4, o3, 2, 3)

    xc = jnp.concatenate([o1, o2, o3, o4], axis=-1)
    ff = conv2d(xc, p["ff"]["w"], p["ff"]["b"], padding="zeros",
                dtype=policy.dtype, precision=policy.precision)
    return ff + x.astype(policy.dtype)


def _tail_band_fits(h: int, w: int, scale: int, nf: int,
                    limit: Optional[float] = None) -> bool:
    """VMEM estimate for the fused band tail, modeling the ACTIVE
    _TAP_PACKED formulation (ADVICE r4: the gate must bound the kernel it
    dispatches — the r4 "roll" flip left the gate estimating the per-tap
    dataflow while the roll kernel allocated 16.45M and OOM'd the 16M
    v5e ceiling). Terms scale linearly with W; the reflect-edge columns
    (lc/rc, loaded whole) scale linearly with H (ADVICE r2: a tall-narrow
    frame must not pass on W alone).

    Calibration (v5e, REAL scoped VMEM by binary-searched
    compiler_options probe, scripts/calibrate_vmem.py, r5): at
    (96, W, 64, x4) — per-tap real 8.21M @W=96 / 16.88M @W=192;
    slice-add 4.82M / 14.99M; roll 17.25M / never-compiles. Estimates
    below at those anchors: per-tap 12.2M / 22.5M; slice-add 12.6M;
    roll 23.4M — consistently 3-6M conservative, and roll's NINE live
    rotated f32 copies are the term the r4 estimator missed
    (BENCH_r04 rc=1)."""
    if limit is None:
        from m2trans_tpu.ops.pallas.device import gate_profile

        limit = gate_profile()["tail_limit"]
    from m2trans_tpu.ops.pallas.tail_band import _BAND_F32, _TAP_PACKED

    P = scale * scale
    cp = P * nf
    n9 = 9 * P * 3
    band_f32 = _BAND_F32 and not _TAP_PACKED
    bb = 4 if band_f32 else 2
    band = 10 * (w + 2) * cp * bb  # phase band (ph; mid freed into it)
    stage = 10 * w * cp * 4        # f32 stage transient (pre-cast h)
    edges = 2 * (h + 2 * 8) * cp * 4 + 2 * (w + 2) * cp * 4  # lc/rc+top/bot
    if _TAP_PACKED:
        # tap-packed dot: f32 (rows, w+2, 9*P*3) tap tensor u, the f32
        # accumulator(s) — Mosaic keeps ALL NINE rotated copies live in
        # roll mode (measured: roll 17.25M real @W=96 vs slice-add's
        # 4.82M; the rotate-reduce is the only difference) — and the
        # packed (cp, 9*P*3) weight operand
        tap = 10 * (w + 2) * n9 * 4
        acc = (9 if _TAP_PACKED == "roll" else 1) * 8 * (w + 2) * n9 * 4
        kw_ = cp * n9 * 2
        body = band + stage + tap + acc + kw_
    else:
        win = 8 * w * cp * 2       # bf16 conv window view
        body = band + stage + win
    return body + edges + 1e6 < limit


def _conv_ps_gelu(x, w, b, r, kw):
    """1x1 conv -> PixelShuffle(r) -> GELU, computed as conv (with output
    channels permuted into depth-to-space order) -> GELU -> fast shuffle.
    Bit-identical to the reference order (GELU is elementwise, so it
    commutes with the shuffle permutation; the weight permutation reorders
    output channels without touching any contraction)."""
    perm = ps_weight_perm(w.shape[-1] // (r * r), r)
    y = conv2d(x, w[..., perm], b[perm], padding="valid", **kw)
    return pixel_shuffle_fast(gelu_exact(y), r)


def tail_apply(p: Params, x: jnp.ndarray, *, scale: int,
               policy: ComputePolicy, rgb_range: float = 1.0) -> jnp.ndarray:
    """Pixel-shuffle upsampling tail (reference :40-56). x4 = two x2 stages
    of [1x1 conv -> PixelShuffle(2) -> GELU], then 3x3 reflect conv to RGB;
    x2/x3 = one [1x1 conv -> PixelShuffle(s) -> GELU] stage.

    bf16 mode runs the phase-plane formulation: with use_pallas, the fused
    band kernel (ops/pallas/tail_band.py — no HBM phase tensor); otherwise
    the XLA composition (ops/tail_phase.py). f32 parity mode keeps the
    conv->shuffle composition (bit-stable against the golden files)."""
    if policy.dtype == jnp.bfloat16:
        if policy.use_pallas and _tail_band_fits(x.shape[1], x.shape[2],
                                                 scale, x.shape[-1]):
            from m2trans_tpu.ops.pallas.tail_band import tail_band_apply

            return tail_band_apply(p, x, scale=scale, rgb_range=rgb_range,
                                   dtype=policy.dtype,
                                   precision=policy.precision)
        from m2trans_tpu.ops.tail_phase import tail_phase_apply

        return tail_phase_apply(p, x, scale=scale, dtype=policy.dtype,
                                precision=policy.precision)
    kw = dict(dtype=policy.dtype, precision=policy.precision)
    if scale == 4:
        x = _conv_ps_gelu(x, p["c0"]["w"], p["c0"]["b"], 2, kw)
        x = _conv_ps_gelu(x, p["c1"]["w"], p["c1"]["b"], 2, kw)
        return conv2d(x, p["c2"]["w"], padding="reflect", **kw)
    x = _conv_ps_gelu(x, p["c0"]["w"], p["c0"]["b"], scale, kw)
    return conv2d(x, p["c1"]["w"], padding="reflect", **kw)


def m2trans_apply(params: Params, x: jnp.ndarray, cfg: Config,
                  policy: Optional[ComputePolicy] = None) -> jnp.ndarray:
    """Full model forward: (B, H, W, colors) in [0, rgb_range] ->
    (B, H*scale, W*scale, 3). Mirrors reference M2Trans.forward (:58-76)."""
    if policy is None:
        policy = policy_from_config(cfg)
    h, w = x.shape[1], x.shape[2]
    x = pad_to_multiple(x, cfg.pad_multiple).astype(policy.dtype)

    res = conv2d(x, params["head"]["w"], params["head"]["b"],
                 padding="reflect", dtype=policy.dtype,
                 precision=policy.precision)
    if (policy.use_pallas and policy.dtype == jnp.bfloat16
            and policy.packed_body
            and _packed_body_ok(res.shape[0], res.shape[1], res.shape[2],
                                res.shape[-1] // 4, cfg.block_size,
                                cfg.halo_size)):
        # whole-BODY packed flow: pack once after the head, stay packed
        # through all CFTMs (packed IN stats, packed branch kernels,
        # slot-scattered packed ff conv), unpack once before the tail
        from m2trans_tpu.ops.pallas.halo_attn_packed import (
            pack_body,
            unpack_body,
        )

        yp = pack_body(res, 8)
        for blk in params["body"]:
            inv_p, t_p = _packed_in_stats(yp)
            yp = _cftm_apply_packed_core(blk, yp, inv_p, t_p,
                                         policy=policy,
                                         block=cfg.block_size,
                                         halo=cfg.halo_size)
        y = res + unpack_body(yp, 8)
    else:
        y = res
        for blk in params["body"]:
            y = cftm_apply(blk, y, policy=policy, block=cfg.block_size,
                           halo=cfg.halo_size)
        y = res + y
    y = tail_apply(params["tail"], y, scale=cfg.scale, policy=policy,
                   rgb_range=cfg.rgb_range)
    # clamp (idempotent when the fused tail already clamped); keep bf16
    # outputs in bf16 mode — the f32 output conversion alone cost ~2 ms
    # per step in profiling
    out_dt = jnp.float32 if policy.dtype == jnp.float32 else policy.dtype
    y = jnp.clip(y.astype(out_dt), 0.0, cfg.rgb_range)
    return y[:, : h * cfg.scale, : w * cfg.scale, :]


# Largest batch whose (B, H, W, n_feats) body intermediates stay scoped-
# VMEM-resident at the flagship 96x96 shape. Beyond it XLA spills every
# fusion boundary to HBM through chunked staging copies and the step goes
# copy-bound (measured v5e, batch 32: 82 ms/step of copy-start vs 4 ms at
# batch 8 — the round-1 "batch scaling regression", NOTES_ROUND2.md).
MICRO_BATCH = 8


def m2trans_apply_microbatched(
        params: Params, x: jnp.ndarray, cfg: Config,
        policy: Optional[ComputePolicy] = None,
        micro_batch: int = MICRO_BATCH) -> jnp.ndarray:
    """m2trans_apply over micro-batches of ``micro_batch`` via lax.map:
    large serving batches keep batch-8's per-image step time instead of
    regressing. Measured v5e (r3, packed kernels): batch 64 = 142.9 MP/s
    with lax.map vs 71.5 unrolled+concat and 85.4 unrolled+DUS — the
    r2-era unroll advantage inverted once the packed kernels landed (the
    map body reuses one compiled chunk and skips the chunk-boundary
    output staging; scripts/bench_batch.py)."""
    b = x.shape[0]
    if b <= micro_batch or b % micro_batch:
        return m2trans_apply(params, x, cfg, policy)
    n = b // micro_batch
    xs = x.reshape((n, micro_batch) + x.shape[1:])
    ys = jax.lax.map(lambda xc: m2trans_apply(params, xc, cfg, policy), xs)
    return ys.reshape((b,) + ys.shape[2:])
