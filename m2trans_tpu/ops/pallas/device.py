"""Device-keyed kernel-gate calibration (VERDICT r2 item 7).

Every Pallas dispatch gate in this package (banded-kernel VMEM limits,
batch-group budgets, the fused-tail fit test) consults this table instead
of raw constants. The numbers are empirical: estimated-vs-actual VMEM at
observed compile failures and measured per-level wins on real hardware
(see ops/pallas/halo_attn.py gate comments for the v5e evidence).

Keying off ``jax.devices()[0].device_kind`` means a TPU generation this
table has never been calibrated on gets SHRUNK budgets — a misestimate
then degrades to the (correct, slower) XLA fallback instead of a VMEM OOM
at compile time. Non-TPU backends (CPU tests run the kernels in interpret
mode, where VMEM is not real) use the v5e table so gate decisions are
deterministic across hosts.
"""

from __future__ import annotations

import functools

import jax

_MIB = 1024 * 1024

# TPU v5e (device_kind "TPU v5 lite", 16 MiB VMEM/core): the round-1/2
# calibration hardware. banded_limits: per-DWT-level overrides of the
# default banded gate; group_budget: per-level batch-group VMEM budgets.
_V5E = {
    "banded_limit_default": 12 * _MIB,
    "banded_limits": {1: 14 * _MIB},
    "group_budget": {0: 25e6, 1: 7e6, 2: 12e6},
    # r5 recalibration against REAL scoped VMEM (binary-searched
    # compiler_options probe, scripts/calibrate_vmem.py): the estimator
    # (_tail_band_fits, now modeling the ACTIVE _TAP_PACKED dataflow)
    # runs 3-6M conservative — per-tap est 12.2M/real 8.21M @W=96,
    # est 22.5M/real 16.88M @W=192. 14e6 admits the flagship (8.21M
    # real, ~8M under the 16M ceiling) and rejects everything whose
    # real footprint was measured marginal (W=192 per-tap 16.88M,
    # slice-add 14.99M) or broken (roll 17.25M @W=96) — an estimator
    # drift now degrades to the XLA phase tail, never a compile crash
    # (the r4 failure mode, BENCH_r04 rc=1).
    "tail_limit": 14e6,
    # Lane-packed cascade kernel (halo_attn_packed.py) VMEM budgets per
    # DWT level, v5e-measured (the estimator runs ~2x conservative):
    # L=0 g=8: W=96 (est 17.8M) 0.146 vs banded 0.482 ms/call; W=192
    # (est 35.2M) compiles and runs 0.600 vs 1.863 -> budget 36e6.
    # L=1 g=4: W=96 (est 13.5M) 0.068 vs 0.175; W=192 (est 26.5M) 0.275
    # vs banded 0.670 -> budget 27e6 (g=8, est 28.6M, measured 12.9 ms —
    # the g*C<=256 rule also excludes it).
    # L=2 packing: W=96 g=2 measured slower than banded (13.4 vs 4.4 ms
    # chain) and W=192 g=2 OOMs scoped VMEM (19.05M > 16M) -> no budget.
    # r3-final recalibration: the W=192 full-width kernels are scoped-
    # VMEM-MARGINAL (L=1 g=4 est 26.5M measured 16.19M vs the 16M
    # ceiling, tipping over program-dependently), and column slabs of
    # the verified W<=128 shapes are robust AND as fast or faster; the
    # budgets now admit only the comfortably-fitting widths and
    # pick_packed_tiled slabs the rest.
    "packed_budget": {0: 20e6, 1: 20e6},
    # Packed-FRONT cascade (packed full-res affine/DWT/IWT, per-subgroup
    # native-C attention; halo_attn_packed.packed_front_cascade_impl) —
    # the L=2 answer where full packing thrashes (G*C=512 lanes). v5e
    # device self-times at W=96 g=8 sub=2 (est 17.9M): kernel 0.070 +
    # pack/pad/unpack 0.033 vs banded 0.114 ms/call; sub=4 OOMs. W=128
    # (est ~21.6M) untested -> budget 19e6 admits exactly the measured
    # shape, the tiled kernel keeps W>=128.
    # r3-final: the full-width W=96 kernel (est 17.9M) measured 17.48M
    # scoped — ACCURATE estimator, and marginal against the 16M ceiling
    # (OOM'd inside the batch-64 lax.map program). 14e6 forces column
    # slabs (slab=64 est 12.2M) everywhere, robust in any program.
    # r4: L=1 packed-attention front mode (sub=4, gc=256 — the measured-
    # good restacked shape run inside the kernel; kills the ~2 ms/step of
    # XLA lane-half restacks, scripts/dissect_glue.py). W=96 est 13.4M.
    "packed_front_budget": {1: 14e6, 2: 14e6},
    # DWT levels where the column-slab tiled cascade replaces the XLA
    # fallback beyond the banded gate. v5e-measured per call (scripts/
    # dissect_tiled.py): L=2 W=192 B=8 0.577 vs ~6.5 XLA, W=128 0.335 vs
    # ~2.2; L=1 W=256 B=1 0.218 vs ~1.2, W=512 B=1 0.793 vs ~7.5;
    # L=0 W=512 B=1 2.243 vs ~4.3.
    "tiled_levels": (0, 1, 2),
    # BACKWARD banded gate: max banded-FWD estimate for which the full-
    # width banded backward kernel is admitted. Calibration anchor: the
    # L=2 W=96 banded backward (fwd-est 11.95M) uses 17.24M scoped VMEM —
    # within ~1 MB of the 16M ceiling, compiling or OOMing depending on
    # the surrounding program — so the limit sits below it and that shape
    # takes the column-slab tiled backward instead. L=0/L=1 at the
    # flagship widths (est 6.1/6.7M) have never been marginal.
    "bwd_banded_limit_default": 9 * _MIB,
    # Column-slab tiled BACKWARD budgets per DWT level, checked against
    # the tiled-bwd estimate (banded estimate + two extra x views +
    # extended dze out block). The estimate's real/est ratio is
    # level-dependent (v5e observed): L=2 ~1.0 (slab=96 predicts 17.49M
    # vs 17.24M real), L=1 ~1.45 (slab=144 est ~14M, real 20.23M OOM at
    # the x2 width). Budgets keep real usage ~2 MB under the 16M
    # scoped-VMEM ceiling in any surrounding program.
    "bwd_tiled_budget": {0: 9.5e6, 1: 9.5e6, 2: 14e6},
    # Packed BACKWARD budgets (halo_attn_packed.packed_cascade_bwd_impl),
    # against packed_bwd_vmem_bytes (~2x conservative like the forward
    # estimator). v5e-verified: L=0 W=96 g=8 (est 35.5M) compiles, beats
    # banded 7.87 -> 6.48 ms isolated; L=1 W=96 g=4 (est 25.1M) 6.70 ->
    # 6.37. W=192 L=0 g=8 (est 70.6M) and L=1 g<=4 (est >=29M) OOM ->
    # budgets sit just above the verified shapes.
    "bwd_packed_budget": {0: 36e6, 1: 26e6},
    # Tail backward (tail_band: four slim kernels — recompute/dK/dph/
    # stage adjoint): checked against tail_bwd_vmem_bytes (max per-kernel
    # peak). The earlier monolithic formulations measured 18.5-23M scoped
    # vs the 16M ceiling; the split keeps every kernel ~11-12M estimated.
    "tail_bwd_limit": 13e6,
    # Fused pair-major ff kernel (ff_pair.py) vs ff_pair_vmem_bytes
    # (ESTIMATE-space limit; the estimator runs ~1.5x conservative).
    # r5 calibration (real scoped VMEM, scripts/calibrate_vmem.py
    # ffpair): W=96 est 16.47M / real 10.85M — ~5M under the 16M
    # ceiling. 17e6 admits exactly the flagship-verified width; W=128
    # (est 21.4M, real ~14M extrapolated, marginal) and wider stay on
    # the XLA pair fallback until probed.
    "ff_pair_limit": 17e6,
    # Packed-front BACKWARD (L=2): packed full-res adjoints + native-C
    # per-subgroup attention adjoint on a column-slab grid, vs
    # packed_front_bwd_vmem_bytes. r4 (scripts/ab_pf_bwd.py): the
    # r3-snapshot kernel UNROLLED the subgroup loop and Mosaic overlapped
    # every iteration's adjoint live set — 22.13M scoped at slab=32 (OOM
    # at ANY sub), so training was silently broken on hardware. The
    # kernel was rebuilt (image-major leaf staging + a fori subgroup
    # walk + dead-pyramid scratch reuse): sub<=2 now compiles at 13.7M
    # est, BUT measures no faster than the column-slab tiled backward at
    # either the x4 or x2 width (ABBA paired deltas +0.4..+3 ms/branch-
    # grad), so dispatch keeps the tiled backward; the kernel stays
    # correctness-tested for future recalibration on other generations.
    "bwd_pf_budget": {},
}

# device_kind prefix (lowercased) -> calibration
_CALIBRATED = {
    "tpu v5 lite": _V5E,
    "tpu v5e": _V5E,
}

# Unknown TPU generations: same kernels, shrunk budgets (see module doc).
_UNKNOWN_TPU_SCALE = 0.75


def _scaled(cal: dict, f: float) -> dict:
    def sc(v):
        if not isinstance(v, (int, float)):
            return v  # non-budget entries (e.g. level tuples) pass through
        return int(v * f) if isinstance(v, int) else v * f

    return {k: ({kk: sc(vv) for kk, vv in v.items()}
                if isinstance(v, dict) else sc(v))
            for k, v in cal.items()}


@functools.lru_cache(maxsize=1)
def gate_profile() -> dict:
    try:
        dev = jax.devices()[0]
        kind = (dev.device_kind or "").lower()
        platform = dev.platform
    except Exception:  # no backend at all (import-time use in tools)
        kind, platform = "", "cpu"
    if platform not in ("tpu", "axon"):
        return _V5E
    for prefix, cal in _CALIBRATED.items():
        if kind.startswith(prefix):
            return cal
    return _scaled(_V5E, _UNKNOWN_TPU_SCALE)
