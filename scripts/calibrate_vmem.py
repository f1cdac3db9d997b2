"""Read a Pallas kernel's REAL scoped-VMEM footprint from the Mosaic
compiler (r5 calibration tool).

Method: compile the isolated kernel program with
``compiler_options={"xla_tpu_scoped_vmem_limit_kib": 1024}`` — far below
any real kernel — and parse the failure message, which reports the whole
``closed_call`` stack allocation ("Scoped allocation with size X and
limit Y"). That size is the kernel's true scoped peak, the number every
gate estimator in ops/pallas/device.py is trying to predict. One compile
per probe (20-40 s through the axon tunnel), no binary search.

Usage: python scripts/calibrate_vmem.py tail   # tail modes at flagship
       python scripts/calibrate_vmem.py tail H W NF SCALE
"""

import os
import re
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def probe_scoped_bytes(fn, *args, limit_kib=1024):
    """Compile fn(*args) with a tiny scoped-VMEM limit; return the real
    scoped size in bytes parsed from the OOM message, or 0.0 if the
    program compiled even under the tiny limit (no big scoped user)."""
    lowered = jax.jit(fn).lower(*args)
    try:
        lowered.compile(
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": limit_kib})
        return 0.0
    except Exception as e:  # noqa: BLE001 — compiler error text is the data
        msg = str(e)
        m = re.search(r"[Ss]coped allocation with size ([\d.]+)([KMG])", msg)
        if not m:
            raise RuntimeError(f"no scoped-size line in:\n{msg[-2000:]}")
        mult = {"K": 2**10, "M": 2**20, "G": 2**30}[m.group(2)]
        return float(m.group(1)) * mult


def compiles_at_default(fn, *args):
    """True if fn compiles under the device's real scoped limit."""
    try:
        jax.jit(fn).lower(*args).compile()
        return True
    except Exception:
        return False


def peak_scoped_bytes(fn, *args, lo_kib=1024, hi_kib=24576, tol_kib=512):
    """Binary-search the minimal passing scoped-VMEM limit == the
    program's true scoped peak (the single-shot probe reports only the
    FIRST allocation exceeding the limit, which undershoots the peak on
    multi-kernel or multi-allocation programs). ~log2(range/tol) remote
    compiles (~30 s each through the tunnel)."""
    lowered = jax.jit(fn).lower(*args)

    def passes(kib):
        try:
            lowered.compile(
                compiler_options={"xla_tpu_scoped_vmem_limit_kib": kib})
            return True
        except Exception:
            return False

    if passes(lo_kib):
        return lo_kib * 1024.0
    if not passes(hi_kib):
        return float("inf")
    while hi_kib - lo_kib > tol_kib:
        mid = (lo_kib + hi_kib) // 2
        if passes(mid):
            hi_kib = mid
        else:
            lo_kib = mid
    return hi_kib * 1024.0


def probe_tail(h, w, nf, scale):
    import m2trans_tpu.ops.pallas.tail_band as tb
    from m2trans_tpu.config import Config
    from m2trans_tpu.models import init_m2trans
    from m2trans_tpu.models.m2trans import _tail_band_fits

    cfg = Config(scale=scale, n_feats=nf, n_blocks=1)
    p = init_m2trans(jax.random.PRNGKey(0), cfg)["tail"]
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, h, w, nf),
                           jnp.float32)

    for mode in (False, True, "roll"):
        tb._TAP_PACKED = mode

        # fresh function object per mode — jax's trace cache would
        # otherwise serve the first mode's program (NOTES_ROUND5)
        def f(pp, xx, _mode=mode):
            return tb.tail_band_apply(pp, xx, scale=scale, rgb_range=1.0,
                                      interpret=False)

        real = peak_scoped_bytes(f, p, x)
        ok = compiles_at_default(f, p, x)
        est = None
        try:
            # re-run the gate's estimate for this mode (it reads
            # tb._TAP_PACKED live)
            from m2trans_tpu.ops.pallas.device import gate_profile
            lim = gate_profile()["tail_limit"]
            admitted = _tail_band_fits(h, w, scale, nf, limit=lim)
            est = (lim, admitted)
        except Exception:
            pass
        print(f"tail mode={mode!r:8} shape=({h},{w},{nf},x{scale}) "
              f"real={real / 1e6:.2f}M compiles_at_16M={ok} "
              f"gate(limit={est[0] / 1e6:.1f}M)->admit={est[1]}",
              flush=True)
    tb._TAP_PACKED = False


def probe_ffpair(h, w):
    from m2trans_tpu.ops.pallas.ff_pair import (
        ff_pair_conv_fused,
        ff_pair_vmem_bytes,
    )

    g, nb, cb = 8, 4, 16
    c = nb * cb
    gc = g * c
    key = jax.random.PRNGKey(0)
    oc = jax.random.normal(key, (1, h, w, gc), jnp.bfloat16)
    xp = jax.random.normal(key, (1, h, w, gc), jnp.bfloat16)
    wgt = jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
    b = jax.random.normal(key, (c,), jnp.float32)

    def f(o, x):
        return ff_pair_conv_fused(o, x, wgt, b, g=g, interpret=False)

    real = peak_scoped_bytes(f, oc, xp)
    ok = compiles_at_default(f, oc, xp)
    print(f"ffpair shape=({h},{w},gc={gc}) real={real / 1e6:.2f}M "
          f"compiles_at_16M={ok} "
          f"est={ff_pair_vmem_bytes(w, gc) / 1e6:.2f}M", flush=True)


def main():
    kind = sys.argv[1] if len(sys.argv) > 1 else "tail"
    print("devices:", jax.devices(), flush=True)
    if kind == "tail":
        if len(sys.argv) > 2:
            h, w, nf, scale = map(int, sys.argv[2:6])
        else:
            h, w, nf, scale = 96, 96, 64, 4
        probe_tail(h, w, nf, scale)
    elif kind == "ffpair":
        h = int(sys.argv[2]) if len(sys.argv) > 2 else 96
        w = int(sys.argv[3]) if len(sys.argv) > 3 else 96
        probe_ffpair(h, w)
    else:
        raise SystemExit(f"unknown probe kind {kind!r}")


if __name__ == "__main__":
    main()
