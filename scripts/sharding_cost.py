"""Quantify the spatial-sharded forward's ICI traffic vs its HBM traffic.

The multi-chip design claim (parallel/spatial.py) is that halo exchange
rides ICI lightly: each CFTM exchanges a fixed 96-row halo per shard
boundary while the body's HBM traffic scales with the shard's pixels.
This instrument compiles the sharded flagship on an 8-device host mesh
(same GSPMD partitioning a v5e pod slice would get), parses the
optimized HLO for `collective-permute` ops, and reports per-device ICI
bytes, HBM bytes-accessed, and their ratio at 2/4/8 shards.

XLA path (use_pallas=False) so the byte accounting is pure XLA fusions;
the ppermutes sit outside the kernels either way, so the collective
structure is identical on the Pallas dispatch (which the sharded path
inherits — test_sharded_wide_frame_engages_tiled_kernels).

Usage: python scripts/sharding_cost.py [--out SHARDING_rNN.json]
"""

import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import init_m2trans, policy_from_config  # noqa: E402
from m2trans_tpu.parallel.spatial import (  # noqa: E402
    _build_sharded_fwd,
    _model_key,
)

BATCH, H, W, SCALE = 1, 256, 256, 4

_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
          "s8": 1, "u8": 1, "pred": 1}


def _shape_bytes(s):
    m = _SHAPE_RE.match(s)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _BYTES[dt]


def place(n):
    cfg = Config(scale=SCALE, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=False)
    policy = policy_from_config(cfg)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(jax.devices()[:n], ("space",))
    fwd = _build_sharded_fwd(mesh, _model_key(cfg), policy, None, n)
    x = jnp.zeros((BATCH, H, W, 3), jnp.float32)
    compiled = fwd.lower(params, x).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    hbm = float(cost.get("bytes accessed", 0.0))

    # each collective-permute(-start) sends its operand over ICI once
    ici = 0
    n_perm = 0
    for line in compiled.as_text().splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?[\w\.\-]+\s*=\s*"
                     r"(?:\(([^)]*)\)|((?:f32|bf16|f16|s32|u32|s8|u8|pred)"
                     r"\[[\d,]*\]))\S*\s+collective-permute(?:-start)?\(",
                     line)
        if not m:
            continue
        n_perm += 1
        if m.group(2):
            ici += _shape_bytes(m.group(2))
        else:  # tuple shape (start op): count the send operand half
            parts = [p.strip() for p in m.group(1).split(",")]
            sizes = [_shape_bytes(p) for p in parts if _shape_bytes(p)]
            ici += sum(sizes) // 2 if len(sizes) > 1 else sum(sizes)
    return {
        "shards": n,
        "collective_permutes": n_perm,
        "ici_MB_per_device_step": round(ici / 1e6, 2),
        "hbm_MB_per_device_step": round(hbm / 1e6, 1),
        "flops_G_per_device_step": round(flops / 1e9, 2),
        "ici_to_hbm_pct": round(100 * ici / hbm, 2) if hbm else None,
    }


def main():
    out_path = None
    args = sys.argv[1:]
    while args:
        a = args.pop(0)
        if a == "--out":
            out_path = args.pop(0)
    rec = {
        "metric": "spatial_sharded_ici_traffic",
        "recipe": f"batch {BATCH}, {H}x{W} -> x{SCALE} full-frame, "
                  "bf16 XLA path, 8-device host mesh (GSPMD identical "
                  "to a TPU pod slice); collective-permute bytes from "
                  "the optimized HLO",
        "shards": [],
    }
    for n in (2, 4, 8):
        r = place(n)
        rec["shards"].append(r)
        print(json.dumps(r), flush=True)
    print(json.dumps(rec, indent=1), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
