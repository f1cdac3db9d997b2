"""Scan the compiled flagship forward's HLO for large f32 buffers.

The roofline (ROOFLINE_r05.json) says the flagship is bandwidth-bound;
any tensor that crosses a fusion boundary in f32 where bf16 would do
pays double bytes. This compiles m2trans_apply at the flagship recipe,
dumps the optimized HLO, and lists every f32 (and f32-convert) tensor
>= 0.5 MB with the instruction that produces it, grouped by opcode.
Fusion-internal values never touch HBM, so only top-level instruction
results are counted (operands are some other instruction's result, so
counting results once approximates unique buffer bytes).

Compile-only: safe to run through the tunnel without device time.
Usage: python scripts/hlo_f32_scan.py
"""

import os
import re
import sys
from collections import defaultdict

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from m2trans_tpu.config import Config  # noqa: E402
from m2trans_tpu.models import init_m2trans, m2trans_apply  # noqa: E402

BATCH, H, SCALE = 8, 96, 4


def shape_bytes(shape_str):
    """'f32[8,96,96,64]' -> bytes. Returns 0 for opaque/tuple shapes."""
    m = re.match(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    per = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
           "s8": 1, "u8": 1, "pred": 1}[dt]
    return n * per


def main():
    cfg = Config(scale=SCALE, n_feats=64, n_blocks=8, colors=3,
                 dtype="bfloat16", use_pallas=True)
    params = init_m2trans(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((BATCH, H, H, 3), jnp.float32)
    fn = jax.jit(lambda p, x: m2trans_apply(p, x, cfg))
    compiled = fn.lower(params, x).compile()
    txt = compiled.as_text()

    # Top-level instructions only: inside the ENTRY computation and the
    # bodies of while/conditional called computations; fusion bodies are
    # separate computations whose name starts with 'fused' or contains
    # '.fusion'. Heuristic: count lines assigning an f32 result whose
    # computation is not a fusion body.
    total_f32 = 0
    by_op = defaultdict(int)
    tops = []
    cur_comp = ""
    for line in txt.splitlines():
        mc = re.match(r"\s*(%?[\w\.\-]+)\s*\((.*)\)\s*->", line)
        if mc and "{" not in line:
            continue
        mh = re.match(r"\s*(ENTRY\s+)?%?([\w\.\-]+)\s*\(.*\)\s*->.*{", line)
        if mh:
            cur_comp = mh.group(2)
            continue
        if "fused" in cur_comp or "fusion" in cur_comp:
            continue
        mi = re.match(r"\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*(f32\[[\d,]*\])"
                      r"[^=]*?\b([a-z\-]+)\(", line)
        if not mi:
            continue
        name, shape, op = mi.groups()
        b = shape_bytes(shape)
        if b >= 512 * 1024:
            total_f32 += b
            by_op[op] += b
            tops.append((b, name, shape, op))

    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    total = float(cost.get("bytes accessed", 0.0))
    print(f"total bytes accessed: {total/1e6:.0f} MB")
    print(f"f32 top-level results >= 0.5 MB: {total_f32/1e6:.0f} MB "
          f"(result bytes only; each also read >=1x)")
    print("\nby opcode:")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1]):
        print(f"  {op:24s} {b/1e6:9.1f} MB")
    print("\ntop 25 f32 tensors:")
    for b, name, shape, op in sorted(tops, reverse=True)[:25]:
        print(f"  {b/1e6:8.1f} MB  {shape:28s} {op:14s} {name}")


if __name__ == "__main__":
    main()
