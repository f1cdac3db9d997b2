"""Within-process A/B harness for kernel decisions (VERDICT r3 item 7).

The axon tunnel drifts enough that the SAME compiled program measured
25.1 and 42.3 ms/step in different processes minutes apart
(NOTES_ROUND4.md) — only same-process comparisons are trustworthy. This
module is the one place that implements the trusted recipe:

  * serialized DATA-DEPENDENT chains (each call consumes the previous
    output; only the final host fetch forces execution on the lazy
    remote platform), measured at two lengths; the per-call time is the
    slope between them, which cancels dispatch RTT and fetch overhead;
  * minimum across trials (tunnel hiccups only ADD time);
  * variants interleaved per trial (A, B, A, B, ...) so drift hits all
    variants equally — the PAIRWISE ratio is the reliable statistic.

Library use:

    from scripts.ab import compare
    compare({"old": f_old, "new": f_new}, args=(x,), feed=my_feed)

where each variant is a jitted callable and ``feed(prev_out, args)``
returns the next call's argument tuple (default: feed a tiny scalar of
the previous output into the first array argument). Prints a table of
slope +- spread and ratios vs the first variant; returns {name: slope}.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/m2trans_tpu_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fresh(fn):
    """Wrap fn in a NEW function object before jit/lower.

    jax's global trace cache keys on the function object: lowering the
    SAME ``fwd`` twice serves the first trace, so monkeypatched module
    attributes (the ablation mechanism) are never re-read — every
    variant silently compiles the FIRST variant's program. This voided
    a whole batch of round-4 ablations (see NOTES_ROUND5 "measurement
    layer rebuild"). Any script that traces one function under several
    patch states MUST wrap each trace in fresh().
    """
    def wrapper(*a, **k):
        return fn(*a, **k)
    wrapper.__name__ = getattr(fn, "__name__", "fn") + "_fresh"
    return wrapper


def _default_feed(prev, args):
    """Data-dependence glue: nudge the first array arg by a scalar of the
    previous output (1e-9 keeps values numerically unchanged in bf16)."""
    import jax
    import jax.numpy as jnp

    if prev is None:
        return args
    leaves = [x for x in jax.tree_util.tree_leaves(prev)
              if hasattr(x, "dtype")]
    s = leaves[0].reshape(-1)[0].astype(jnp.float32)
    first, rest = args[0], args[1:]
    return (first + (s * 1e-9).astype(first.dtype),) + tuple(rest)


def chain(fn, n, args, feed=_default_feed):
    import jax
    import numpy as np

    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*feed(out, args))
    jax.tree_util.tree_map(np.asarray, out)
    return time.perf_counter() - t0


def compare(variants, args, feed=_default_feed, n1=4, n2=16, trials=5,
            label_width=24, quiet=False):
    """Interleaved A/B slope comparison; see module docstring.

    Per trial, variants run in ABBA order (forward then reversed) so a
    linear drift component cancels inside the trial; the reported
    number is the MEDIAN of per-trial slopes (min is biased when the
    tunnel drifts between a variant's two chain lengths) and the delta
    column is the median of per-trial PAIRED differences vs the first
    variant — the statistic that survives drift."""
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm the tunnel
    names = list(variants)
    for name in names:  # compile + first-run warmup, outside timing
        chain(variants[name], 1, args, feed)
        if not quiet:
            print(f"  compiled {name}", flush=True)

    per_trial = {n: [] for n in names}
    for _ in range(trials):
        t1 = {n: [] for n in names}
        t2 = {n: [] for n in names}
        order = names + names[::-1]  # ABBA
        for name in order:
            t1[name].append(chain(variants[name], n1, args, feed))
        for name in order:
            t2[name].append(chain(variants[name], n2, args, feed))
        for name in names:
            a = sum(t1[name]) / len(t1[name])
            b = sum(t2[name]) / len(t2[name])
            per_trial[name].append((b - a) / (n2 - n1))

    slopes, spreads, deltas = {}, {}, {}
    base_name = names[0]
    for name in names:
        ps = sorted(per_trial[name])
        slopes[name] = ps[len(ps) // 2]
        spreads[name] = (ps[-1] - ps[0]) / 2
        d = sorted(p - q for p, q in zip(per_trial[name],
                                         per_trial[base_name]))
        deltas[name] = d[len(d) // 2]
    if not quiet:
        for name in names:
            print(f"{name:<{label_width}} {slopes[name] * 1e3:9.3f} ms "
                  f"+- {spreads[name] * 1e3:6.3f}   "
                  f"delta {deltas[name] * 1e3:+7.3f} ms vs {base_name}",
                  flush=True)
    return slopes


def compare_fori(bodies, x0, n1=4, n2=32, trials=6, label_width=24,
                 quiet=False):
    """Device-loop variant of :func:`compare`: each body is a traceable
    x -> x step; the chain runs INSIDE one jit via lax.fori_loop, so a
    whole chain costs ONE tunnel dispatch. The slope between two loop
    lengths is pure device time per iteration.

    Use this instead of compare() when per-iteration device time may be
    below the tunnel's per-call dispatch overhead (~6 ms observed) —
    compare()'s python-loop chains floor there and every variant
    measures alike (the round-4 'everything ablates to ~0' artifact).

    Caveat: XLA may hoist loop-invariant (param-derived) work out of the
    loop, so per-iter numbers exclude one-time weight prep — the right
    accounting for steady-state serving/training, but not for one-shot
    latency.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # warm the tunnel
    names = list(bodies)
    progs = {}
    for name in names:
        body = bodies[name]
        for n in (n1, n2):
            progs[name, n] = jax.jit(
                lambda x, body=body, n=n: lax.fori_loop(
                    0, n, lambda i, xx: body(xx), x))
            np.asarray(jax.tree_util.tree_leaves(
                progs[name, n](x0))[0].reshape(-1)[0])  # compile+run
        if not quiet:
            print(f"  compiled {name}", flush=True)

    def run(name, n):
        t0 = time.perf_counter()
        out = progs[name, n](x0)
        jax.tree_util.tree_map(np.asarray, out)
        return time.perf_counter() - t0

    per_trial = {n: [] for n in names}
    for _ in range(trials):
        t1 = {n: [] for n in names}
        t2 = {n: [] for n in names}
        order = names + names[::-1]  # ABBA
        for name in order:
            t1[name].append(run(name, n1))
        for name in order:
            t2[name].append(run(name, n2))
        for name in names:
            a = sum(t1[name]) / len(t1[name])
            b = sum(t2[name]) / len(t2[name])
            per_trial[name].append((b - a) / (n2 - n1))

    slopes, spreads, deltas = {}, {}, {}
    base = names[0]
    for name in names:
        ps = sorted(per_trial[name])
        slopes[name] = ps[len(ps) // 2]
        spreads[name] = (ps[-1] - ps[0]) / 2
        d = sorted(p - q
                   for p, q in zip(per_trial[name], per_trial[base]))
        deltas[name] = d[len(d) // 2]
    if not quiet:
        for name in names:
            print(f"{name:<{label_width}} {slopes[name] * 1e3:9.3f} ms "
                  f"+- {spreads[name] * 1e3:6.3f}   "
                  f"delta {deltas[name] * 1e3:+7.3f} ms vs {base}",
                  flush=True)
    return slopes


def _demo():
    """CLI smoke test: XLA vs Pallas fused branch at the flagship shape.

    python scripts/ab.py [B H W CB LEVELS]
    """
    import jax
    import jax.numpy as jnp

    from m2trans_tpu.ops.pallas.halo_attn import (
        _xla_reference,
        halo_attention_qkv_fused,
    )

    argv = [int(a) for a in sys.argv[1:]] or [8, 96, 96, 16, 0]
    b, h, w, cb, levels = argv
    c = cb * 4 ** levels
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, h, w, cb), jnp.bfloat16)
    wq = jax.random.normal(key, (c, 3 * c), jnp.bfloat16) * 0.05
    rh = jax.random.normal(key, (10, c // 2), jnp.float32)
    rw = jax.random.normal(key, (10, c // 2), jnp.float32)

    fused = jax.jit(lambda xx: halo_attention_qkv_fused(
        xx, wq, rh, rw, levels=levels))
    xla = jax.jit(lambda xx: _xla_reference(
        xx, wq, rh, rw, block=8, halo=1, levels=levels))
    compare({"xla": xla, "pallas": fused}, (x,))


if __name__ == "__main__":
    _demo()
