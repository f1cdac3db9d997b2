"""Profile a jitted step on the remote TPU and print per-op self-times.

Usage:
    python scripts/tpu_profile.py <what>

Traces a short serialized chain under jax.profiler, then parses the
captured .xplane.pb with the tensorboard profile plugin and prints the
top ops by device self-time. This is how the NOTES_ROUND2 per-component
budget was produced.
"""

from __future__ import annotations

import glob
import os
import sys


def trace_and_report(step, x0, *args, steps: int = 6, outdir=None):
    import jax
    import numpy as np

    outdir = outdir or f"/tmp/m2t_trace_{os.getpid()}"
    x = x0
    for _ in range(3):
        x = step(x, *args)
    np.asarray(x)
    with jax.profiler.trace(outdir):
        x = x0
        for _ in range(steps):
            x = step(x, *args)
        np.asarray(x)
    report(outdir, steps)


def report(outdir: str, steps: int = 1, top: int = 28):
    """Parse the raw .xplane.pb (XSpace proto) and aggregate device-plane
    event durations by op name. The tensorboard plugin's native converter
    is broken against the installed TF, so we read the proto directly."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        outdir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane under {outdir}"
    xs = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xs.ParseFromString(f.read())
    agg = {}
    total_ps = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        emeta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; skip step/module summary lines
            if "xla op" not in lname and "ops" != lname:
                continue
            for ev in line.events:
                name = emeta[ev.metadata_id].name
                dur = ev.duration_ps
                total_ps += dur
                a = agg.setdefault(name, [0, 0])
                a[0] += dur
                a[1] += 1
    if not agg:  # fall back: aggregate every line of TPU planes
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            emeta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = f"{line.name}::{emeta[ev.metadata_id].name}"
                    a = agg.setdefault(name, [0, 0])
                    a[0] += ev.duration_ps
                    a[1] += 1
                    total_ps += ev.duration_ps
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"device op-time total: {total_ps / 1e9 / steps:.3f} ms/step "
          f"over {steps} steps ({len(rows)} ops)")
    for name, (ps, n) in rows[:top]:
        print(f"{ps / 1e9 / steps:8.3f} ms {n:>5}x  {name[:110]}")


if __name__ == "__main__":
    report(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
