"""Streaming cine-loop ultrasound SR (north-star config 5).

Real-time pipeline for fixed-shape video frames: one persistently-compiled
forward per frame shape (single-chip, or spatially sharded over a
``space`` mesh via parallel.spatial), with software pipelining — frame t+1
is dispatched before frame t's result is fetched, overlapping host I/O,
PCIe/ICI transfer, and TPU compute. The reference has no streaming or
video path at all (single-image test loop, reference test.py:87-99).
"""

from __future__ import annotations

import collections
import time
from typing import Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m2trans_tpu.config import Config
from m2trans_tpu.models import m2trans_apply_microbatched
from m2trans_tpu.models.m2trans import ComputePolicy


class StreamingSR:
    """Fixed-shape streaming super-resolution runner.

    Args:
      params: model params pytree.
      cfg: model Config (scale etc.).
      mesh: optional jax Mesh with a 'space' axis for full-frame spatial
        sharding (frames too large for one chip's HBM or latency budget).
      policy: numerics policy; defaults to bf16+Pallas for streaming.
      depth: pipeline depth (in-flight frames).
      output_u8: quantize SR frames to uint8 (round(x*255)) ON DEVICE
        before the host fetch. The model output is already clamped to
        [0,1] and display/DICOM sinks consume 8-bit anyway, so this is
        lossless for serving while shrinking the per-frame transfer 4x —
        decisive when the host link, not the chip, bounds p50 (measured:
        the 25 MB f32 fetch of a 512^2->x4 frame dominates latency over
        a remote tunnel; on local PCIe it is still 4x less link time).
    """

    @staticmethod
    def default_policy() -> ComputePolicy:
        return ComputePolicy(dtype=jnp.bfloat16, precision=None,
                             use_pallas=True, packed_body=True)

    def __init__(self, params, cfg: Config, *, mesh=None,
                 policy: Optional[ComputePolicy] = None, depth: int = 2,
                 output_u8: bool = False):
        self.cfg = cfg
        self.mesh = mesh
        self.depth = max(1, depth)
        self.output_u8 = output_u8
        if policy is None:
            policy = self.default_policy()
        self.policy = policy
        self.params = params

        if mesh is not None:
            from m2trans_tpu.parallel.spatial import spatial_sharded_forward

            def raw(p, x):
                return spatial_sharded_forward(p, x, cfg, mesh=mesh,
                                               policy=policy)
        else:
            def raw(p, x):
                return m2trans_apply_microbatched(p, x, cfg, policy=policy)

        if output_u8:
            def fwd(p, x):
                return jnp.round(raw(p, x) * 255.0).astype(jnp.uint8)
        else:
            fwd = raw
        self._fwd = jax.jit(fwd)

    def warmup(self, frame_shape: Tuple[int, ...]) -> None:
        x = jnp.zeros(frame_shape, jnp.float32)
        np.asarray(self._fwd(self.params, x))

    def __call__(self, frames: np.ndarray) -> np.ndarray:
        """One synchronous batch: (B, H, W, C) [0,1] -> (B, H*s, W*s, 3)."""
        return np.asarray(self._fwd(self.params, jnp.asarray(frames)))

    def stream(self, frames: Iterable[np.ndarray],
               collect_stats: bool = False
               ) -> Iterator[np.ndarray]:
        """Pipelined streaming: yields SR frames in order while the next
        frames are already in flight. Set ``collect_stats`` to accumulate
        per-frame wall-clock latencies in ``self.latencies_s``."""
        self.latencies_s = []
        inflight = collections.deque()
        for frame in frames:
            t0 = time.perf_counter()
            out = self._fwd(self.params, jnp.asarray(frame))
            inflight.append((out, t0))
            if len(inflight) >= self.depth:
                out, t0 = inflight.popleft()
                res = np.asarray(out)
                if collect_stats:
                    self.latencies_s.append(time.perf_counter() - t0)
                yield res
        while inflight:
            out, t0 = inflight.popleft()
            res = np.asarray(out)
            if collect_stats:
                self.latencies_s.append(time.perf_counter() - t0)
            yield res

    def latency_percentiles(self):
        lat = sorted(self.latencies_s or [])
        if not lat:
            return {}
        pick = lambda q: lat[min(len(lat) - 1, int(q * len(lat)))]  # noqa
        return {"p50_s": pick(0.5), "p90_s": pick(0.9), "p99_s": pick(0.99)}
