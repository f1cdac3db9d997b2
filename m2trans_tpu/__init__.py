"""m2trans_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the
capabilities of the M2Trans ultrasound super-resolution reference
(eezkni/M2Trans: multi-modal regularized coarse-to-fine transformer, IEEE J-BHI 2025).

Design principles (TPU-first, not a port):
  * NHWC layout everywhere (channels on the 128-lane axis).
  * Pure-functional models: params are pytrees, forward passes are jittable
    functions; one jit-compiled train step (fwd + losses + grads + optax update).
  * Parallelism via `jax.sharding.Mesh` (`data` x `space` axes): GSPMD data
    parallelism and `shard_map` spatial partitioning with `ppermute` halo
    exchange for full-frame streaming inference.
  * Pallas TPU kernels for the hot inner ops (fused halo window attention),
    with XLA fallbacks behind a flag.
"""

__version__ = "0.1.0"

from m2trans_tpu.config import Config, load_config  # noqa: F401
