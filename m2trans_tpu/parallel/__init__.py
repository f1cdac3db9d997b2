from m2trans_tpu.parallel.spatial import spatial_sharded_forward  # noqa: F401
from m2trans_tpu.parallel.streaming import StreamingSR  # noqa: F401
