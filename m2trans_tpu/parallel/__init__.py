from m2trans_tpu.parallel.spatial import spatial_sharded_forward  # noqa: F401
