from m2trans_tpu.data.us1k import US1KDataset  # noqa: F401
from m2trans_tpu.data.benchmark import BenchmarkDataset  # noqa: F401
from m2trans_tpu.data.pipeline import create_datasets, TrainLoader  # noqa: F401
