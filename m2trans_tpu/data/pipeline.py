"""Input pipeline: dataset factory + threaded, prefetching train loader.

Mirrors the reference factory surface (datas/utils.py:7-53):
``create_datasets(cfg) -> (train_loader, [{'name', 'dataset'}, ...])`` with
eval-set names CCA-US -> benchmark/UI5, US-CASE -> benchmark/US15,
US1K_23 -> benchmark/US1K_23 under ``cfg.data_path``.

TPU-first: the loader produces fixed-shape NHWC float32 batches (static
shapes for jit; the reference's drop_last=False would retrace on the ragged
tail batch, so we drop it — with data_repeat=5 the epoch length is a
multiple of typical batch sizes anyway). Workers are host threads slicing
npy mmaps; an optional C++ runtime loader (m2trans_tpu/runtime) replaces the
thread pool for production throughput.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from m2trans_tpu.config import Config
from m2trans_tpu.data.benchmark import BenchmarkDataset
from m2trans_tpu.data.us1k import US1KDataset

EVAL_SET_DIRS = {
    "CCA-US": "benchmark/UI5",
    "US-CASE": "benchmark/US15",
    "US1K_23": "benchmark/US1K_23",
}


class TrainLoader:
    """Shuffled, threaded, prefetching batch iterator over a US1KDataset."""

    def __init__(
        self,
        dataset: US1KDataset,
        batch_size: int,
        *,
        num_workers: int = 8,
        seed: int = 33,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        return len(self.dataset) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order_rng = np.random.default_rng((self.seed, self.epoch))
        order = order_rng.permutation(n)[: len(self) * self.batch_size]
        batches = order.reshape(-1, self.batch_size)
        self.epoch += 1

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        counter = {"next": 0}
        lock = threading.Lock()
        results: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        results_cv = threading.Condition()

        def worker(wid: int):
            rng = np.random.default_rng((self.seed, self.epoch, wid))
            while not stop.is_set():
                with lock:
                    b = counter["next"]
                    if b >= len(batches):
                        return
                    counter["next"] = b + 1
                lrs, hrs = [], []
                for idx in batches[b]:
                    lr, hr = self.dataset.get(int(idx), rng)
                    lrs.append(lr)
                    hrs.append(hr)
                with results_cv:
                    results[b] = (np.stack(lrs), np.stack(hrs))
                    results_cv.notify_all()

        threads = [threading.Thread(target=worker, args=(w,), daemon=True)
                   for w in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for b in range(len(batches)):
                with results_cv:
                    while b not in results:
                        results_cv.wait(timeout=60.0)
                    yield results.pop(b)
        finally:
            stop.set()


def create_datasets(
    cfg: Config, *, train: bool = True
) -> Tuple[Optional[TrainLoader], List[Dict]]:
    """Reference-parity factory. Returns (train_loader_or_None, eval_sets)
    where each eval set is {'name': str, 'dataset': BenchmarkDataset}."""
    train_loader = None
    if train:
        if cfg.training_dataset != "us1k":
            raise NotImplementedError(
                f"=== dataset [{cfg.training_dataset}] is not found ===")
        ds = US1KDataset(
            os.path.join(cfg.data_path, "US1K/US1K_train_HR"),
            os.path.join(cfg.data_path, "US1K/US1K_train_LR_bicubic"),
            os.path.join(cfg.data_path, "us1k_cache"),
            train=True,
            augment=bool(cfg.data_augment),
            scale=cfg.scale,
            colors=cfg.colors,
            patch_size=cfg.patch_size,
            repeat=cfg.data_repeat,
            start_idx=int(cfg.train_range[0]),
            end_idx=int(cfg.train_range[1]),
        )
        train_loader = None
        if getattr(cfg, "native_loader", False) and cfg.colors == 3 \
                and bool(cfg.data_augment):
            try:
                from m2trans_tpu.runtime import NativeTrainLoader

                train_loader = NativeTrainLoader(
                    ds.hr_npy, ds.lr_npy, patch_size=cfg.patch_size,
                    scale=cfg.scale, batch_size=cfg.batch_size,
                    repeat=cfg.data_repeat, num_workers=cfg.threads,
                    seed=cfg.seed)
                train_loader.dataset = ds  # len(dataset) parity for logging
            except Exception as e:  # missing toolchain / unsupported cache
                print(f"## native loader unavailable ({e}); "
                      "using the Python loader ##")
                train_loader = None
        if train_loader is None:
            train_loader = TrainLoader(ds, cfg.batch_size,
                                       num_workers=cfg.threads,
                                       seed=cfg.seed)

    eval_sets = []
    for name in cfg.eval_sets or []:
        if name not in EVAL_SET_DIRS:
            raise ValueError(f"unknown eval set {name}")
        root = os.path.join(cfg.data_path, EVAL_SET_DIRS[name])
        ds = BenchmarkDataset(
            os.path.join(root, "HR"),
            os.path.join(root, "LR_bicubic"),
            scale=cfg.scale,
            colors=cfg.colors,
        )
        eval_sets.append({"name": name, "dataset": ds})
    return train_loader, eval_sets
