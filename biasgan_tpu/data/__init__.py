"""Data layer: name-keyed dataset registry + batching loader.

Capability parity with the reference's ``data/__init__.py``
(``create_dataset(opt)`` -> iterable of dicts {'A','B','A_paths','B_paths'},
SURVEY.md section 2.2 [K]). Arrays are NHWC float32 in [-1, 1].

TPU-first differences: batches have STATIC shapes (the loader drops a ragged
final batch — XLA compiles one train step, period), and heavy augmentation
(flips / periodic-longitude rolls / standardization) runs in-graph keyed by
the step rng (data/transforms.py), not in host worker processes.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from biasgan_tpu.data import synthetic  # noqa: F401 (registers 'synthetic')
from biasgan_tpu.data import aligned  # noqa: F401 (registers 'aligned')
from biasgan_tpu.data import unaligned  # noqa: F401 (registers 'unaligned')
from biasgan_tpu.data import single  # noqa: F401 (registers 'single')
from biasgan_tpu.data import climate  # noqa: F401 (registers 'climate')


class DataLoader:
    """Shuffling, fixed-shape batching loader (reference
    CustomDatasetDataLoader semantics: shuffle unless --serial_batches,
    cap at --max_dataset_size)."""

    def __init__(self, dataset, cfg):
        self.dataset = dataset
        self.batch_size = cfg.batch_size
        self.shuffle = not cfg.serial_batches
        n = len(dataset)
        if cfg.max_dataset_size and cfg.max_dataset_size > 0:
            n = min(n, cfg.max_dataset_size)
        self.num_samples = n
        self.seed = cfg.seed
        self.epoch = 0
        # static shapes: drop ragged tail when batching for training
        self.drop_last = cfg.batch_size > 1
        # reference --num_threads: worker threads decode/transform samples
        # while the device runs the previous step (SURVEY.md section 7 hard
        # part 6 — the input pipeline must hide HDF5/PIL decode behind the
        # ms-scale fused train step). 0 = synchronous (test-time default).
        self.num_threads = max(int(getattr(cfg, "num_threads", 0)), 0)
        self.prefetch_batches = 2

    def __len__(self) -> int:
        if self.drop_last:
            return self.num_samples // self.batch_size
        return -(-self.num_samples // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        # datasets derive per-sample RNG from (seed, epoch, index)
        # (transforms.sample_rng) — reproducible under --seed, varying per
        # epoch, independent of worker-thread scheduling
        self.dataset.epoch = self.epoch
        order = np.arange(self.num_samples)
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(order)
        nb = len(self)

        def batch_indices(b: int):
            return [int(i) for i in order[b * self.batch_size : (b + 1) * self.batch_size]]

        if self.num_threads <= 0 or nb <= 1:
            for b in range(nb):
                yield _collate([self.dataset[i] for i in batch_indices(b)])
            self.epoch += 1
            return

        # pipelined path: a producer thread maps sample reads over a worker
        # pool and keeps a small queue of collated batches ahead of the
        # consumer, so host IO/decode overlaps device compute.
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        _SENTINEL = object()
        stop = threading.Event()  # set when the consumer abandons iteration

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_threads) as ex:
                    for b in range(nb):
                        samples = list(
                            ex.map(self.dataset.__getitem__, batch_indices(b))
                        )
                        if not put(_collate(samples)):
                            return  # consumer gone; release workers/handles
                put(_SENTINEL)
            except BaseException as e:  # surface worker errors to the consumer
                put(e)

        threading.Thread(target=produce, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
            self.epoch += 1
        finally:
            stop.set()


def _collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key.endswith("_paths"):
            out[key] = [v for s in vals for v in (s if isinstance(s, list) else [s])]
        else:
            out[key] = np.stack(vals).astype(np.float32)
    return out


class _Subset:
    """Contiguous index-range view of a dataset (train/val splits). Samples
    keep their GLOBAL index, so per-sample rng (seed, epoch, index) and
    synthetic field identities are stable regardless of the split."""

    def __init__(self, base, start: int, count: int):
        self._base = base
        self._start = start
        self._count = count

    def __len__(self) -> int:
        return self._count

    def __getitem__(self, i: int):
        return self._base[self._start + int(i)]

    @property
    def epoch(self):
        return getattr(self._base, "epoch", 0)

    @epoch.setter
    def epoch(self, e):
        self._base.epoch = e


def create_dataset(cfg, split: Optional[str] = None) -> DataLoader:
    """Build the loader. ``split``: None = whole dataset; 'train'/'val' =
    the first n - val_split / last val_split samples when --val_split is
    set (held-out tail — for time-indexed climate data this is the most
    recent frames, the standard out-of-sample convention)."""
    from biasgan_tpu.registry import get_dataset

    dataset = get_dataset(cfg.dataset_mode)(cfg)
    vs = int(getattr(cfg, "val_split", 0) or 0)
    if split is not None:
        # fail loudly: a typo'd split name or a val request without
        # --val_split would otherwise silently return the FULL dataset and
        # 'held-out' metrics would be computed on training data
        if split not in ("train", "val"):
            raise ValueError(f"unknown split {split!r} (train|val)")
        if vs <= 0:
            raise ValueError(
                f"split={split!r} requested but --val_split is not set"
            )
    if split in ("train", "val") and vs > 0:
        n = len(dataset)
        if vs >= n:
            raise ValueError(
                f"--val_split {vs} must be smaller than the dataset ({n})"
            )
        if split == "val" and vs < cfg.batch_size:
            # the loader drops partial batches (static jit shapes), so a
            # sub-batch val split would silently yield ZERO batches —
            # disabling the held-out metrics AND the plateau LR decay
            raise ValueError(
                f"--val_split {vs} must be >= --batch_size "
                f"{cfg.batch_size} (the val loader yields full batches)"
            )
        dataset = (
            _Subset(dataset, 0, n - vs)
            if split == "train"
            else _Subset(dataset, n - vs, vs)
        )
    if cfg.verbose:
        print(f"dataset [{type(dataset).__name__}] was created ({len(dataset)} samples)")
    return DataLoader(dataset, cfg)
