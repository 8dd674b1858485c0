"""Host data pipeline: threaded sample loading + background batch prefetch +
device transfer overlap.

Replaces the reference's torch DataLoader + BackgroundGenerator stack
(utils/data_utils.py:9-93, DataLoaderFast/DataLoaderBG): sample loading is
IO-bound (mmap'd feature reads), so a thread pool is the right concurrency
model on the host; batches are assembled by a collate function into
fixed-shape numpy dicts; and ``device_prefetch`` keeps N batches in flight on
the TPU so H2D copies overlap the previous step's compute (the reference's
non_blocking=True .to(device), main_egoexo4d_distributed.py:123).

When the native C++ loader (csrc/) is built, ``ThreadedLoader`` transparently
uses it for the feature-window gather; the Python path is always available.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

from exoground_tpu.data.sampling import ShardedSampler, batched


class BackgroundIterator:
    """Run an iterator on a daemon thread, buffering up to max_prefetch items
    (reference utils/data_utils.py:9-47)."""

    _SENTINEL = object()

    def __init__(self, iterable: Iterable, max_prefetch: int = 2):
        self._queue: "queue.Queue" = queue.Queue(max_prefetch)
        self._iterable = iterable
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        try:
            for item in self._iterable:
                self._queue.put(item)
        except BaseException as e:  # surfaced on the consumer thread
            self._err = e
        finally:
            self._queue.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class ThreadedLoader:
    """Sampler -> parallel __getitem__ -> collate -> batch stream.

    dataset: has __len__ and __getitem__(int) -> dict of numpy arrays.
    collate: list-of-samples -> batch dict (defaults to dataset.collate_fn).
    Batch ORDER follows the sampler exactly (results are gathered in order;
    parallelism is within/across batches via the executor pipeline).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        sampler: Optional[ShardedSampler] = None,
        collate: Optional[Callable[[List[Dict]], Dict]] = None,
        num_workers: int = 8,
        drop_last: bool = True,
        prefetch_batches: int = 2,
        shuffle: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler or ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed
        )
        self.collate = collate or getattr(dataset, "collate_fn", None) or _default_collate
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self._pool = ThreadPoolExecutor(max_workers=self.num_workers)

    def set_epoch(self, epoch: int):
        self.sampler.set_epoch(epoch)
        # Datasets draw per-epoch augmentation RNG from their epoch counter
        # (e.g. HTMClipDataset clip jitter/crop/flip — reference
        # end2end/video_loader.py redraws clips each epoch via the loader's
        # worker reseed). Forward so trainers that only see the loader still
        # refresh the dataset's epoch; assignment is idempotent for trainers
        # that also call dataset.set_epoch directly.
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _gen(self) -> Iterator[Dict]:
        pending: "queue.Queue" = queue.Queue()
        window = self.prefetch_batches + 1

        def submit(idx_batch):
            futures = [self._pool.submit(self.dataset.__getitem__, i) for i in idx_batch]
            pending.put(futures)

        batches = list(batched(iter(self.sampler), self.batch_size, self.drop_last))
        ahead = 0
        it = iter(batches)
        for _ in range(min(window, len(batches))):
            submit(next(it))
            ahead += 1
        while ahead:
            futures = pending.get()
            ahead -= 1
            nxt = next(it, None)
            if nxt is not None:
                submit(nxt)
                ahead += 1
            yield self.collate([f.result() for f in futures])

    def __iter__(self) -> Iterator[Dict]:
        return BackgroundIterator(self._gen(), max_prefetch=self.prefetch_batches)


def _default_collate(items: List[Dict]) -> Dict:
    from exoground_tpu.data.collate import collate_dicts

    return collate_dicts(items)


def device_prefetch(batches: Iterable[Dict], size: int = 2, sharding=None):
    """Move batches to device ahead of consumption (double buffering).

    With a sharding (jax.sharding.NamedSharding) the host batch is laid out
    across the mesh's data axis directly; otherwise default device placement.
    JAX dispatch is async, so simply issuing device_put ``size`` batches ahead
    overlaps H2D DMA with the current step.
    """
    import jax

    def put(b):
        arrays = {
            k: v for k, v in b.items() if isinstance(v, np.ndarray) and v.dtype != object
        }
        rest = {k: v for k, v in b.items() if k not in arrays}
        if sharding is not None:
            moved = {k: jax.device_put(v, sharding) for k, v in arrays.items()}
        else:
            moved = {k: jax.device_put(v) for k, v in arrays.items()}
        moved.update(rest)
        return moved

    buf: List[Dict] = []
    it = iter(batches)
    for b in it:
        buf.append(put(b))
        if len(buf) >= size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
