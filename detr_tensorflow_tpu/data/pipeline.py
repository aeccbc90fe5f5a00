"""tf.data-free host input pipeline.

The reference funnels everything through ``tf.data`` +
``tf.numpy_function`` (SURVEY.md §2.2) — a host-Python boundary per
image. Here the pipeline is an explicit, dependency-free prefetching
iterator: a thread pool decodes/augments images concurrently while a
bounded queue keeps batches ready for the accelerator. The device never
waits on Python between steps as long as the pool keeps up.

Every batch is a dict of stacked numpy arrays in the native target
layout (see data/processing.py): images, boxes, classes, mask — static
shapes, ready for ``jax.device_put`` onto a sharded mesh.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Sequence

import numpy as np


def stack_batch(examples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    keys = examples[0].keys()
    return {k: np.stack([e[k] for e in examples], axis=0) for k in keys}


class WorkerRNG:
    """Per-thread numpy Generators with independent spawned streams.

    numpy Generators are not thread-safe: sharing one across a
    ThreadPoolExecutor's decode/augment workers races on internal state,
    yielding correlated or corrupted draws. Each worker thread lazily
    receives its own Generator spawned from a single SeedSequence
    (``spawn`` itself guarded by a lock).
    """

    def __init__(self, seed: int = 0):
        self._seq = np.random.SeedSequence(seed)
        self._lock = threading.Lock()
        self._tls = threading.local()

    def get(self) -> np.random.Generator:
        rng = getattr(self._tls, "rng", None)
        if rng is None:
            with self._lock:
                child = self._seq.spawn(1)[0]
            rng = np.random.default_rng(child)
            self._tls.rng = rng
        return rng


class HostDataset:
    """Index-based dataset with shuffling, filtering, batching, prefetch.

    Args:
      indices: the example keys (any list; passed to load_fn).
      load_fn: index -> example dict, or None to drop the example
        (the reference's ``dataset.filter`` for crowd/empty images,
        data/coco.py:118).
      batch_size: examples per batch; incomplete final batches dropped
        (``drop_remainder=True`` parity, data/coco.py:123 — and a static
        batch dim for XLA).
      shuffle: reshuffle indices each epoch.
      num_workers: decode/augment threads.
      prefetch: max ready batches buffered ahead.
      bucket_key: optional example -> hashable key. When set, batches
        are assembled per key (a batch holds ``batch_size`` examples
        with equal keys) — the multi-scale training pipeline keys on
        the image shape so every emitted batch is one static shape and
        XLA caches one program per shape. Per-bucket remainders are
        dropped at epoch end (the drop_remainder rule, applied per
        bucket). Bucketing reorders examples across buckets; within a
        bucket, arrival order is preserved.
      batch_transform: optional ``(batch_dict, batch_index) -> batch_dict``
        applied to each assembled batch before it is queued; batch_index
        counts emitted batches from 0 across the dataset's lifetime
        (continuing across epochs). Used by multi-host multi-scale
        training to resize batch ``i`` to a host-agnostic rung schedule
        (data/multiscale.py).
      pad_remainder: instead of dropping per-bucket remainders, pad the
        final partial batch of each bucket to ``batch_size`` by
        repeating its last example, and add a ``batch_valid`` (B,) bool
        key to EVERY batch (False on padded slots). Keeps the batch dim
        static for XLA while evaluating every example exactly once —
        the batched-eval mode (eval.py --batch N).
      image_dtype: optional numpy-compatible dtype name for the batch's
        ``images`` array (e.g. ``"bfloat16"``). When the model computes
        in bf16 its first op casts the image anyway, so casting on the
        HOST is numerically identical (both are round-to-nearest) while
        halving the host->device image bytes and deleting the in-step
        f32->bf16 convert (measured 0.88 ms of the b8 376x672 train
        step at 41 GB/s — docs/performance.md round 4). Applied after
        ``batch_transform`` (whose cv2 resizes need a cv2-native
        dtype). ``None``/``"float32"`` = no cast.
    """

    def __init__(
        self,
        indices: Sequence,
        load_fn: Callable,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        prefetch: int = 8,
        collate_fn: Callable = stack_batch,
        bucket_key: Callable = None,
        batch_transform: Callable = None,
        on_epoch_start: Callable = None,
        pad_remainder: bool = False,
        image_dtype: str = None,
    ):
        self.indices = list(indices)
        self.load_fn = load_fn
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self.bucket_key = bucket_key
        self.batch_transform = batch_transform
        self.on_epoch_start = on_epoch_start
        self.pad_remainder = pad_remainder
        self._image_dtype = None
        if image_dtype not in (None, "float32"):
            import ml_dtypes  # numpy bf16 comes from jax's own dep

            self._image_dtype = (
                np.dtype(ml_dtypes.bfloat16)
                if image_dtype == "bfloat16" else np.dtype(image_dtype)
            )
        self._emitted = 0  # lifetime batch counter for batch_transform
        self._epoch = 0
        self._rng = np.random.default_rng(seed)

    def _cast_images(self, batch: Dict) -> Dict:
        """Final ``images`` dtype cast (see ``image_dtype``); runs in
        the producer thread, overlapped with device compute."""
        if self._image_dtype is not None and "images" in batch:
            batch = dict(batch)
            batch["images"] = batch["images"].astype(self._image_dtype)
        return batch

    def __len__(self) -> int:
        """Upper bound on batches per epoch: ``load_fn`` may filter
        examples (return None), shrinking the true count — the same
        unknown-cardinality-after-filter caveat as ``tf.data``."""
        return len(self.indices) // self.batch_size

    def _epoch_indices(self) -> List:
        idx = list(self.indices)
        if self.shuffle:
            perm = self._rng.permutation(len(idx))
            idx = [idx[i] for i in perm]
        return idx

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.on_epoch_start is not None:
            # e.g. MultiScalePlan.set_epoch — per-epoch deterministic
            # rung re-draws (data/multiscale.py).
            self.on_epoch_start(self._epoch)
        self._epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=max(1, self.prefetch))
        stop = threading.Event()

        def safe_put(item) -> bool:
            """Put without deadlocking if the consumer abandoned the
            iterator (e.g. an eval loop breaking early)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # A load_fn/collate failure must surface in the consumer, not
            # silently truncate the epoch: capture it and ship it through
            # the queue, where __iter__ re-raises it.
            error = None
            try:
                # Sliding submission window: ThreadPoolExecutor.map has no
                # backpressure (it enqueues the whole epoch and decoded
                # examples pile up faster than the consumer drains them on
                # large datasets). Keep at most window_size loads in
                # flight; results are consumed in order.
                import collections

                window_size = max(2 * self.num_workers, self.batch_size)
                epoch = iter(self._epoch_indices())
                with ThreadPoolExecutor(self.num_workers) as pool:
                    in_flight = collections.deque()
                    for _ in range(window_size):
                        idx = next(epoch, None)
                        if idx is None:
                            break
                        in_flight.append(pool.submit(self.load_fn, idx))
                    # One pending list per bucket (a single None bucket
                    # when bucket_key is unset).
                    pending: Dict = {}
                    while in_flight:
                        if stop.is_set():
                            return
                        ex = in_flight.popleft().result()
                        idx = next(epoch, None)
                        if idx is not None:
                            in_flight.append(pool.submit(self.load_fn, idx))
                        if ex is None:
                            continue
                        key = self.bucket_key(ex) if self.bucket_key else None
                        bucket = pending.setdefault(key, [])
                        bucket.append(ex)
                        if len(bucket) == self.batch_size:
                            batch = self.collate_fn(bucket)
                            if self.pad_remainder:
                                batch["batch_valid"] = np.ones(
                                    self.batch_size, bool
                                )
                            if self.batch_transform is not None:
                                batch = self.batch_transform(
                                    batch, self._emitted
                                )
                                self._emitted += 1
                            if not safe_put(self._cast_images(batch)):
                                return
                            pending[key] = []
                    if self.pad_remainder:
                        # Flush per-bucket remainders, padded to the
                        # static batch size by repeating the last
                        # example; batch_valid masks the padding out.
                        for key, bucket in pending.items():
                            n = len(bucket)
                            if n == 0:
                                continue
                            padded = bucket + [bucket[-1]] * (
                                self.batch_size - n
                            )
                            batch = self.collate_fn(padded)
                            batch["batch_valid"] = (
                                np.arange(self.batch_size) < n
                            )
                            if self.batch_transform is not None:
                                batch = self.batch_transform(
                                    batch, self._emitted
                                )
                                self._emitted += 1
                            if not safe_put(self._cast_images(batch)):
                                return
                    # else: drop remainder per bucket (static shapes,
                    # drop_remainder=True parity)
            except BaseException as e:  # noqa: BLE001 — relayed to consumer
                error = e
            finally:
                try:
                    out_q.put(error, timeout=1.0)
                except queue.Full:
                    pass

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # Drain so the producer can finish putting.
            while not out_q.empty():
                try:
                    out_q.get_nowait()
                except queue.Empty:  # pragma: no cover
                    break


def prefetch_to_device(iterator, sharding=None, depth: int = 2):
    """Overlap host->device transfer with compute: keeps ``depth`` batches
    already on device (optionally sharded over a mesh)."""
    import collections

    import jax

    buf = collections.deque()
    for batch in iterator:
        if sharding is not None:
            batch = jax.device_put(batch, sharding)
        else:
            batch = jax.device_put(batch)
        buf.append(batch)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
