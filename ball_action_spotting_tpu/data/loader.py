"""Host-side batched clip loading with device prefetch.

Replaces the reference's rosny process pool + CUDA-IPC queues
(``/root/reference/src/data_loaders/``). Decode runs in a thread pool —
OpenCV/FFmpeg and the native gray-store gather release the GIL — and
workers assemble WHOLE batches in place into pooled, reused uint8 buffers:
per-sample ``np.stack`` collation costs more than the decode itself on TPU
hosts (fresh 56 MB allocations page-fault at <1 GB/s), so frames are written
exactly once, directly at their padded position in the batch.

Batches complete in whichever order workers finish, like the reference's
unordered result queue (``base_data_loader.py:52-63``).

Buffer lifetime: yielded arrays are views of a rotating per-worker pool and
remain valid for at least ``POOL_DEPTH - queue capacity`` further iterations
— consume (e.g. ``jax.device_put`` via ``prefetch_to_device``) before
iterating on, or copy. ``copy_out=True`` opts into fresh arrays. The
contract is enforced two ways: yielded views are read-only (mutating a
pooled buffer would corrupt a later batch), and setting
``BAS_TPU_LOADER_POISON=1`` fills every reused slot with 0xAB at acquire so
stale-view reads fail loudly in tests instead of silently training on a
newer batch's pixels.

``prefetch_to_device`` overlaps host assembly of batch N+1/N+2 with device
compute of batch N via async ``device_put`` (the TPU analog of the
reference's decode-ahead worker pool).
"""

from __future__ import annotations

import collections
import os
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ball_action_spotting_tpu.data.dataset import ClipDataset

POOL_DEPTH = 4
RESULT_QUEUE_BATCHES = 2


def _poison_enabled() -> bool:
    return os.environ.get("BAS_TPU_LOADER_POISON", "0") == "1"


class _BufferPool:
    """Rotating (frames, targets) batch buffers, zeroed on first use."""

    def __init__(self, batch_size: int, clip_len: int, height: int, width: int,
                 num_classes: int):
        self.frames = [
            np.zeros((batch_size, clip_len, height, width), np.uint8)
            for _ in range(POOL_DEPTH)
        ]
        self.targets = [
            np.zeros((batch_size, num_classes), np.float32)
            for _ in range(POOL_DEPTH)
        ]
        # last written native (h, w) per (slot, batch position): the padded
        # border only needs re-zeroing when the source resolution changes
        self.written: list[list[Optional[tuple[int, int]]]] = [
            [None] * batch_size for _ in range(POOL_DEPTH)
        ]
        self._next = 0

    def acquire(self):
        slot = self._next
        self._next = (self._next + 1) % POOL_DEPTH
        if _poison_enabled():
            # make stale views of this slot visibly wrong (debug aid);
            # (-1, -1) forces the writer's border re-zero for every sample
            # (None would skip it and leave 0xAB in the padding)
            self.frames[slot].fill(0xAB)
            self.targets[slot].fill(np.float32(-1e9))
            self.written[slot] = [(-1, -1)] * len(self.written[slot])
        return slot, self.frames[slot], self.targets[slot], self.written[slot]


class ClipLoader:
    """Iterable over (frames uint8 (B,T,H,W), targets f32 (B,C)) batches."""

    def __init__(
        self,
        dataset: ClipDataset,
        batch_size: int,
        num_workers: int = 4,
        drop_last: bool = False,
        source_cache_size: int = 4,
        copy_out: bool = False,
        ordered: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.source_cache_size = source_cache_size
        self.copy_out = copy_out
        # ordered=True yields batches in index order regardless of worker
        # completion order → bitwise-reproducible training runs at any
        # worker count (batch CONTENT is always deterministic either way)
        self.ordered = ordered

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    # --- worker side ---------------------------------------------------

    def _clip_len(self) -> int:
        return self.dataset.indexes_generator.size

    def _image_hw(self) -> tuple[int, int]:
        if self.dataset.image_size is not None:
            w, h = self.dataset.image_size
            return h, w
        v = self.dataset.videos_data[0]
        return v["height"], v["width"]

    def _worker(self, index_q, result_q, epoch, stop_event):
        ds = self.dataset
        height, width = self._image_hw()
        pool = _BufferPool(
            self.batch_size, self._clip_len(), height, width,
            len(ds.classes) if hasattr(ds, "classes") else ds.target_process_fn(
                ds.get_targets(0, [0])
            ).shape[-1],
        )
        local = collections.OrderedDict()  # video_path -> FrameSource

        def get_source(video_index):
            data = ds.videos_data[video_index]
            path = data["video_path"]
            src = local.get(path)
            if src is None:
                src = ds.source_factory(data)
                local[path] = src
                if len(local) > self.source_cache_size:
                    _, old = local.popitem(last=False)
                    old.close()
            return src

        try:
            while not stop_event.is_set():
                try:
                    batch_id, chunk = index_q.get_nowait()
                except queue.Empty:
                    break
                _, frames_buf, targets_buf, written = pool.acquire()
                for j, index in enumerate(chunk):
                    video_index, frame_indexes = ds.get_video_frame_indexes(
                        index, epoch
                    )
                    src = get_source(video_index)
                    vdata = ds.videos_data[video_index]
                    h, w = vdata["height"], vdata["width"]
                    top = (height - h) // 2
                    left = (width - w) // 2
                    if written[j] != (h, w):
                        if written[j] is not None:
                            frames_buf[j] = 0
                        written[j] = (h, w)
                    view = frames_buf[j][:, top : top + h, left : left + w]
                    src.fetch_frames_into(frame_indexes, view)
                    targets = ds.get_targets(video_index, frame_indexes)
                    targets_buf[j] = ds.target_process_fn(targets)
                k = len(chunk)
                # read-only views: a consumer mutating a pooled buffer
                # would silently corrupt a later batch
                fv, tv = frames_buf[:k], targets_buf[:k]
                fv.flags.writeable = False
                tv.flags.writeable = False
                result_q.put((batch_id, fv, tv))
        except Exception as exc:  # surface worker crashes to the consumer
            result_q.put(exc)
        finally:
            for src in local.values():
                src.close()
            try:
                result_q.put_nowait(None)  # worker-done sentinel
            except queue.Full:
                pass  # consumer already has enough to finish by count

    # --- consumer side ---------------------------------------------------

    def epoch(self, epoch: int = 0) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        index_q: queue.Queue = queue.Queue()
        num_batches = 0
        for start in range(0, n, self.batch_size):
            chunk = list(range(start, min(start + self.batch_size, n)))
            if self.drop_last and len(chunk) < self.batch_size:
                break
            index_q.put((num_batches, chunk))
            num_batches += 1
        result_q: queue.Queue = queue.Queue(maxsize=RESULT_QUEUE_BATCHES)
        stop_event = threading.Event()
        workers = [
            threading.Thread(
                target=self._worker,
                args=(index_q, result_q, epoch, stop_event),
                daemon=True,
            )
            for _ in range(self.num_workers)
        ]
        for w in workers:
            w.start()

        try:
            done_workers = 0
            received = 0
            next_emit = 0
            held: dict[int, tuple] = {}  # ordered-mode reorder buffer
            while received < num_batches and done_workers < self.num_workers:
                item = result_q.get()
                if item is None:
                    done_workers += 1
                    continue
                if isinstance(item, Exception):
                    raise item
                batch_id, frames, targets = item
                received += 1
                if self.copy_out or (self.ordered and batch_id != next_emit):
                    # held batches outlive their pool slot window → copy
                    frames, targets = frames.copy(), targets.copy()
                if not self.ordered:
                    yield frames, targets
                    continue
                held[batch_id] = (frames, targets)
                while next_emit in held:
                    yield held.pop(next_emit)
                    next_emit += 1
            while self.ordered and next_emit in held:
                yield held.pop(next_emit)
                next_emit += 1
        finally:
            stop_event.set()
            # drain so workers blocked on a full result queue can exit
            for _ in range(self.num_workers * (RESULT_QUEUE_BATCHES + 2)):
                if not any(w.is_alive() for w in workers):
                    break
                try:
                    result_q.get(timeout=0.05)
                except queue.Empty:
                    pass

    def __iter__(self):
        return self.epoch(0)


def prefetch_to_device(
    iterator: Iterator,
    sharding=None,
    size: int = 2,
) -> Iterator:
    """Move batches to device ahead of consumption (double-buffering).

    With a ``NamedSharding``, each batch is laid out across the mesh's data
    axis as it lands, so the jitted step never blocks on host transfer.
    ``device_put`` also copies the loader's pooled buffers out immediately,
    making buffer reuse safe.

    Multi-host: when the sharding spans devices of other processes (a pod
    mesh — ``parallel/multihost.py``), each process's batch is its
    process-LOCAL rows of the global batch, assembled via
    ``jax.make_array_from_process_local_data`` instead of ``device_put``.
    """
    import jax

    buf = collections.deque()
    multihost = sharding is not None and not sharding.is_fully_addressable

    def put(batch):
        if multihost:
            return jax.tree.map(
                lambda a: jax.make_array_from_process_local_data(sharding, a),
                batch,
            )
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
