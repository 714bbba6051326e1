"""Host-side batched clip loading with device prefetch.

Replaces the reference's rosny process pool + CUDA-IPC queues
(``/root/reference/src/data_loaders/``). Decode runs in a thread pool —
OpenCV/FFmpeg releases the GIL, so threads give process-pool throughput
without spawn/IPC overhead — and finished samples are collated in completion
order, exactly like the reference's unordered result queue
(``base_data_loader.py:52-63``). ``prefetch_to_device`` overlaps host decode
of batch N+1/N+2 with device compute of batch N via async ``device_put``
(the TPU analog of the reference's decode-ahead workers).

Each worker thread keeps a per-video ``FrameSource`` cache so the sequential
decoder state survives across samples (the reference reopens the codec per
sample, ``datasets.py:75-82`` — measurably wasteful; the sequential val
loader ``sequential.py`` existed to avoid exactly that).
"""

from __future__ import annotations

import collections
import queue
import threading
from typing import Iterator, Optional

import numpy as np

from ball_action_spotting_tpu.data.dataset import ClipDataset


class ClipLoader:
    """Iterable over collated (frames uint8 (B,T,H,W), targets f32 (B,C))."""

    def __init__(
        self,
        dataset: ClipDataset,
        batch_size: int,
        num_workers: int = 4,
        drop_last: bool = False,
        source_cache_size: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.source_cache_size = source_cache_size

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _worker(self, index_q, result_q, epoch, stop_event):
        local = collections.OrderedDict()  # video_path -> FrameSource

        def get_source(video_index):
            data = self.dataset.videos_data[video_index]
            path = data["video_path"]
            src = local.get(path)
            if src is None:
                src = self.dataset.source_factory(data)
                local[path] = src
                if len(local) > self.source_cache_size:
                    _, old = local.popitem(last=False)
                    old.close()
            return src

        try:
            while not stop_event.is_set():
                try:
                    index = index_q.get_nowait()
                except queue.Empty:
                    break
                video_index, frame_indexes = self.dataset.get_video_frame_indexes(
                    index, epoch
                )
                src = get_source(video_index)
                frames = src.fetch_frames(frame_indexes)
                targets = self.dataset.get_targets(video_index, frame_indexes)
                if self.dataset.image_size is not None:
                    from ball_action_spotting_tpu.data.dataset import pad_frames

                    frames = pad_frames(frames, self.dataset.image_size)
                target = self.dataset.target_process_fn(targets).astype(np.float32)
                result_q.put((frames, target))
        except Exception as exc:  # surface worker crashes to the consumer
            result_q.put(exc)
        finally:
            for src in local.values():
                src.close()
            result_q.put(None)  # worker-done sentinel

    def epoch(self, epoch: int = 0) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        n = len(self.dataset)
        index_q: queue.Queue = queue.Queue()
        for i in range(n):
            index_q.put(i)
        result_q: queue.Queue = queue.Queue(maxsize=4 * self.batch_size)
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
            buf_frames, buf_targets = [], []
            received = 0
            while received < n and done_workers < self.num_workers:
                item = result_q.get()
                if item is None:
                    done_workers += 1
                    continue
                if isinstance(item, Exception):
                    raise item
                frames, target = item
                received += 1
                buf_frames.append(frames)
                buf_targets.append(target)
                if len(buf_frames) == self.batch_size:
                    yield np.stack(buf_frames), np.stack(buf_targets)
                    buf_frames, buf_targets = [], []
            if buf_frames and not self.drop_last:
                yield np.stack(buf_frames), np.stack(buf_targets)
        finally:
            stop_event.set()

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
    """
    import jax

    buf = collections.deque()

    def put(batch):
        if sharding is not None:
            return jax.device_put(batch, sharding)
        return jax.device_put(batch)

    for batch in iterator:
        buf.append(put(batch))
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
