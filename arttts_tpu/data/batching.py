"""Host-side batching for static-shape TPU programs.

The reference pads each batch to its own max length
(`/root/reference/src/data.py:185-207`), which on TPU would recompile per
batch. Here batches pad to a small set of *static buckets* (text and frame
axes independently), so jit caches a handful of executables. Length-grouped
batch ordering replicates the reference samplers
(`voxcommunis/sampler.py:24-97`, `balance_batch.py:101-157`): shuffle
mega-batches of batch_size*50, sort by length inside, emit longest batch
first (OOM early). Per-host sharding for multi-host DP replaces
`DistributedSampler` rank slicing.
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from arttts_tpu.ops.shape import fix_len_compatibility

DEFAULT_TEXT_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512)
DEFAULT_FRAME_BUCKETS = (128, 256, 384, 512, 640, 768, 1024, 1536, 2048)


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return fix_len_compatibility(n)


def pad_batch(
    items: List[Dict[str, np.ndarray]],
    text_buckets: Sequence[int] = DEFAULT_TEXT_BUCKETS,
    frame_buckets: Sequence[int] = DEFAULT_FRAME_BUCKETS,
    min_frames: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Zero-pad a list of {"x", "y"[, extras]} items into one dense batch.

    x: (T_x,) int ids or (T_x, C) float; y: (T_y, C) float.
    `min_frames` lets training guarantee T_y >= out_size for the segment cut.
    Extra per-item keys: "spk" (scalar or vector), "durations" (T_x,).
    """
    B = len(items)
    x_lens = np.array([it["x"].shape[0] for it in items], np.int32)
    y_lens = np.array([it["y"].shape[0] for it in items], np.int32)
    T_x = pick_bucket(int(x_lens.max()), text_buckets)
    frames = int(y_lens.max()) if min_frames is None else max(int(y_lens.max()), min_frames)
    T_y = pick_bucket(fix_len_compatibility(frames), frame_buckets)

    x0 = items[0]["x"]
    if x0.ndim == 1:
        x = np.zeros((B, T_x), dtype=x0.dtype)
    else:
        x = np.zeros((B, T_x, x0.shape[1]), dtype=np.float32)
    y = np.zeros((B, T_y, items[0]["y"].shape[1]), dtype=np.float32)
    batch = {}
    for i, it in enumerate(items):
        x[i, : x_lens[i]] = it["x"]
        y[i, : y_lens[i]] = it["y"]
    batch.update({"x": x, "x_lengths": x_lens, "y": y, "y_lengths": y_lens})

    if "spk" in items[0]:
        batch["spk"] = np.stack([np.asarray(it["spk"]) for it in items])
    if "durations" in items[0]:
        dur = np.zeros((B, T_x), np.float32)
        for i, it in enumerate(items):
            dur[i, : x_lens[i]] = it["durations"]
        batch["durations"] = dur
    return batch


class BucketBatcher:
    """Length-grouped batch index generator with optional per-host sharding.

    mega_batch_mult follows the HF recipe used by the reference samplers:
    shuffle indices, split into mega-batches of batch_size*50, sort each by
    length descending, then move the globally longest batch first.

    Multi-host semantics (num_hosts > 1): every host iterates the SAME
    global batch sequence (identical seed/epoch -> identical order) and
    yields its contiguous `batch_size / num_hosts` row slice of each global
    batch. The host slices are the process-local rows that
    `parallel.mesh.assemble_global_batch` stitches into one globally-sharded
    array (`jax.make_array_from_process_local_data`) — NOT independent
    batches per host (the round-1 scheme, which silently trained each host
    on different data). Replaces the reference's rank slicing of one epoch
    order (`src/balance_batch.py:144-151`).
    """

    def __init__(
        self,
        lengths: Sequence[int],
        batch_size: int,
        shuffle: bool = True,
        seed: int = 37,
        mega_batch_mult: Optional[int] = None,
        host_id: int = 0,
        num_hosts: int = 1,
        drop_last: bool = True,
    ):
        self.lengths = np.asarray(lengths)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.mega_batch_mult = mega_batch_mult or min(
            len(lengths) // (batch_size * 4), 50
        ) or 1
        assert batch_size % num_hosts == 0, (
            f"global batch_size {batch_size} must divide over {num_hosts} hosts"
        )
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.drop_last = drop_last
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __iter__(self) -> Iterator[np.ndarray]:
        n = len(self.lengths)
        rng = np.random.default_rng(self.seed + self.epoch)
        order = rng.permutation(n) if self.shuffle else np.arange(n)

        mega = self.batch_size * self.mega_batch_mult
        grouped: List[np.ndarray] = []
        for i in range(0, n, mega):
            chunk = order[i : i + mega]
            chunk = chunk[np.argsort(-self.lengths[chunk], kind="stable")]
            grouped.append(chunk)
        indices = np.concatenate(grouped) if grouped else np.empty(0, np.int64)

        batches = [
            indices[i : i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches = batches[:-1]
        if len(batches) > 1:
            # put the longest batch first so OOMs surface immediately
            longest = max(
                range(len(batches)), key=lambda b: self.lengths[batches[b]].max()
            )
            batches[0], batches[longest] = batches[longest], batches[0]
        # multi-host DP: every host walks the same global batches and keeps
        # its contiguous row slice (see class docstring)
        rows = self.batch_size // self.num_hosts
        lo, hi = self.host_id * rows, (self.host_id + 1) * rows
        for b in batches:
            if self.num_hosts == 1:
                yield b
            elif len(b) == self.batch_size:  # partial batches can't slice evenly
                yield b[lo:hi]

    def __len__(self) -> int:
        return (
            len(self.lengths) // self.batch_size
            if self.drop_last
            else math.ceil(len(self.lengths) / self.batch_size)
        )


class DataLoader:
    """Minimal host loader: dataset + BucketBatcher + pad_batch.

    `prefetch > 0` assembles upcoming batches on a background thread (a
    bounded queue) so host-side featurization overlaps device steps — the
    TPU equivalent of the reference's DataLoader worker processes."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 37,
        min_frames: Optional[int] = None,
        host_id: int = 0,
        num_hosts: int = 1,
        length_grouped: bool = True,
        prefetch: int = 2,
        language_upsample: Optional[float] = None,
        text_bucket: Optional[int] = None,
        frame_bucket: Optional[int] = None,
    ):
        """`language_upsample` enables temperature-based language upsampling
        (p ~ size^factor) for multilingual datasets exposing `lang_sizes`
        (ref train_v6.py:100-125, upsample_factor=0.5).

        Multi-host (num_hosts > 1) REQUIRES fixed `text_bucket`/`frame_bucket`
        pad shapes: each host pads only its local rows, so data-dependent
        bucket picks would disagree across hosts and deadlock the SPMD step."""
        self.dataset = dataset
        if num_hosts > 1 and not (text_bucket and frame_bucket):
            raise ValueError(
                "multi-host DataLoader needs fixed text_bucket/frame_bucket "
                "(e.g. config.data.max_text_len/max_frame_len)"
            )
        self._text_buckets = (text_bucket,) if text_bucket else DEFAULT_TEXT_BUCKETS
        self._frame_buckets = (
            (frame_bucket,) if frame_bucket else DEFAULT_FRAME_BUCKETS
        )
        lengths = dataset.lengths() if length_grouped else np.zeros(len(dataset))
        self.batcher = BucketBatcher(
            lengths,
            batch_size,
            shuffle=shuffle,
            seed=seed,
            host_id=host_id,
            num_hosts=num_hosts,
        )
        self.batch_size = batch_size
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.lang_sampler = None
        if language_upsample is not None:
            from arttts_tpu.voxcommunis.sampler import (
                LengthGroupedLanguageUpSampler,
            )

            assert getattr(dataset, "lang_sizes", None), (
                "language_upsample needs a dataset with lang_sizes"
            )
            self.lang_sampler = LengthGroupedLanguageUpSampler(
                batch_size,
                lengths,
                dataset.lang_sizes,
                upsample_factor=language_upsample,
                seed=seed,
            )
        self.min_frames = min_frames
        self.prefetch = prefetch

    def set_epoch(self, epoch: int):
        self.batcher.set_epoch(epoch)

    def _make_batch(self, idx):
        items = [self.dataset[int(i)] for i in idx]
        return pad_batch(
            items,
            text_buckets=self._text_buckets,
            frame_buckets=self._frame_buckets,
            min_frames=self.min_frames,
        )

    def _index_batches(self):
        if self.lang_sampler is not None:
            order = np.fromiter(iter(self.lang_sampler), dtype=np.int64)
            batches = [
                order[i : i + self.batch_size]
                for i in range(0, len(order) - self.batch_size + 1, self.batch_size)
            ]
            if self.num_hosts > 1:  # same global batches, per-host row slice
                rows = self.batch_size // self.num_hosts
                lo = self.host_id * rows
                return [b[lo : lo + rows] for b in batches]
            return batches
        return self.batcher

    def __iter__(self):
        if self.prefetch <= 0:
            for idx in self._index_batches():
                yield self._make_batch(idx)
            return

        import queue
        import threading

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for idx in self._index_batches():
                    q.put(self._make_batch(idx))
            except BaseException as e:  # surface worker errors to the consumer
                q.put(e)
                return
            q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item

    def __len__(self):
        return len(self.batcher)
