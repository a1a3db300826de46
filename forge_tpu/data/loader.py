"""Batching loader with background prefetch.

TPU-native replacement for the reference's torch DataLoader + DistributedSampler
(kubric_train_joint.py:128-144): a plain-python dataset is batched on the host,
optionally sharded per process (for multi-host: each process loads
`indices[process_index::process_count]`), and prefetched on a thread so host IO
overlaps device steps. Device placement happens in the train loop via
`parallel.shard_batch` (the global batch is laid out across the mesh by jit).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


def collate(samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack a list of sample dicts; string fields become lists."""
    out: Dict = {}
    for k in samples[0]:
        v0 = samples[0][k]
        if isinstance(v0, str):
            out[k] = [s[k] for s in samples]
        else:
            out[k] = np.stack([s[k] for s in samples])
    return out


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed shuffling per epoch (reference: DistributedSampler.set_epoch,
        kubric_train_pose_3D.py:152)."""
        self.epoch = epoch

    def _indices(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        return idx[self.process_index:: self.process_count]

    def __len__(self) -> int:
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        batches = [
            indices[i: i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()

        def worker():
            try:
                for b in batches:
                    item = collate([self.dataset[i] for i in b])
                    while not abandoned.is_set():
                        try:
                            q.put(item, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if abandoned.is_set():
                        return
            except BaseException as e:  # surface dataset errors to the consumer
                while not abandoned.is_set():
                    try:
                        q.put(e, timeout=0.5)
                        return
                    except queue.Full:
                        continue
            else:
                while not abandoned.is_set():
                    try:
                        q.put(stop, timeout=0.5)
                        return
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # consumer abandoned the iterator (early break / GC): unblock and
            # retire the worker instead of leaking it on a full queue
            abandoned.set()


class DeviceCachedLoader(Loader):
    """Loader variant that keeps every sample resident on the device and
    stacks batches ON DEVICE.

    The hosted relay's host->device tunnel moves ~7 MB/s; re-uploading a
    ~40 MB batch every step dominated training epochs. For small synthetic
    datasets (32 scenes x 10 views at 256^2 is ~420 MB, far under HBM) each
    scene is device_put ONCE and per-epoch shuffled batches are assembled by
    a jitted stack — zero per-step host->device traffic.

    Yields dicts of device arrays (plus 'seq_name' string lists); works with
    the standard trainer (shard_batch on device arrays is a device-local
    relayout).
    """

    def __init__(self, *args, compact: Optional[bool] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self._device_samples = None
        self._names = None
        self._stack = None
        if compact is None:
            env = os.environ.get("FORGE_DEVICE_LOADER_COMPACT", "auto")
            if env in ("0", "1"):
                compact = env == "1"
            else:
                # auto: f32 residency is ~13 MB/scene at 256^2x10; compact
                # when the f32 cache would crowd training's HBM arena
                compact = len(self.dataset) > 160
        self.compact = compact

    def _encode(self, s: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Lossy-but-faithful residency compression (~3.2x): images and
        masks as uint8 (the same 1/255 granularity real PNG data has),
        depths as float16. Poses/intrinsics stay f32. Decoded back to f32
        on device at batch-stack time."""
        if not self.compact:
            return s
        out = {}
        for k, v in s.items():
            if k in ("images", "fg_probabilities"):
                out[k] = np.clip(np.rint(v * 255.0), 0, 255).astype(np.uint8)
            elif k == "depths":
                out[k] = v.astype(np.float16)
            else:
                out[k] = v
        return out

    def _ensure_device(self):
        if self._device_samples is not None:
            return
        import jax
        import jax.numpy as jnp

        samples = []
        names = []
        for i in range(len(self.dataset)):
            s = self.dataset[i]
            names.append(s.get("seq_name", str(i)))
            samples.append(jax.device_put(self._encode(
                {k: v for k, v in s.items() if isinstance(v, np.ndarray)})))
        self._device_samples = samples
        self._names = names

        def stack_fn(*ss):
            st = jax.tree.map(lambda *xs: jnp.stack(xs), *ss)
            if not self.compact:
                return st
            dec = {}
            for k, v in st.items():
                if v.dtype == jnp.uint8:
                    dec[k] = v.astype(jnp.float32) / 255.0
                elif v.dtype == jnp.float16:
                    dec[k] = v.astype(jnp.float32)
                else:
                    dec[k] = v
            return dec

        self._stack = jax.jit(stack_fn)

    def __iter__(self):
        self._ensure_device()
        indices = self._indices()
        batches = [
            indices[i: i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        for b in batches:
            out = dict(self._stack(*[self._device_samples[i] for i in b]))
            out["seq_name"] = [self._names[i] for i in b]
            yield out
