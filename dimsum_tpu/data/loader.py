"""Threaded, device-feeding data loader.

Replaces torch's multiprocess DataLoader + DistributedSampler
(`/root/reference/dimsum/train.py:256-268`) with a TPU-native pipeline:
worker threads assemble numpy batches, a small queue keeps the host ahead
of the device, and batches are (optionally) placed on the mesh with the
data-parallel sharding so the device never waits on host IO.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np


class Loader:
    """Shuffling epoch-based loader yielding (x, y) numpy batches.

    shard_id/num_shards implement the DistributedSampler contract for
    multi-host setups (each host loads only its slice).
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 shard_id: int = 0, num_shards: int = 1,
                 num_workers: int = 4, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100_003 + self.epoch)
            rng.shuffle(idx)
        # shard for multi-host: contiguous stripes after the shuffle
        per = n // self.num_shards
        idx = idx[self.shard_id * per: (self.shard_id + 1) * per]
        if self.drop_last:
            nb = len(idx) // self.batch_size
            idx = idx[: nb * self.batch_size]
        return idx

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator:
        idx = self._epoch_indices()
        batches = [idx[i: i + self.batch_size]
                   for i in range(0, len(idx), self.batch_size)]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        job_q: "queue.Queue" = queue.Queue()
        results = {}
        results_lock = threading.Lock()
        results_cv = threading.Condition(results_lock)

        for i, b in enumerate(batches):
            job_q.put((i, b))

        def worker():
            while True:
                try:
                    i, b = job_q.get_nowait()
                except queue.Empty:
                    return
                if hasattr(self.dataset, "gather"):
                    batch = self.dataset.gather(b)
                else:
                    xs, ys = zip(*(self.dataset[int(j)] for j in b))
                    batch = (np.stack(xs), np.asarray(ys, np.int64))
                with results_cv:
                    results[i] = batch
                    results_cv.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        for i in range(len(batches)):
            with results_cv:
                while i not in results:
                    results_cv.wait()
                yield results.pop(i)


def device_put_sharded_batch(batch, mesh=None):
    """Place a host batch on the device(s); with a mesh, shard the leading
    axis over 'data'.

    Multi-process: each process passes the rows ITS Loader stripe produced
    (global_batch / process_count of them); the pieces assemble into one
    global array along 'data' in process order."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    x, y = batch
    if mesh is None:
        return jax.device_put(x), jax.device_put(y)
    if jax.process_count() > 1:
        from dimsum_tpu.parallel.mesh import host_local_to_global

        return host_local_to_global(mesh, P("data"), x, y)
    sx = NamedSharding(mesh, P("data"))
    return jax.device_put(x, sx), jax.device_put(y, sx)
