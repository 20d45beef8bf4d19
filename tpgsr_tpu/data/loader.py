"""Host-side input pipeline: shuffling, batching, threaded prefetch.

Replaces the reference's torch DataLoader (interfaces/base.py:250-255,
workers=1).  Design: a background thread pool decodes+collates batches ahead
of the training step so host preprocessing overlaps TPU compute; optionally
pads the final partial batch (eval) and shards batches across a mesh's data
axis via ``jax.device_put`` with a NamedSharding.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Callable, Dict, Iterator, Optional

import numpy as np


class DataLoader:
    """Iterates dicts of numpy arrays (see tpgsr_tpu.data.collate).

    ``num_workers=0`` (default) decodes+collates on background *threads* —
    right for single-core hosts, where process fan-out only adds IPC cost.
    ``num_workers>0`` starts that many PERSISTENT worker *processes*
    (torch-DataLoader style): decode/resize are GIL-serialized in CPython,
    so on multi-core TPU hosts process workers are the only way to scale
    the host pipeline past ~2k img/s.  The pool lives across epochs (each
    worker's decode RAM cache keeps warming), uses a forkserver/spawn
    context (safe with live JAX threads), and reseeds each worker's
    dataset RNGs per epoch with base_seed+worker_id.  Batches come back
    over pipes as pickled numpy arrays (a few MB each).

    Multi-host (``shard_count > 1``, DistributedSampler-style): every host
    runs the identical seeded shuffle, then each takes its CONTIGUOUS
    ``batch_size/shard_count`` slice of every global batch — hosts yield
    disjoint rows whose concatenation (in process order, exactly how
    ``host_local_batch_to_global`` lays out the global array) reproduces the
    single-host batch.  ``batch_size`` stays the GLOBAL batch size.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        prefetch: int = 4,
        num_threads: int = 2,
        num_workers: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)
        self.num_workers = max(0, num_workers)
        self.shard_index = shard_index
        self.shard_count = max(1, shard_count)
        if self.shard_count > 1:
            if batch_size % self.shard_count:
                raise ValueError(
                    f"global batch_size {batch_size} must divide evenly over "
                    f"{self.shard_count} processes"
                )
            if not drop_last:
                raise ValueError(
                    "shard_count > 1 requires drop_last=True (a partial "
                    "final batch cannot be split evenly across hosts; eval "
                    "paths shard inside evaluate() instead)"
                )
        self._epoch = 0
        # persistent worker pool state (num_workers > 0)
        self._procs: list = []
        self._task_qs: list = []
        self._out_q = None
        self._outstanding = 0  # results still owed by the pool

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        end = (n // self.batch_size) * self.batch_size if self.drop_last else n
        local = self.batch_size // self.shard_count
        for s in range(0, end, self.batch_size):
            b = idx[s : s + self.batch_size]
            if self.shard_count > 1:
                b = b[self.shard_index * local : (self.shard_index + 1) * local]
            yield b

    def __iter__(self) -> Iterator[Dict]:
        self._epoch += 1
        batches = list(self._batch_indices())
        if self.num_workers > 0:
            yield from self._iter_processes(batches)
            return
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        in_q: "queue.Queue" = queue.Queue()
        for i, b in enumerate(batches):
            in_q.put((i, b))
        results: Dict[int, Dict] = {}
        lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                try:
                    i, b = in_q.get_nowait()
                except queue.Empty:
                    return
                items = [self.dataset[int(j)] for j in b]
                batch = self.collate_fn(items)
                out_q.put((i, batch))

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self.num_threads)]
        for t in threads:
            t.start()
        try:
            next_emit = 0
            received = 0
            while next_emit < len(batches):
                while next_emit not in results:
                    i, batch = out_q.get()
                    results[i] = batch
                    received += 1
                yield results.pop(next_emit)
                next_emit += 1
        finally:
            stop.set()

    # ------------------------------------------------------------- processes
    def _ensure_pool(self):
        """Start the PERSISTENT worker pool once; it survives across epochs
        so each worker's decode RAM cache keeps paying off after epoch 1.

        Context is forkserver (fallback spawn), never fork: the loader is
        iterated from prefetch threads while JAX/XLA threads are live, and a
        fork there can deadlock the child on an inherited lock.  The dataset
        is pickled to each worker once (LMDBReader reopens its mmap on
        unpickle)."""
        if self._procs and all(p.is_alive() for p in self._procs):
            return
        self.shutdown()
        ctx = _worker_context()
        # one task queue PER worker, filled round-robin (torch-DataLoader
        # scheme): batch->worker assignment is deterministic, so per-worker
        # RNG streams make augmentations reproducible for a given seed
        self._task_qs = [ctx.Queue() for _ in range(self.num_workers)]
        self._out_q = ctx.Queue(maxsize=max(2, self.prefetch))
        self._procs = [
            ctx.Process(
                target=_process_worker,
                args=(self.dataset, self.collate_fn, self._task_qs[wid],
                      self._out_q, wid),
                daemon=True,
            )
            for wid in range(self.num_workers)
        ]
        for p in self._procs:
            p.start()

    def shutdown(self):
        """Stop the worker pool (also runs implicitly on GC; workers are
        daemons, so an unclean exit cannot hang the process)."""
        for q in self._task_qs or []:
            try:
                q.put(None)
            except Exception:
                pass
        for p in self._procs:
            p.join(timeout=2)
            if p.is_alive():
                p.terminate()
        self._procs = []
        self._task_qs = []
        self._out_q = None
        self._outstanding = 0

    def __del__(self):
        try:
            self.shutdown()
        except Exception:
            pass

    def _iter_processes(self, batches) -> Iterator[Dict]:
        self._ensure_pool()
        # discard results of an abandoned previous epoch (early consumer
        # exit leaves tasks in flight; they must be drained, not leaked,
        # or they would interleave with this epoch's results).  _get_result
        # (not a bare out_q.get) so a worker that died mid-abandoned-epoch
        # raises instead of hanging this loop forever; the bounded send
        # window below caps the drain at ~window batches of wasted decode.
        while self._outstanding > 0:
            self._get_result()
            self._outstanding -= 1
        # epoch base seed: workers reseed their dataset copy's RNGs with
        # base+worker_id, torch-DataLoader style (fresh augmentation streams
        # per worker per epoch instead of N identical forked copies).  The
        # epoch stride must exceed any worker count or (epoch E, worker w+1)
        # would replay (epoch E+1, worker w)'s stream.
        base_seed = self.seed + self._epoch * 100003
        it = enumerate(batches)
        # bounded in-flight window: enough to keep every worker busy and the
        # prefetch satisfied, small enough that an abandoned epoch wastes at
        # most ~window decodes (not the whole epoch)
        window = max(2 * self.num_workers, self.prefetch + 1)

        def send_next() -> bool:
            try:
                i, b = next(it)
            except StopIteration:
                return False
            # round-robin by batch index: batch->worker assignment stays
            # deterministic, so per-worker RNG streams are reproducible
            self._task_qs[i % self.num_workers].put((i, np.asarray(b), base_seed))
            self._outstanding += 1
            return True

        for _ in range(window):
            if not send_next():
                break
        results: Dict[int, Dict] = {}
        next_emit = 0
        while next_emit < len(batches):
            while next_emit not in results:
                i, batch = self._get_result()
                self._outstanding -= 1
                send_next()
                if isinstance(batch, Exception):
                    raise batch
                results[i] = batch
            yield results.pop(next_emit)
            next_emit += 1

    def _get_result(self):
        """out_q.get that notices dead workers instead of hanging forever
        (e.g. a worker OOM-killed, or a spawn-context child that failed to
        re-import __main__)."""
        while True:
            try:
                return self._out_q.get(timeout=10)
            except queue.Empty:
                if not all(p.is_alive() for p in self._procs):
                    codes = [p.exitcode for p in self._procs]
                    self.shutdown()
                    raise RuntimeError(
                        f"DataLoader worker process died (exitcodes {codes}). "
                        "If this happened as soon as iteration started, the "
                        "usual cause is an entry script without an "
                        "`if __name__ == '__main__':` guard — forkserver/"
                        "spawn workers re-import __main__, re-running any "
                        "module-level training code (same requirement as "
                        "torch's DataLoader with spawn)."
                    )


def _worker_context():
    """Pick the multiprocessing start method: forkserver, else spawn — never
    fork.  The loader is iterated from prefetch threads while JAX/XLA
    threads are live, and fork() there can deadlock the child on an
    inherited lock.  Spawn-family children handle a file-less __main__
    (REPL / ``python -c``) by giving the child an empty __main__, which is
    fine here: the worker target and the pickled dataset/collate all live
    in importable modules."""
    try:
        return mp.get_context("forkserver")
    except ValueError:
        return mp.get_context("spawn")


def _reseed_dataset(ds, seed: int) -> None:
    """Give a worker's dataset copy its own deterministic RNG streams.

    Mirrors torch's base_seed+worker_id scheme; without it, forked/pickled
    copies replay the parent's RNG state identically in every worker
    (e.g. MixedLMDB's HR-as-LR flips, datasets.py)."""
    import random as _random

    if hasattr(ds, "reseed"):
        ds.reseed(seed)
        return
    if hasattr(ds, "datasets"):  # ConcatDataset
        for k, child in enumerate(ds.datasets):
            _reseed_dataset(child, seed + 1000003 * (k + 1))
        return
    r = getattr(ds, "rng", None)
    if isinstance(r, _random.Random):
        ds.rng = _random.Random(seed)
    elif isinstance(r, np.random.Generator):
        ds.rng = np.random.default_rng(seed)


def _process_worker(dataset, collate_fn, task_q, out_q, worker_id: int) -> None:
    last_seed = None
    while True:
        task = task_q.get()
        if task is None:
            return
        i, idx, base_seed = task
        try:
            if base_seed != last_seed:
                _reseed_dataset(dataset, base_seed + worker_id)
                last_seed = base_seed
            items = [dataset[int(j)] for j in idx]
            out_q.put((i, collate_fn(items)))
        except Exception as e:  # surfaced in the parent
            out_q.put((i, e))


def pad_batch(batch: Dict, to_size: int) -> Dict:
    """Pad a partial batch's arrays along axis 0 (repeat last sample); lists
    are left as-is.  Returns (padded_batch, valid_count) via '_valid' key."""
    out = {}
    n = None
    for k, v in batch.items():
        if isinstance(v, np.ndarray):
            n = v.shape[0]
            if v.shape[0] < to_size:
                reps = np.repeat(v[-1:], to_size - v.shape[0], axis=0)
                v = np.concatenate([v, reps], axis=0)
        out[k] = v
    out["_valid"] = n if n is not None else to_size
    return out


class RandomSequentialSampler:
    """Random batch-aligned start offsets, sequential within a batch
    (dataset/dataset.py:875-898 ``randomSequentialSampler``; unused in the
    reference's main path, provided for parity)."""

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        self.num_samples = len(dataset)
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return self.num_samples

    def __iter__(self):
        n_batch = self.num_samples // self.batch_size
        tail = self.num_samples % self.batch_size
        index = np.zeros(self.num_samples, np.int64)
        for i in range(n_batch):
            start = int(self.rng.integers(0, self.num_samples - self.batch_size + 1))
            index[i * self.batch_size : (i + 1) * self.batch_size] = (
                start + np.arange(self.batch_size)
            )
        if tail:
            start = int(self.rng.integers(0, self.num_samples - self.batch_size + 1))
            index[n_batch * self.batch_size :] = start + np.arange(tail)
        return iter(index.tolist())
