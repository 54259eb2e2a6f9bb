"""Threaded batch loader with device prefetch.

Replaces torch DataLoader(num_workers=8) in the reference entry scripts
(train_temporal.py:108-109). HDF5/numpy reads release the GIL, so a thread
pool saturates host IO; a bounded queue keeps `prefetch` batches ready
ahead of the training loop. Device transfer happens in the loop via
jax.device_put, which dispatches asynchronously — combined with the loop's
one-step-lagged metric fetch (train/loop.py), host IO, H2D transfer and
TPU compute all overlap (SURVEY.md §7 hard part (d)).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

_malloc_tuned = False


def _tune_malloc() -> None:
    """Raise glibc's mmap/trim thresholds once per process: batch buffers
    (tens of MB per np.empty) otherwise come from fresh mmap regions that
    are unmapped on free, so EVERY batch pays ~500 page faults during the
    copy (~250 us/item measured — a third of the whole ingest budget at
    the Ti rate bar). With the thresholds raised the arena reuses pages.
    Best-effort: silently a no-op off glibc/Linux."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 256 * 1024 * 1024)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 256 * 1024 * 1024)  # M_TRIM_THRESHOLD
    except Exception:
        pass


_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _window_words(seed: int, epoch: int, base: int, n: int) -> np.ndarray:
    """Stateless per-item 64-bit random words (splitmix64 of the global
    item index mixed with the (seed, epoch) stream id). Replaces per-item
    np.random.Generator construction on the fetch_into fast path — ~21 us
    PER ITEM of SeedSequence hashing, a measured 3% of the whole ingest
    budget — with one vectorized scramble per batch (<1 us total).
    Keyed by ABSOLUTE index, so multi-host shards draw identical words
    for the same items regardless of how the batch is split."""
    x = np.arange(base, base + n, dtype=np.uint64)
    x = (x + np.uint64(1)) * _SM_GAMMA + np.uint64(
        (int(seed) & 0xFFFFFFFF) << 20 | ((int(epoch) + 1) & 0xFFFFF)
    )
    z = x.copy()
    z ^= z >> np.uint64(30)
    z *= _SM_M1
    z ^= z >> np.uint64(27)
    z *= _SM_M2
    z ^= z >> np.uint64(31)
    return z


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        num_workers: int = 8,
        seed: int = 0,
        prefetch: int = 8,
        num_shards: int = 1,
        shard_index: int = 0,
        gil_interval: Optional[float] = 0.0001,
        x_dtype=None,
        y_dtype=None,
        slot_ring: int = 0,
    ):
        """batch_size is the GLOBAL batch size. With num_shards > 1
        (multi-host: one process per host), every host walks the same
        seed-deterministic global batch order but loads only its
        contiguous 1/num_shards slice of each batch — the per-host input
        for jax.make_array_from_process_local_data
        (parallel/multihost.py). Global batches that don't divide
        num_shards evenly are skipped on the sharded path (same data on
        every host is the invariant that matters).

        gil_interval: sys.setswitchinterval applied while an iterator is
        live (restored after). The interpreter-default 5 ms interval makes
        each producer<->consumer queue handoff pay up to 5 ms of GIL
        wake-up latency — measured 25-40% of loader throughput gone on a
        1-core host. 0.1 ms + prefetch=8 measured 1046 -> 1812 samples/s
        median at the 128^2x21x4 pretraining shape (the 1-worker inline
        assembly path alone is 1571/s; deeper prefetch amortizes the
        handoffs below it). None leaves the interpreter default
        untouched.

        x_dtype / y_dtype: slot dtype for the fetch_into fast path (e.g.
        jnp.bfloat16 — the train wire format). The dtype conversion then
        rides the ONE assembly copy (np.copyto converts in-pass) instead
        of the train loop's separate astype pass over the same bytes on
        the same core. Only fast-path batches (declared fast_item_shapes)
        convert here; the loop's conditional cast covers the rest.

        slot_ring: OPT-IN recycled batch buffers for the fetch_into fast
        path. A fresh np.empty pair per batch costs ~0.9 ms of arena/page
        work at the pretraining shape (measured ~25% of loader throughput
        on this 1-core host); with slot_ring=K the loader cycles through a
        fixed pool of prefetch+1+K slot sets instead. A yielded batch's
        buffers are REUSED once K further batches have been yielded — the
        consumer must be done with batch i (including any in-flight
        jax.device_put reading from it) by the time it has pulled K more.
        The train loop's one-step-lagged metric fetch makes K=2 a real
        fence there (fetching step i's loss proves batch i's transfer
        completed); other consumers must hold no references that long or
        leave this off (0 = fresh buffers every batch, the safe default)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.num_shards = max(1, num_shards)
        self.shard_index = shard_index
        self.gil_interval = gil_interval
        self.x_dtype = np.dtype(x_dtype) if x_dtype is not None else np.float32
        self.y_dtype = np.dtype(y_dtype) if y_dtype is not None else np.float32
        self.slot_ring = int(slot_ring)
        self._ring_sets: list = []  # persistent slot pool (built once)
        self._epoch = 0
        _tune_malloc()
        if self.num_shards > 1 and batch_size % self.num_shards != 0:
            # the shard path can only skip non-divisible batches; with an
            # indivisible global batch size that would be EVERY batch —
            # fail loudly instead of silently training zero steps
            raise ValueError(
                f"num_shards {self.num_shards} must divide the global "
                f"batch_size {batch_size} (every host loads "
                "batch_size/num_shards items)"
            )

    def set_epoch(self, epoch: int):
        """Position the shuffle-order/per-item-rng stream (checkpoint
        resume): the next __iter__ replays exactly the permutation an
        uninterrupted run would have used at `epoch`."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        n = len(self.dataset)
        full = n // self.batch_size
        rem = n % self.batch_size
        if self.drop_last:
            return full
        if self.num_shards > 1:
            # the shard path skips batches it can't split evenly; count
            # only the survivors so schedules built from len(dl) match the
            # steps actually run
            tail = 1 if rem and rem % self.num_shards == 0 else 0
            return full + tail
        return full + (1 if rem else 0)

    def _batches(self) -> list[np.ndarray]:
        n = len(self.dataset)
        # tuple seeding: additive mixing (seed+epoch) would make adjacent
        # seeds replay each other's permutations shifted by one epoch
        rng = np.random.default_rng((self.seed, self._epoch))
        order = rng.permutation(n) if self.shuffle else np.arange(n)
        limit = (n // self.batch_size) * self.batch_size if self.drop_last else n
        order = order[:limit]
        return [
            order[i : i + self.batch_size]
            for i in range(0, len(order), self.batch_size)
        ]

    def __iter__(self) -> Iterator[tuple]:
        batches = self._batches()
        # (global_base, ids) pairs; the global base keeps each item's
        # per-item rng stream identical whether or not loading is sharded
        # across hosts
        pairs = []
        base = 0
        for b in batches:
            pairs.append((base, b))
            base += len(b)
        if self.num_shards > 1:
            sharded = []
            for gbase, b in pairs:
                per, rem = divmod(len(b), self.num_shards)
                if per == 0 or rem:
                    continue
                lo = self.shard_index * per
                sharded.append((gbase + lo, b[lo : lo + per]))
            pairs = sharded
        rng_key = (self.seed, self._epoch)
        self._epoch += 1

        # detect rng support ONCE (catching TypeError per item would mask
        # TypeErrors raised inside the dataset body and silently retry the
        # read without its seeded stream)
        import inspect

        try:
            supports_rng = "rng" in inspect.signature(
                self.dataset.__getitem__
            ).parameters
        except (TypeError, ValueError):
            supports_rng = False

        def fetch_item(args):
            k, idx = args
            if not supports_rng:
                return self.dataset[int(idx)]
            # the same stateless word stream as the fetch_into fast path
            # (so fast and generic routes yield identical batches — pinned
            # by test_ingest_rate.py); datasets needing a full Generator
            # seed one from the word (np.random.default_rng(word))
            word = _window_words(*rng_key, k, 1)[0]
            return self.dataset.__getitem__(int(idx), rng=word)

        # zero-intermediate assembly: datasets exposing fetch_into write
        # each item STRAIGHT into its batch slot (one strided copy from
        # the corpus memmap, no per-item arrays, no stack pass) — the
        # difference between feeding and starving the chip on a
        # few-core host (SURVEY §7 hard part (d)). The first batch goes
        # through the generic stack path to learn the column shapes.
        use_into = callable(getattr(self.dataset, "fetch_into", None))
        # a dataset that ships time-major batches declares its slot shapes
        # up front (they differ from __getitem__'s layout); otherwise the
        # first generic batch teaches them
        declared = getattr(self.dataset, "fast_item_shapes", None)
        slot_shapes: list = list(declared) if (use_into and declared) else []

        # all-ones train masks (advertised by the dataset) are served from
        # ONE shared read-only buffer instead of being re-filled per item:
        # the fill alone is ~11 us/item (1.5% of budget) plus a fresh
        # 256 KB allocation per batch. The train loop drops the mask
        # entirely under ones_mask anyway (train/loop.py).
        elide_msk = bool(getattr(self.dataset, "train_masks_are_ones", False))
        shared_msk: list = []  # [ones array of (batch_size, *msk_shape)]

        # recycled slot pool (see slot_ring in __init__): the arrays are
        # allocated ONCE per DataLoader (first epoch that knows the
        # shapes) and live on self — reallocating ~130 MB of slots every
        # epoch measurably thrashes the arena. Each epoch starts with
        # every set free: the end-of-epoch join below guarantees no
        # producer is still writing into one.
        ring_free: queue.Queue = queue.Queue()

        def _take_ring_set():
            if not self._ring_sets:
                for _ in range(self.prefetch + 1 + self.slot_ring):
                    self._ring_sets.append((
                        np.empty(
                            (self.batch_size, *slot_shapes[0]), self.x_dtype
                        ),
                        np.empty(
                            (self.batch_size, *slot_shapes[1]), self.y_dtype
                        ),
                        None if elide_msk else np.empty(
                            (self.batch_size, *slot_shapes[2]), np.float32
                        ),
                    ))
                for st in self._ring_sets:
                    ring_free.put(st)
            while not stop.is_set():
                try:
                    return ring_free.get(timeout=0.2)
                except queue.Empty:
                    continue
            return None

        if self.slot_ring > 0 and self._ring_sets:
            for st in self._ring_sets:
                ring_free.put(st)

        def fetch_batch_into(pool, batch_ids, base):
            n = len(batch_ids)
            slotset = None
            if self.slot_ring > 0:
                slotset = _take_ring_set()
                if slotset is None:  # consumer abandoned the epoch
                    return None, None
                x, y = slotset[0][:n], slotset[1][:n]
            else:
                x = np.empty((n, *slot_shapes[0]), self.x_dtype)
                y = np.empty((n, *slot_shapes[1]), self.y_dtype)
            if elide_msk:
                if not shared_msk:
                    shared_msk.append(
                        np.ones((self.batch_size, *slot_shapes[2]), np.float32)
                    )
                msk = shared_msk[0][:n]
            elif slotset is not None:
                msk = slotset[2][:n]
            else:
                msk = np.empty((n, *slot_shapes[2]), np.float32)
            cls = np.empty((n,), np.int32)
            words = _window_words(*rng_key, base, n)
            # whole-batch native assembly (one GIL-released memcpy/convert
            # call for all B windows — grid_dataset.fetch_many_into) when
            # the dataset offers it; per-item fetch_into otherwise
            many = getattr(self.dataset, "fetch_many_into", None)
            if many is not None:
                got = many(batch_ids, words, x, y,
                           None if elide_msk else msk)
                if got is not None:
                    cls[:] = got
                    return (x, y, msk, cls), slotset
            fetch = self.dataset.fetch_into  # hoisted: this loop IS the
            # ingest hot path (~660 us/item budget at the Ti bar)

            if self.num_workers == 1:
                # one host core: the pool only adds dispatch overhead here
                if elide_msk:
                    for j in range(n):
                        cls[j] = fetch(int(batch_ids[j]), x[j], y[j], None,
                                       words[j])
                else:
                    for j in range(n):
                        cls[j] = fetch(int(batch_ids[j]), x[j], y[j], msk[j],
                                       words[j])
            else:
                def one(j_i):
                    j, i = j_i
                    cls[j] = fetch(
                        int(i), x[j], y[j], None if elide_msk else msk[j],
                        words[j],
                    )

                list(pool.map(one, enumerate(batch_ids)))
            return (x, y, msk, cls), slotset

        def fetch_batch(pool, batch_ids, base):
            if slot_shapes:
                return fetch_batch_into(pool, batch_ids, base)
            items = list(pool.map(fetch_item, [(base + j, i) for j, i in enumerate(batch_ids)]))
            cols = list(zip(*items))
            out = tuple(
                np.stack(c) if np.ndim(c[0]) > 0 else np.asarray(c) for c in cols
            )
            if (
                use_into
                and len(out) == 4
                and all(
                    isinstance(a, np.ndarray) and a.dtype == np.float32
                    for a in out[:3]
                )
            ):
                slot_shapes.extend(a.shape[1:] for a in out[:3])
            return out, None

        stop = threading.Event()

        if self.prefetch == 0:
            # INLINE mode: no producer thread, no queue. On a 1-core host
            # the threaded handoff costs ~1.3 ms/batch of GIL/condition
            # wake-ups (measured ~630 samples/s at the Ti pretraining
            # shape) and buys nothing — host/device overlap comes from
            # jax's async dispatch (the load for batch i+1 runs while the
            # device crunches step i), not from a loader thread. With
            # slot_ring, sets recycle through the same lag-K contract.
            from collections import deque

            held_i: deque = deque()
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for gbase, b in pairs:
                        batch, slotset = fetch_batch(pool, b, gbase)
                        if batch is None:
                            return
                        if slotset is not None:
                            held_i.append(slotset)
                            if len(held_i) > self.slot_ring:
                                ring_free.put(held_i.popleft())
                        yield batch
            finally:
                stop.set()
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def put(item) -> bool:
            # bounded put that observes `stop`: a consumer that abandons
            # iteration mid-epoch (exception/early break) would otherwise
            # leave this thread blocked in q.put forever, leaking the pool
            # and open HDF5 handles
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for gbase, b in pairs:
                        if stop.is_set():
                            return
                        batch, slotset = fetch_batch(pool, b, gbase)
                        if batch is None:  # ring drained after a stop
                            return
                        if not put((batch, slotset)):
                            return
                put(None)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                # a failed read must surface in the consumer, not strand
                # it in q.get() forever behind a dead producer
                put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        import sys

        old_interval = None
        if self.gil_interval is not None:
            old_interval = sys.getswitchinterval()
            sys.setswitchinterval(self.gil_interval)
        from collections import deque

        held: deque = deque()  # yielded ring sets not yet recyclable
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                batch, slotset = item
                if slotset is not None:
                    # recycle the set yielded slot_ring batches ago: the
                    # consumer contract (see __init__) says it is done
                    # with that batch by now
                    held.append(slotset)
                    if len(held) > self.slot_ring:
                        ring_free.put(held.popleft())
                yield batch
        finally:
            stop.set()
            if self.slot_ring > 0:
                # the pool is reused next epoch: wait out a producer that
                # may still be writing into a set (early break / error)
                t.join(timeout=10.0)
            if old_interval is not None:
                sys.setswitchinterval(old_interval)
