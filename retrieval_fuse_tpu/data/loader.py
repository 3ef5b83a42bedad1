"""Host-side batching for jitted TPU compute.

Replaces the reference's torch DataLoader (trainer/*.py) with a numpy batcher
that guarantees STATIC batch shapes — jit compiles once per shape, so the final
partial batch is padded up to `batch_size` and carries a `valid` count that
downstream metric/loss code uses to mask the padding.

A background prefetch thread overlaps host slicing/stacking with device compute
(the TPU equivalent of DataLoader worker processes + pin_memory).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

_STACK_KEYS = ("input", "target", "retrieval", "extent")
_LIST_KEYS = ("name", "scene")


def collate(items: list[dict], batch_size: int, valid: int | None = None) -> dict:
    """Stack item dicts into one fixed-shape batch, padding by repeating the
    last item; `valid` is the number of real rows (overridable when the
    caller already included padding rows, e.g. multi-host shard fill)."""
    if valid is None:
        valid = len(items)
    if len(items) < batch_size:
        items = items + [items[-1]] * (batch_size - len(items))
    batch = {}
    for key, v0 in items[0].items():
        if isinstance(v0, np.ndarray):  # _STACK_KEYS plus any cached-feature keys
            batch[key] = np.stack([it[key] for it in items], axis=0)
        elif key in _LIST_KEYS:
            batch[key] = [it[key] for it in items]
    batch["valid"] = valid
    return batch


def batch_iterator(dataset, batch_size: int, shuffle: bool = False, drop_last: bool = False,
                   seed: int = 0, prefetch: int = 2,
                   process_index: int = 0, process_count: int = 1):
    """Yield fixed-shape batches; optionally shuffled, optionally prefetched.

    Multi-host: pass jax.process_index()/process_count() — every host shuffles
    with the same seed then takes a contiguous shard of IDENTICAL length
    (short shards wrap around to the front of the global order, like torch's
    DistributedSampler), so every host yields the same number of batches and
    jitted collectives never deadlock on unequal step counts. Wrapped filler
    rows are excluded from each batch's `valid` count, so metric/loss code
    that masks by `valid` never double-counts them. `batch_size` is per-host
    (the reference's per-GPU DataLoader batch semantics); the global batch a
    step sees is process_count x batch_size (parallel.mesh.make_global_batch)."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    n_real = len(order)
    if process_count > 1:
        shard_len = -(-len(order) // process_count)  # ceil -> equal everywhere
        start = process_index * shard_len
        shard = order[start: start + shard_len]
        n_real = len(shard)
        if n_real < shard_len:  # wrap filler from the front of the global order
            shard = np.concatenate([shard, order[: shard_len - n_real]])
        order = shard
    if drop_last:
        order = order[: (len(order) // batch_size) * batch_size]
        n_real = min(n_real, len(order))
    if len(order) == 0:
        return

    def produce():
        for start in range(0, len(order), batch_size):
            idxs = order[start: start + batch_size]
            v = max(0, min(len(idxs), n_real - start))
            yield collate([dataset[int(i)] for i in idxs], batch_size, valid=v)

    if prefetch <= 0:
        yield from produce()
        return

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    sentinel = object()
    err_holder = []

    def worker():
        try:
            for b in produce():
                q.put(b)
        except Exception as e:  # surface worker errors on the main thread
            err_holder.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is sentinel:
            break
        yield b
    if err_holder:
        raise err_holder[0]
