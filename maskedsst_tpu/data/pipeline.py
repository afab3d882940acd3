"""Host input pipeline: dataset → shuffled, collated, device-sharded batches.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=4)``
(src/utils.py:120-133). On TPU the goal is to keep the chips fed: batches are
collated into contiguous numpy arrays on a background thread (double
buffered) and handed to ``jax.device_put`` with a batch sharding so each chip
receives only its slice over ICI-attached hosts.

``split_dataset`` reproduces the reference's seeded
``torch.utils.data.random_split([val, train, rest], Generator(seed))``
(src/utils.py:106-118) bit-exactly when torch is importable (the same
``randperm`` stream), so train/val membership matches the reference runs.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np


def torch_exact_permutation(n: int, seed: int) -> np.ndarray:
    """torch.randperm(n, generator=Generator().manual_seed(seed)) — the exact
    stream torch random_split consumes. Falls back to numpy if torch is
    unavailable (membership then differs from reference runs)."""
    try:
        import torch
    except Exception as exc:  # noqa: BLE001 — a broken install can raise anything
        import warnings

        warnings.warn(
            f"torch unavailable ({exc!r}): falling back to a numpy "
            "permutation — train/val MEMBERSHIP now differs from reference "
            "runs and from machines where torch imports",
            stacklevel=2,
        )
        return np.random.default_rng(seed).permutation(n)
    gen = torch.Generator().manual_seed(seed)
    return torch.randperm(n, generator=gen).numpy()


def split_dataset(
    dataset,
    train_fraction: float,
    data_fraction: float = 1.0,
    seed: int = 5,
):
    """(val_subset, train_subset) with reference split semantics
    (src/utils.py:106-118): val gets the FIRST ``len - int(len*train_fraction)``
    permuted indices, train the next ``int(train*data_fraction)``."""
    n = len(dataset)
    num_train = int(n * train_fraction)
    num_val = n - num_train
    num_train = int(num_train * data_fraction)
    perm = torch_exact_permutation(n, seed)
    val_idx = perm[:num_val]
    train_idx = perm[num_val : num_val + num_train]
    return Subset(dataset, val_idx), Subset(dataset, train_idx)


class Subset:
    def __init__(self, dataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(int(i) for i in indices)

    @property
    def stochastic(self) -> bool:
        return bool(getattr(self.dataset, "stochastic", False))

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def _collate(samples: List[dict]) -> dict:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        out[key] = np.stack(vals) if np.ndim(vals[0]) > 0 else np.asarray(vals)
    return out


class DataLoader:
    """Minimal epoch iterator: shuffle (seeded per epoch), collate, optional
    drop_last, background prefetch of ``prefetch`` batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        device_put=None,
        pad_to_multiple: int = 1,
        pad_label_value: int = -1,
    ):
        """``pad_to_multiple``: pad the trailing batch up to a multiple of N
        samples (images zero-filled, labels set to ``pad_label_value`` so the
        ignored-label masking in losses/metrics excludes them) — needed when
        batches shard over N devices and drop_last is off."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.device_put = device_put
        self.pad_to_multiple = max(1, pad_to_multiple)
        self.pad_label_value = pad_label_value
        self.epoch = 0
        self.skip_next = 0  # batches to drop from the NEXT epoch (resume)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = (
            np.random.default_rng(self.seed + self.epoch).permutation(n)
            if self.shuffle
            else np.arange(n)
        )
        batches = [
            order[i : i + self.batch_size] for i in range(0, n, self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        return batches

    def __iter__(self) -> Iterator[dict]:
        batches = self._batch_indices()
        self.epoch += 1
        if self.skip_next:
            # mid-epoch resume: drop already-trained batches at the INDEX
            # level so their tiles are never read or prefetched (this loader
            # exists because the dataset exceeds device/host memory)
            batches = batches[self.skip_next :]
            self.skip_next = 0
        if self.prefetch <= 0:
            for idx in batches:
                yield self._make(idx)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()  # set when the consumer abandons the epoch

        def put_or_stop(item) -> bool:
            """stop-aware put: every producer enqueue (items, the error
            sentinel, the end sentinel) must honor `stop`, or an abandoned
            epoch with a full queue pins the thread (and the batch memory)
            forever."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in batches:
                    if not put_or_stop(self._make(idx)):
                        return
            except BaseException as exc:  # surface dataset errors, don't
                put_or_stop(("__error__", exc))  # silently truncate the epoch
                return
            put_or_stop(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
                    raise item[1]
                yield item
        finally:
            stop.set()  # unblock the producer if the consumer broke early

    def _make(self, idx: np.ndarray) -> dict:
        batch = _collate([self.dataset[int(i)] for i in idx])
        m = self.pad_to_multiple
        n = len(idx)
        if m > 1 and n % m != 0:
            pad = m - n % m
            for key, val in batch.items():
                fill = np.zeros((pad, *val.shape[1:]), dtype=val.dtype)
                if key == "label":
                    fill[...] = self.pad_label_value
                batch[key] = np.concatenate([val, fill], axis=0)
        if self.device_put is not None:
            batch = self.device_put(batch)
        return batch
