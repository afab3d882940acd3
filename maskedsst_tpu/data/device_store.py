"""HBM-resident dataset store.

The reference streams every batch host→device (DataLoader + ``.to(device)``
per step, pretrain.py:105-107). On TPU — especially with the host attached
over a slow link — that transfer dominates the step time. The store uploads
the full tile set to device HBM ONCE; each training step then receives only a
``[batch]`` int32 index vector and gathers its batch on device, so the
steady-state host→device traffic is a few hundred bytes per step.

Size guard: stores fall back to host streaming when the tile set exceeds the
HBM budget (the EnMAP reference set at 200 bands × 64² × fp32 is ~3.3 MB/tile
→ ~4800 tiles in 16 GB; bigger corpora stream per-host shards instead, which
is the standard multi-host input sharding).

DP note: the store is replicated; the gathered batch is resharded onto the
``data`` mesh axis with a sharding constraint, so XLA still splits compute
across chips while the gather itself stays local.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import jax
import numpy as np

from maskedsst_tpu.parallel.mesh import replicate


class DeviceTileStore:
    """Stacks a map-style dataset's samples into device-resident arrays.

    Stacked keys are all keys of sample 0 whose values are arrays/scalars
    (string/bytes fields are skipped).
    """

    def __init__(self, dataset, mesh, max_bytes: int = 8 * 1024**3):
        n = len(dataset)
        if n == 0:
            # a clear error instead of dataset[0]'s IndexError — and NOT a
            # MemoryError: an empty dataset is a config problem, not a
            # reason to fall back to host streaming
            raise ValueError("DeviceTileStore: dataset is empty")
        first = dataset[0]
        fields = [k for k, v in first.items() if not isinstance(v, (str, bytes))]
        nbytes = sum(
            np.asarray(first[k]).nbytes if np.ndim(first[k]) else 8 for k in fields
        ) * n
        if nbytes > max_bytes:
            raise MemoryError(
                f"dataset needs {nbytes/1e9:.1f} GB > budget {max_bytes/1e9:.1f} GB; "
                "stream from host instead"
            )
        # ONE pass over the dataset collecting every field: per-field passes
        # would re-read (and re-decode/standardize) each sample len(fields)
        # times — 3x the rasterio I/O for {idx, img, label} tiles.
        # Preallocated from sample 0's shapes (uniform by the store's
        # contract): a list-then-np.stack staging would hold TWO copies of
        # the tile set at peak — a transient 2x host-RAM spike that can OOM
        # near the max_bytes budget.
        host: Dict[str, np.ndarray] = {}
        for k in fields:
            v0 = np.asarray(first[k])
            host[k] = np.empty((n, *v0.shape), v0.dtype)
        for k in fields:  # sample 0 is already decoded — don't re-read it
            host[k][0] = np.asarray(first[k])
        for i in range(1, n):
            sample = dataset[i]
            for k in fields:
                host[k][i] = np.asarray(sample[k])
        sharding = replicate(mesh)
        if jax.process_count() > 1:
            # multi-process mesh: every process holds the full tile set (the
            # store's small-corpora contract — big sets raise MemoryError
            # above and stream per-host shards instead); assemble the global
            # replicated array from the identical per-process copies
            def put(v):
                return jax.make_array_from_process_local_data(sharding, v)
        else:
            # device_put straight from numpy: jnp.asarray first would place
            # the whole tile set on the default device and then copy it
            # AGAIN to the replicated sharding — a transient 2x HBM spike
            def put(v):
                return jax.device_put(v, sharding)

        self.arrays: Dict[str, jax.Array] = {k: put(v) for k, v in host.items()}
        self.num_samples = n
        self.mesh = mesh

    def __len__(self) -> int:
        return self.num_samples


class IndexBatcher:
    """Epoch iterator over batch index vectors (host-side numpy RNG, seeded
    per epoch like the host DataLoader)."""

    def __init__(
        self,
        num_samples: int,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        pad_to_batch: bool = True,
    ):
        self.num_samples = num_samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.pad_to_batch = pad_to_batch
        self.epoch = 0

    def __len__(self) -> int:
        if self.drop_last:
            return self.num_samples // self.batch_size
        return (self.num_samples + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[np.ndarray]:
        order = (
            np.random.default_rng(self.seed + self.epoch).permutation(self.num_samples)
            if self.shuffle
            else np.arange(self.num_samples)
        )
        self.epoch += 1
        for lo in range(0, self.num_samples, self.batch_size):
            idx = order[lo : lo + self.batch_size]
            if len(idx) < self.batch_size:
                if self.drop_last:
                    return
                if self.pad_to_batch:
                    # pad with -1 sentinels; CONSUMERS MUST MASK them (the
                    # Finetuner's _gather_batch maps idx<0 to ignored
                    # labels; a plain jnp.take would clamp -1 to sample 0
                    # and silently train on duplicated rows)
                    pad = self.batch_size - len(idx)
                    idx = np.concatenate([idx, -np.ones(pad, idx.dtype)])
            yield idx.astype(np.int32)

    def take(self, steps: int) -> np.ndarray:
        """Stack the next ``steps`` index batches into one
        ``[steps, batch_size]`` int32 array, advancing the per-epoch shuffle
        as needed (partial epochs past ``steps`` are discarded). This is the
        superstep-chunk staging idiom shared by bench.py and the profiling
        scripts — kept here so the staging policy has one home."""
        if len(self) == 0:
            # drop_last=True with num_samples < batch_size yields no batches
            # — raise instead of spinning forever (a silent hang here reads
            # exactly like tunnel congestion and misdirects the diagnosis)
            raise ValueError(
                f"IndexBatcher yields no batches ({self.num_samples} samples "
                f"< batch_size {self.batch_size} with drop_last)"
            )
        out: list = []
        while len(out) < steps:
            out.extend(self)
        return np.stack(out[:steps])
