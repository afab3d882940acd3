#!/usr/bin/env python
"""Measure the reference's eager-mode materialization volume per train step.

The reference (HSG-AIML/MaskedSST) runs PyTorch 1.12 eager fp32 with no
autocast and no fused attention (torch SDPA landed in 2.0), so every
intermediate of its step materializes to device memory. This script runs the
reference's own modules (from /root/reference, used as an oracle) under a
TorchDispatchMode that counts the bytes of NEW storage each aten op
allocates (view ops excluded by storage identity) across one full train
step: forward + backward + AdamW update at the pretrain recipe
(pretrain_config.yaml: 8x8x200 cubes, mask 0.70 tube, per-block decoders).

Allocation volume scales linearly in batch (activations dominate), so two
small batches pin the per-cube slope and the batch-independent constant;
the batch-64 figure is their extrapolation (verified linear to <1%).

This feeds BASELINE.md's derived throughput anchor: every materialized byte
is written once and read at least once by its consumer (autograd saves
included), so per-step HBM traffic >= 2x the materialized volume, and

    step_time >= 2 * bytes(64) / peak_HBM_bandwidth

on ANY accelerator — with zero credit taken for launch gaps, host-side
numpy mask generation (measured separately, ~1.9 ms/step), python dispatch,
or matmul time. See BASELINE.md for the resulting anchor.

Usage: python scripts/reference_step_bytes.py [--reference /root/reference]
"""

import argparse
import sys


class ByteCounter:
    """TorchDispatchMode counting bytes of newly-allocated op outputs."""

    def __new__(cls):
        import torch
        from torch.utils._python_dispatch import TorchDispatchMode
        from torch.utils._pytree import tree_map

        class _Mode(TorchDispatchMode):
            def __init__(self):
                self.bytes = 0
                self.ops = 0
                self.by_op = {}

            def __torch_dispatch__(self, func, types, args=(), kwargs=None):
                kwargs = kwargs or {}
                in_ptrs = set()

                def ins(t):
                    if isinstance(t, torch.Tensor) and t.numel():
                        try:
                            in_ptrs.add(t.untyped_storage().data_ptr())
                        except Exception:
                            pass

                tree_map(ins, (args, kwargs))
                out = func(*args, **kwargs)
                n = 0

                def acc(t):
                    nonlocal n
                    if isinstance(t, torch.Tensor) and t.numel():
                        try:
                            p = t.untyped_storage().data_ptr()
                        except Exception:
                            return
                        if p not in in_ptrs:
                            n += t.numel() * t.element_size()

                tree_map(acc, out)
                self.bytes += n
                self.ops += 1
                key = str(func)
                self.by_op[key] = self.by_op.get(key, 0) + n
                return out

        return _Mode()


def measure(batch: int) -> int:
    import torch

    from src.vit_simmim_original import SimMIMSpatialSpectral
    from src.vit_spatial_spectral import ViTSpatialSpectral

    torch.manual_seed(0)
    enc = ViTSpatialSpectral(
        image_size=8, spatial_patch_size=1, spectral_patch_size=10,
        num_classes=2, dim=96, depth=4, heads=8, mlp_dim=64, channels=200,
        # pretrain recipe: spectral_pos_embed False
        # (configs/pretrain_config.yaml:26) — True would add that path's
        # fwd/bwd materializations and inflate the anchor
        spectral_pos=torch.arange(20), spectral_pos_embed=False,
        blockwise_patch_embed=True,
    )
    mim = SimMIMSpatialSpectral(
        encoder=enc, masking_ratio=0.70, mask_patch_size=4, tube_masking=True,
        to_pixels_per_spectral_block=True,
    )
    opt = torch.optim.AdamW(mim.parameters(), lr=8e-3, weight_decay=0.05)
    img = torch.randn(batch, 200, 8, 8)
    c = ByteCounter()
    with c:
        loss = mim(img)
        opt.zero_grad()
        loss.backward()
        opt.step()
    return c.bytes


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--hbm-tb-s", type=float, default=2.039,
                    help="peak HBM bandwidth of the comparison GPU (TB/s); "
                    "default A100-SXM 80GB")
    args = ap.parse_args()
    sys.path.append(args.reference)
    import numpy as np

    np.float = float  # legacy alias the reference relies on

    b4, b8 = measure(4), measure(8)
    slope = (b8 - b4) / 4
    const = b4 - 4 * slope
    b64 = slope * 64 + const
    traffic = 2 * b64
    step_s = traffic / (args.hbm_tb_s * 1e12)
    print(f"materialized: batch4 {b4 / 1e9:.3f} GB, batch8 {b8 / 1e9:.3f} GB")
    print(f"per-cube slope {slope / 1e6:.1f} MB, constant {const / 1e9:.3f} GB")
    print(f"batch-64 step: {b64 / 1e9:.2f} GB materialized, "
          f">= {traffic / 1e9:.1f} GB HBM traffic")
    print(f"step time bound @ {args.hbm_tb_s} TB/s: >= {step_s * 1e3:.1f} ms "
          f"-> <= {64 / step_s:.0f} cubes/s")


if __name__ == "__main__":
    main()
