"""maskedsst_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of HSG-AIML/MaskedSST (CVPR EarthVision 2023).

The reference implementation is a single-GPU PyTorch research codebase; this
framework is a ground-up redesign for TPU:

* models are pure-functional flax modules; the blockwise spectral patch
  embedding is a single batched einsum instead of a Python loop over
  per-block ``nn.Linear``s (reference: src/vit_spatial_spectral.py:210-222),
* SimMIM mask generation runs on-device from `jax.random` keys instead of
  host-side numpy loops (reference: src/vit_simmim_original.py:343-416),
* training steps are single jit-compiled functions (fwd+bwd+update) that
  shard data-parallel over a `jax.sharding.Mesh`,
* hot ops have fused Pallas TPU kernels with XLA reference paths.

Public surface mirrors the reference's layer map (SURVEY.md §1).
"""

__version__ = "0.1.0"

from maskedsst_tpu.config import (  # noqa: F401
    Config,
    get_pretrain_config,
    get_finetune_config,
)
