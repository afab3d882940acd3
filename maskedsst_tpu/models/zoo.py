"""DeepHyperX model zoo — 12 hyperspectral classification baselines.

Reference: DeepHyperX/models.py:20-996 (Audebert et al., vendored by the
reference repo; the ``li`` 3D-CNN is the baseline finetune.py actually uses,
finetune.py:58-65). Each network reproduces the reference architecture and
paper-faithful training recipe; ``get_model(name, ...)`` mirrors the factory
contract: returns ``(model, optimizer_spec, criterion_spec, hyperparams)``
with the same ``kwargs.setdefault`` defaulting.

Input layout matches the reference callers: 3-D CNNs take ``[B, 1, C, H, W]``
(torch NCDHW with a singleton feature channel), spectral-only nets take
``[B, C]`` after the callers' squeezes. Internally data moves to
channels-last once and every conv runs as an XLA ``conv_general_dilated``
that the TPU backend tiles onto the MXU.

Semi-supervised models (liu, boulch) return ``(logits, reconstruction)`` and
carry ``aux_loss_weight`` like the reference.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# --- shared helpers ---------------------------------------------------------

# torch-matching initializers for the reference weight_init fns. torch
# kaiming_normal_ draws an UNTRUNCATED normal while flax's he_normal/
# kaiming_normal alias truncates at 2 sigma, so use variance_scaling directly.
_kaiming_normal = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
_kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init

def _to_channels_last_3d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 1, C, H, W] (torch NCDHW, feature=1) → [B, C, H, W, 1]."""
    assert x.ndim == 5, f"expected [B, 1, C, H, W], got {x.shape}"
    return jnp.moveaxis(x, 1, -1)


def _flatten_torch_order(x: jnp.ndarray) -> jnp.ndarray:
    """Flatten channels-last [B, ..., F] exactly like torch's view on the
    channels-first layout (feature-major) so fc weights are importable from
    reference checkpoints."""
    x = jnp.moveaxis(x, -1, 1)
    return x.reshape(x.shape[0], -1)


class Conv3d(nn.Module):
    """torch-style Conv3d on [B, D, H, W, F_in] with NCDHW-semantics padding/
    stride tuples (depth, height, width)."""

    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    dilation: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        pad = [(p, p) for p in self.padding]
        return nn.Conv(
            self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=pad,
            kernel_dilation=self.dilation,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
        )(x)


class Conv2d(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    kernel_init: Any = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        pad = [(p, p) for p in self.padding]
        return nn.Conv(
            self.features, kernel_size=self.kernel, strides=self.stride, padding=pad,
            kernel_init=self.kernel_init,
        )(x)


def max_pool_3d(x, window: Tuple[int, int, int], stride: Optional[Tuple[int, int, int]] = None):
    stride = stride or window
    return nn.max_pool(x, window_shape=window, strides=stride)


def local_response_norm(x: jnp.ndarray, size: int, alpha=1e-4, beta=0.75, k=1.0):
    """torch nn.LocalResponseNorm over the channel (last) axis."""
    sq = x * x
    # sum over a window of `size` channels centered at each channel
    pad = (size // 2, (size - 1) // 2)
    sq = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [pad])
    windows = jnp.cumsum(sq, axis=-1)
    windows = jnp.concatenate(
        [windows[..., size - 1 : size], windows[..., size:] - windows[..., :-size]], axis=-1
    )
    return x / (k + alpha / size * windows) ** beta


# --- the 12 networks --------------------------------------------------------

class Baseline(nn.Module):
    """4-layer MLP (DeepHyperX/models.py:205-240)."""

    n_classes: int
    dropout: bool = False

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1)
        for i, feats in enumerate((2048, 4096, 2048)):
            x = nn.relu(
                nn.Dense(feats, kernel_init=_kaiming_normal, name=f"fc{i + 1}")(x)
            )
            if self.dropout:
                x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return nn.Dense(self.n_classes, kernel_init=_kaiming_normal, name="fc4")(x)


class HuEtAl(nn.Module):
    """1-D CNN over the spectrum (DeepHyperX/models.py:243-294)."""

    input_channels: int
    n_classes: int

    @property
    def kernel_size(self) -> int:
        return math.ceil(self.input_channels / 9)

    @property
    def pool_size(self) -> int:
        return math.ceil(self.kernel_size / 5)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(x.shape[0], self.input_channels, 1)  # [B, C, 1ch]
        x = nn.Conv(20, kernel_size=(self.kernel_size,), padding="VALID",
                    kernel_init=_uniform_init(0.05), name="conv")(x)
        x = nn.max_pool(x, (self.pool_size,), strides=(self.pool_size,))
        x = jnp.tanh(x)
        x = _flatten_torch_order(x)  # torch flattens [B, 20, L] plane-major
        x = jnp.tanh(nn.Dense(100, kernel_init=_uniform_init(0.05), name="fc1")(x))
        return nn.Dense(self.n_classes, kernel_init=_uniform_init(0.05), name="fc2")(x)


class HamidaEtAl(nn.Module):
    """3-D CNN (DeepHyperX/models.py:297-383)."""

    input_channels: int
    n_classes: int
    patch_size: int = 5
    dilation: int = 1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _to_channels_last_3d(x)
        d = (self.dilation, 1, 1)
        pad1 = (1, 1, 1) if self.patch_size == 3 else (0, 0, 0)
        x = nn.relu(Conv3d(20, (3, 3, 3), (1, 1, 1), pad1, d, kernel_init=_kaiming_normal, name="conv1")(x))
        x = Conv3d(20, (3, 1, 1), (2, 1, 1), (1, 0, 0), d, kernel_init=_kaiming_normal, name="pool1")(x)
        x = nn.relu(Conv3d(35, (3, 3, 3), (1, 1, 1), (1, 0, 0), d, kernel_init=_kaiming_normal, name="conv2")(x))
        x = Conv3d(35, (3, 1, 1), (2, 1, 1), (1, 0, 0), d, kernel_init=_kaiming_normal, name="pool2")(x)
        x = nn.relu(Conv3d(35, (3, 1, 1), (1, 1, 1), (1, 0, 0), d, kernel_init=_kaiming_normal, name="conv3")(x))
        x = nn.relu(Conv3d(35, (2, 1, 1), (2, 1, 1), (1, 0, 0), d, kernel_init=_kaiming_normal, name="conv4")(x))
        return nn.Dense(self.n_classes, kernel_init=_kaiming_normal, name="fc")(
            _flatten_torch_order(x)
        )


class LeeEtAl(nn.Module):
    """Contextual deep CNN with 3-D inception + 1x1 residual blocks
    (DeepHyperX/models.py:386-468). Fully convolutional: output
    [B, n_classes, H, W]."""

    in_channels: int
    n_classes: int

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _to_channels_last_3d(x)  # [B, C, H, W, 1]
        x3 = Conv3d(128, (self.in_channels, 3, 3), (1, 1, 1), (0, 1, 1), kernel_init=_kaiming_uniform, name="conv_3x3")(x)
        x1 = Conv3d(128, (self.in_channels, 1, 1), (1, 1, 1), (0, 0, 0), kernel_init=_kaiming_uniform, name="conv_1x1")(x)
        x = jnp.concatenate([x3, x1], axis=-1)[:, 0]  # [B, H, W, 256]
        x = nn.relu(local_response_norm(x, 256))
        x = Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv1")(x)
        x = nn.relu(local_response_norm(x, 128))
        res = nn.relu(Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv2")(x))
        res = Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv3")(res)
        x = nn.relu(x + res)
        res = nn.relu(Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv4")(x))
        res = Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv5")(res)
        x = nn.relu(x + res)
        x = nn.relu(Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv6")(x))
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.relu(Conv2d(128, (1, 1), kernel_init=_kaiming_uniform, name="conv7")(x))
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = Conv2d(self.n_classes, (1, 1), kernel_init=_kaiming_uniform, name="conv8")(x)
        return jnp.moveaxis(x, -1, 1)  # [B, n_classes, H, W]


class ChenEtAl(nn.Module):
    """3-D CNN (DeepHyperX/models.py:471-529)."""

    input_channels: int
    n_classes: int
    patch_size: int = 27
    n_planes: int = 32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _to_channels_last_3d(x)
        x = nn.relu(Conv3d(self.n_planes, (32, 4, 4), kernel_init=nn.initializers.normal(0.001), name="conv1")(x))
        x = max_pool_3d(x, (1, 2, 2))
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.relu(Conv3d(self.n_planes, (32, 4, 4), kernel_init=nn.initializers.normal(0.001), name="conv2")(x))
        x = max_pool_3d(x, (1, 2, 2))
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        x = nn.relu(Conv3d(self.n_planes, (32, 4, 4), kernel_init=nn.initializers.normal(0.001), name="conv3")(x))
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return nn.Dense(
            self.n_classes, kernel_init=nn.initializers.normal(0.001), name="fc"
        )(_flatten_torch_order(x))


class LiEtAl(nn.Module):
    """Two-layer 3-D CNN + FC (Li et al. 2017; DeepHyperX/models.py:532-586).
    The baseline model used by the reference finetune driver
    (finetune.py:58-65) with n_planes=16."""

    input_channels: int
    n_classes: int
    n_planes: int = 2
    patch_size: int = 5

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _to_channels_last_3d(x)
        init = nn.initializers.xavier_uniform()
        x = nn.relu(
            nn.Conv(
                self.n_planes, (7, 3, 3), padding=[(1, 1), (0, 0), (0, 0)],
                kernel_init=init, name="conv1",
            )(x)
        )
        x = nn.relu(
            nn.Conv(
                2 * self.n_planes, (3, 3, 3), padding=[(1, 1), (0, 0), (0, 0)],
                kernel_init=init, name="conv2",
            )(x)
        )
        return nn.Dense(self.n_classes, kernel_init=init, name="fc")(_flatten_torch_order(x))


class HeEtAl(nn.Module):
    """Multi-scale 3-D CNN (DeepHyperX/models.py:589-667)."""

    input_channels: int
    n_classes: int
    patch_size: int = 7

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _to_channels_last_3d(x)
        x = nn.relu(Conv3d(16, (11, 3, 3), (3, 1, 1), kernel_init=_kaiming_uniform, name="conv1")(x))
        branches = [
            Conv3d(16, (1, 1, 1), padding=(0, 0, 0), kernel_init=_kaiming_uniform, name="conv2_1")(x),
            Conv3d(16, (3, 1, 1), padding=(1, 0, 0), kernel_init=_kaiming_uniform, name="conv2_2")(x),
            Conv3d(16, (5, 1, 1), padding=(2, 0, 0), kernel_init=_kaiming_uniform, name="conv2_3")(x),
            Conv3d(16, (11, 1, 1), padding=(5, 0, 0), kernel_init=_kaiming_uniform, name="conv2_4")(x),
        ]
        x = nn.relu(sum(branches))
        branches = [
            Conv3d(16, (1, 1, 1), padding=(0, 0, 0), kernel_init=_kaiming_uniform, name="conv3_1")(x),
            Conv3d(16, (3, 1, 1), padding=(1, 0, 0), kernel_init=_kaiming_uniform, name="conv3_2")(x),
            Conv3d(16, (5, 1, 1), padding=(2, 0, 0), kernel_init=_kaiming_uniform, name="conv3_3")(x),
            Conv3d(16, (11, 1, 1), padding=(5, 0, 0), kernel_init=_kaiming_uniform, name="conv3_4")(x),
        ]
        x = nn.relu(sum(branches))
        x = nn.relu(Conv3d(16, (3, 2, 2), kernel_init=_kaiming_uniform, name="conv4")(x))
        x = _flatten_torch_order(x)
        x = nn.Dropout(0.6)(x, deterministic=deterministic)
        return nn.Dense(self.n_classes, kernel_init=_kaiming_uniform, name="fc")(x)


class LuoEtAl(nn.Module):
    """HSI-CNN (DeepHyperX/models.py:670-727)."""

    input_channels: int
    n_classes: int
    patch_size: int = 3
    n_planes: int = 90

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = _to_channels_last_3d(x)
        x = nn.relu(Conv3d(self.n_planes, (24, 3, 3), (9, 1, 1), kernel_init=_kaiming_uniform, name="conv1")(x))
        b = x.shape[0]
        # torch: x.view(b, 1, -1, n_planes) on [b, planes, D, 1, 1] — plane-major
        x = jnp.moveaxis(x, -1, 1)  # [b, planes, D, h', w']
        x = x.reshape(b, -1, self.n_planes, 1)  # [b, rows, planes, 1ch]
        x = nn.relu(nn.Conv(64, (3, 3), padding="VALID", kernel_init=_kaiming_uniform, name="conv2")(x))
        x = _flatten_torch_order(x)
        x = nn.relu(nn.Dense(1024, kernel_init=_kaiming_uniform, name="fc1")(x))
        return nn.Dense(self.n_classes, kernel_init=_kaiming_uniform, name="fc2")(x)


class SharmaEtAl(nn.Module):
    """S-CNN with batch norm (DeepHyperX/models.py:730-807). Uses flax
    BatchNorm (``batch_stats`` collection; pass ``use_running_average`` via
    ``deterministic``)."""

    input_channels: int
    n_classes: int
    patch_size: int = 64

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        def merge_feature_into_depth(t):
            # torch view(b, 1, feat*depth, h, w): feature-major merge of the
            # feature and depth axes back into a single depth with 1 feature
            b, d, h, w, f = t.shape
            t = jnp.moveaxis(t, -1, 1).reshape(b, f * d, h, w)
            return t[..., None]  # [b, f*d, h, w, 1]

        x = _to_channels_last_3d(x)
        x = Conv3d(96, (self.input_channels, 6, 6), (1, 2, 2), kernel_init=_kaiming_normal, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=deterministic, name="conv1_bn")(x))
        x = max_pool_3d(x, (1, 2, 2))
        x = merge_feature_into_depth(x)
        x = Conv3d(256, (96, 3, 3), (1, 2, 2), kernel_init=_kaiming_normal, name="conv2")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=deterministic, name="conv2_bn")(x))
        x = max_pool_3d(x, (1, 2, 2))
        x = merge_feature_into_depth(x)
        x = nn.relu(Conv3d(512, (256, 3, 3), (1, 1, 1), kernel_init=_kaiming_normal, name="conv3")(x))
        x = _flatten_torch_order(x)
        x = nn.Dense(1024, kernel_init=_kaiming_normal, name="fc1")(x)
        x = nn.Dropout(0.5)(x, deterministic=deterministic)
        return nn.Dense(self.n_classes, kernel_init=_kaiming_normal, name="fc2")(x)


class LiuEtAl(nn.Module):
    """Semi-supervised conv encoder + FC decoder with skip connections
    (DeepHyperX/models.py:810-887). Returns (logits, reconstruction)."""

    input_channels: int
    n_classes: int
    patch_size: int = 9
    aux_loss_weight: float = 1.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # input [B, C, H, W] (the caller squeezes the singleton dim)
        if x.ndim == 5:
            x = x[:, 0]
        x = jnp.moveaxis(x, 1, -1)  # [B, H, W, C]
        conv1 = nn.BatchNorm(use_running_average=deterministic, name="conv1_bn")(
            nn.Conv(80, (3, 3), padding="VALID", kernel_init=_kaiming_normal, name="conv1")(x)
        )
        pool1 = nn.max_pool(conv1, (2, 2), strides=(2, 2))
        enc = nn.relu(pool1)
        f_conv1 = _flatten_torch_order(conv1)
        f_pool1 = _flatten_torch_order(pool1)
        f_enc = _flatten_torch_order(enc)

        logits = nn.Dense(self.n_classes, kernel_init=_kaiming_normal, name="fc_enc")(f_enc)

        d = nn.relu(nn.Dense(f_enc.shape[-1], kernel_init=_kaiming_normal, name="fc1_dec")(f_enc))
        d = nn.relu(
            nn.BatchNorm(use_running_average=deterministic, name="fc2_dec_bn")(
                nn.Dense(f_pool1.shape[-1], kernel_init=_kaiming_normal, name="fc2_dec")(d) + f_pool1
            )
        )
        d = nn.relu(
            nn.BatchNorm(use_running_average=deterministic, name="fc3_dec_bn")(
                nn.Dense(f_conv1.shape[-1], kernel_init=_kaiming_normal, name="fc3_dec")(d) + f_conv1
            )
        )
        rec = nn.Dense(self.input_channels, kernel_init=_kaiming_normal, name="fc4_dec")(d)
        return logits, rec


class BoulchEtAl(nn.Module):
    """1-D convolutional autoencoder + linear classifier
    (DeepHyperX/models.py:890-957). Returns (logits, reconstruction)."""

    input_channels: int
    n_classes: int
    planes: int = 16
    aux_loss_weight: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(x.shape[0], self.input_channels, 1)  # [B, C, 1ch]
        n = self.input_channels
        idx = 0  # torch nn.Sequential index (conv, pool, relu, bn per block)
        while n > 1:
            # (the reference tracks in/out channel pairs; only the out
            # width matters here — flax infers input channels)
            feats = 2 * self.planes if n == self.input_channels else self.planes
            x = nn.Conv(
                feats, (3,), padding=[(1, 1)], kernel_init=_kaiming_normal,
                name=f"encoder_{idx}",
            )(x)
            x = nn.max_pool(x, (2,), strides=(2,))
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=deterministic, name=f"encoder_{idx + 3}")(x)
            n = n // 2
            idx += 4
        x = jnp.tanh(nn.Conv(3, (3,), padding=[(1, 1)], kernel_init=_kaiming_normal, name=f"encoder_{idx}")(x))
        feat = _flatten_torch_order(x)
        logits = nn.Dense(self.n_classes, kernel_init=_kaiming_normal, name="classifier")(feat)
        rec = nn.Dense(self.input_channels, kernel_init=_kaiming_normal, name="regressor")(feat)
        return logits, rec


class TorchGRUCell(nn.Module):
    """GRU cell with torch ``nn.GRU`` parameterization and gate semantics.

    flax's ``nn.GRUCell`` cannot represent a torch GRU exactly: torch adds an
    input-side bias ``b_in`` OUTSIDE the ``r ⊙ (W_hn h + b_hn)`` product while
    flax's input denses are bias-free — so torch weights are not importable
    into it. This cell keeps torch's exact form (gate order r, z, n; both
    ``b_ih`` and ``b_hh``), making checkpoint import a pure transpose.
    """

    hidden: int

    @nn.compact
    def __call__(self, h, x):
        k = 1.0 / math.sqrt(self.hidden)

        def init(key, shape, dtype=jnp.float32):  # torch default U(-k, k)
            return jax.random.uniform(key, shape, dtype, -k, k)

        wi = self.param("weight_ih", init, (x.shape[-1], 3 * self.hidden))
        wh = self.param("weight_hh", init, (self.hidden, 3 * self.hidden))
        bi = self.param("bias_ih", init, (3 * self.hidden,))
        bh = self.param("bias_hh", init, (3 * self.hidden,))
        gi = x @ wi + bi
        gh = h @ wh + bh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h = (1.0 - z) * n + z * h
        return h, h


class MouEtAl(nn.Module):
    """GRU over the spectral sequence (DeepHyperX/models.py:960-995).
    The recurrence runs as a ``lax.scan`` over bands (sequential by nature;
    per-step matmuls batch over pixels)."""

    input_channels: int
    n_classes: int

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = x.reshape(x.shape[0], self.input_channels, 1)  # [B, C, 1]
        gru = TorchGRUCell(hidden=64, name="gru")
        carry = jnp.zeros((x.shape[0], 64), x.dtype)

        def step(cell, carry, inp):
            return cell(carry, inp)

        scan = nn.transforms.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        _, seq = scan(gru, carry, x)  # [B, C, 64]
        flat = seq.swapaxes(1, 2).reshape(x.shape[0], -1)  # torch view order [B, 64*C]
        flat = nn.BatchNorm(use_running_average=deterministic, name="gru_bn")(flat)
        return nn.Dense(self.n_classes, name="fc")(jnp.tanh(flat))


# --- factory ----------------------------------------------------------------

def get_model(name: str, **kwargs) -> Tuple[Any, Dict, Dict, Dict]:
    """Mirror of the reference factory (DeepHyperX/models.py:20-202).

    Returns ``(model, optimizer_spec, criterion_spec, hyperparams)`` where
    optimizer_spec feeds maskedsst_tpu.train.optim.build_optimizer and
    criterion_spec describes the loss (weights follow the reference's
    ``weights[ignored_labels] = 0`` — including its quirk that label -1
    zeroes the LAST class).
    """
    n_classes = kwargs["n_classes"]
    n_bands = kwargs["n_bands"]
    weights = np.ones(n_classes, np.float32)
    for lab in kwargs.get("ignored_labels", []):
        weights[lab] = 0.0
    weights = kwargs.setdefault("weights", weights)

    def ce():
        return {"type": "cross_entropy", "weight": weights}

    if name == "nn":
        kwargs.setdefault("patch_size", 1)
        center_pixel = True
        model = Baseline(n_classes=n_classes, dropout=bool(kwargs.setdefault("dropout", False)))
        opt = {"name": "Adam", "learning_rate": kwargs.setdefault("learning_rate", 0.0001)}
        kwargs.setdefault("epoch", 100)
        kwargs.setdefault("batch_size", 100)
    elif name == "hamida":
        patch_size = kwargs.setdefault("patch_size", 5)
        center_pixel = True
        model = HamidaEtAl(input_channels=n_bands, n_classes=n_classes, patch_size=patch_size)
        opt = {
            "name": "SGD",
            "learning_rate": kwargs.setdefault("learning_rate", 0.01),
            "weight_decay": 0.0005,
        }
        kwargs.setdefault("batch_size", 100)
    elif name == "lee":
        kwargs.setdefault("epoch", 200)
        kwargs.setdefault("patch_size", 5)
        center_pixel = False
        model = LeeEtAl(in_channels=n_bands, n_classes=n_classes)
        opt = {"name": "Adam", "learning_rate": kwargs.setdefault("learning_rate", 0.001)}
    elif name == "chen":
        patch_size = kwargs.setdefault("patch_size", 27)
        center_pixel = True
        model = ChenEtAl(input_channels=n_bands, n_classes=n_classes, patch_size=patch_size)
        opt = {"name": "SGD", "learning_rate": kwargs.setdefault("learning_rate", 0.003)}
        kwargs.setdefault("epoch", 400)
        kwargs.setdefault("batch_size", 100)
    elif name == "li":
        patch_size = kwargs.setdefault("patch_size", 5)
        center_pixel = True
        model = LiEtAl(
            input_channels=n_bands, n_classes=n_classes, n_planes=16, patch_size=patch_size
        )
        opt = {
            "name": "SGD",
            "learning_rate": kwargs.setdefault("learning_rate", 0.01),
            "weight_decay": 0.0005,
            "momentum": 0.9,  # DeepHyperX/models.py:80-82 (li only)
        }
        kwargs.setdefault("epoch", 200)
    elif name == "hu":
        kwargs.setdefault("patch_size", 1)
        center_pixel = True
        model = HuEtAl(input_channels=n_bands, n_classes=n_classes)
        opt = {"name": "SGD", "learning_rate": kwargs.setdefault("learning_rate", 0.01)}
        kwargs.setdefault("epoch", 100)
        kwargs.setdefault("batch_size", 100)
    elif name == "he":
        kwargs.setdefault("patch_size", 7)
        kwargs.setdefault("batch_size", 40)
        center_pixel = True
        model = HeEtAl(input_channels=n_bands, n_classes=n_classes, patch_size=kwargs["patch_size"])
        opt = {
            "name": "Adagrad",
            "learning_rate": kwargs.setdefault("learning_rate", 0.01),
            "weight_decay": 0.01,
        }
    elif name == "luo":
        kwargs.setdefault("patch_size", 3)
        kwargs.setdefault("batch_size", 100)
        center_pixel = True
        model = LuoEtAl(input_channels=n_bands, n_classes=n_classes, patch_size=kwargs["patch_size"])
        opt = {
            "name": "SGD",
            "learning_rate": kwargs.setdefault("learning_rate", 0.1),
            "weight_decay": 0.09,
        }
    elif name == "sharma":
        kwargs.setdefault("batch_size", 60)
        epoch = kwargs.setdefault("epoch", 30)
        # reference: MultiStepLR decaying x0.1 at epoch//2 and 5*epoch//6
        # (DeepHyperX/models.py:137-143)
        kwargs.setdefault(
            "scheduler",
            {"type": "MultiStepLR", "milestones": [epoch // 2, (5 * epoch) // 6], "gamma": 0.1},
        )
        center_pixel = True
        kwargs.setdefault("patch_size", 64)
        model = SharmaEtAl(input_channels=n_bands, n_classes=n_classes, patch_size=kwargs["patch_size"])
        opt = {
            "name": "SGD",
            "learning_rate": kwargs.setdefault("lr", 0.05),
            "weight_decay": 0.0005,
        }
    elif name == "liu":
        kwargs["supervision"] = "semi"
        kwargs.setdefault("epoch", 40)
        center_pixel = True
        patch_size = kwargs.setdefault("patch_size", 9)
        model = LiuEtAl(input_channels=n_bands, n_classes=n_classes, patch_size=patch_size)
        opt = {"name": "SGD", "learning_rate": kwargs.setdefault("lr", 0.001)}
    elif name == "boulch":
        kwargs["supervision"] = "semi"
        kwargs.setdefault("patch_size", 1)
        kwargs.setdefault("epoch", 100)
        center_pixel = True
        model = BoulchEtAl(input_channels=n_bands, n_classes=n_classes)
        opt = {"name": "SGD", "learning_rate": kwargs.setdefault("lr", 0.001)}
    elif name == "mou":
        kwargs.setdefault("patch_size", 1)
        center_pixel = True
        kwargs.setdefault("epoch", 100)
        model = MouEtAl(input_channels=n_bands, n_classes=n_classes)
        opt = {"name": "Adadelta", "learning_rate": kwargs.setdefault("lr", 1.0)}
    else:
        raise KeyError(f"{name} model is unknown.")

    kwargs.setdefault("epoch", 100)
    kwargs.setdefault("batch_size", 100)
    kwargs.setdefault("supervision", "full")
    kwargs.setdefault("flip_augmentation", False)
    kwargs.setdefault("radiation_augmentation", False)
    kwargs.setdefault("mixture_augmentation", False)
    kwargs["center_pixel"] = center_pixel
    opt.setdefault("weight_decay", 0.0)
    return model, opt, ce(), kwargs
