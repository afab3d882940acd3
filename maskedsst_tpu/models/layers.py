"""Transformer building blocks with PyTorch-parity numerics.

The reference uses a lucidrains-style pre-norm transformer
(src/vit_spatial_spectral.py:22-104). For checkpoint-logits parity we pin:

* LayerNorm epsilon 1e-5 (torch default; flax default is 1e-6),
* exact (erf) GELU (torch default; flax ``nn.gelu`` default is tanh-approx),
* attention: fused QKV projection without bias, per-head scale
  ``dim_head**-0.5``, output projection with bias whenever
  ``heads*dim_head != dim`` ("project_out").

Compute dtype is configurable: bf16 for training throughput (params stay
fp32), fp32 for parity harnesses. Attention softmax always runs in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# torch nn.LayerNorm epsilon
LN_EPS = 1e-5


class FeedForward(nn.Module):
    """MLP block: Linear → exact GELU → dropout → Linear → dropout
    (reference src/vit_spatial_spectral.py:32-44)."""

    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    """Multi-head self-attention (reference src/vit_spatial_spectral.py:47-78).

    Operates on [..., n, dim]; all leading axes are batch. The factorized
    model folds the spectral (or spatial) token axis into the batch, so this
    runs as a large batched matmul on the MXU rather than one long sequence.
    """

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        inner_dim = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        scale = self.dim_head**-0.5

        qkv = nn.Dense(inner_dim * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):  # [..., n, h*dh] -> [..., h, n, dh]
            t = t.reshape(*t.shape[:-1], self.heads, self.dim_head)
            return jnp.swapaxes(t, -3, -2)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)

        logits = jnp.einsum(
            "...nd,...md->...nm", q, k, preferred_element_type=jnp.float32
        )
        attn = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
        if self.dtype is not None:
            attn = attn.astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)

        out = jnp.einsum("...nm,...md->...nd", attn, v)
        out = jnp.swapaxes(out, -3, -2)  # [..., n, h, dh]
        out = out.reshape(*out.shape[:-2], inner_dim)

        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerBlock(nn.Module):
    """Pre-norm residual block: x + Attn(LN(x)); x + FF(LN(x))
    (reference PreNorm + layer loop, src/vit_spatial_spectral.py:22-29,100-104)."""

    dim: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="attn_norm")(x)
        x = x + Attention(
            self.dim, self.heads, self.dim_head, self.dropout, self.dtype, name="attn"
        )(h, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ff_norm")(x)
        x = x + FeedForward(
            self.dim, self.mlp_dim, self.dropout, self.dtype, name="ff"
        )(h, deterministic=deterministic)
        return x


class Transformer(nn.Module):
    """Stack of ``depth`` pre-norm blocks (reference Transformer,
    src/vit_spatial_spectral.py:81-104)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim,
                self.heads,
                self.dim_head,
                self.mlp_dim,
                self.dropout,
                self.dtype,
                name=f"layers_{i}",
            )(x, deterministic=deterministic)
        return x


class FusedTransformer(nn.Module):
    """Drop-in replacement for :class:`Transformer` backed by the fused
    Pallas layer kernel (maskedsst_tpu/ops/fused_layer.py).

    The parameter tree is bit-identical to Transformer's (each layer's
    params are declared as one pytree-valued param with the same nested
    names), so checkpoints and the torch importer work unchanged and the two
    implementations are interchangeable at ``apply`` time.

    Dropout runs inside the kernel from the 'dropout' RNG stream. Sequences
    are the factorized model's folded axes ([B', S, D]); inputs with extra
    leading batch dims are flattened for the kernel and restored after.

    ``mesh``: when given a mesh whose ``data`` axis has >1 devices, each
    layer's kernel call is wrapped in ``jax.shard_map`` over that axis —
    batch sharded, params replicated — so partitioning is explicit and
    guaranteed rather than left to GSPMD, which treats the Mosaic custom
    call as opaque and would all-gather the batch onto every chip. The
    backward (custom VJP) runs under the same shard_map; the transpose of
    the replicated-param broadcast inserts the gradient ``psum`` over ICI.
    Per-device dropout streams are decorrelated by folding
    ``lax.axis_index('data')`` into the layer seed.
    """

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None
    interpret: bool = False
    mesh: Optional[jax.sharding.Mesh] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        from maskedsst_tpu.ops.fused_layer import LayerParams, fused_transformer_layer

        inner = self.heads * self.dim_head
        kernel_init = nn.initializers.lecun_normal()
        # reference Attention skips the output projection (and its dropout)
        # entirely when heads == 1 and dim_head == dim
        # (src/vit_spatial_spectral.py:56-60); mirror that so the param tree
        # stays bit-identical to Transformer's in every configuration
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        def layer_init(rng):
            ks = jax.random.split(rng, 4)
            attn = {"to_qkv": {"kernel": kernel_init(ks[0], (self.dim, 3 * inner))}}
            if project_out:
                attn["to_out"] = {
                    "kernel": kernel_init(ks[1], (inner, self.dim)),
                    "bias": jnp.zeros((self.dim,)),
                }
            return {
                "attn_norm": {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))},
                "attn": attn,
                "ff_norm": {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))},
                "ff": {
                    "fc1": {
                        "kernel": kernel_init(ks[2], (self.dim, self.mlp_dim)),
                        "bias": jnp.zeros((self.mlp_dim,)),
                    },
                    "fc2": {
                        "kernel": kernel_init(ks[3], (self.mlp_dim, self.dim)),
                        "bias": jnp.zeros((self.dim,)),
                    },
                },
            }

        train = not deterministic and self.dropout > 0.0
        if train:
            base_seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max
            )
        else:
            base_seed = jnp.zeros((), jnp.int32)

        lead = x.shape[:-2]
        xb = x.reshape(-1, x.shape[-2], x.shape[-1])
        compute_dtype = self.dtype or jnp.float32
        # Mosaic only targets TPU; fall back to the interpreter elsewhere so
        # the fused path stays runnable (and testable) on CPU
        interpret = self.interpret or jax.default_backend() == "cpu"

        from maskedsst_tpu.parallel.mesh import data_axis_or_warn

        n_data = data_axis_or_warn(self.mesh, xb.shape[0], "FusedTransformer")
        if n_data > 1:
            from jax.sharding import PartitionSpec as P

            def run_layer(xs, ps, seed):
                # decorrelate per-device dropout streams; fwd and bwd derive
                # the identical per-shard seed, so masks stay consistent.
                # The odd multiplier MUST differ from _keep_mask's block
                # mixer (-1640531527): with the same constant, device d's
                # block b would reproduce device d+1's block b-1 seeds and
                # adjacent devices would reuse nearly all dropout masks.
                seed = seed + jax.lax.axis_index("data") * jnp.int32(668265261)
                return fused_transformer_layer(
                    xs, ps, seed, self.heads, self.dim_head, compute_dtype,
                    self.dropout, train, interpret, project_out,
                )

            run_layer = jax.shard_map(
                run_layer,
                mesh=self.mesh,
                in_specs=(P("data"), P(), P()),
                out_specs=P("data"),
                check_vma=False,
            )
        else:
            def run_layer(xs, ps, seed):
                return fused_transformer_layer(
                    xs, ps, seed, self.heads, self.dim_head, compute_dtype,
                    self.dropout, train, interpret, project_out,
                )

        for i in range(self.depth):
            tree = self.param(f"layers_{i}", layer_init)
            if project_out:
                wout = tree["attn"]["to_out"]["kernel"]
                bout = tree["attn"]["to_out"]["bias"]
            else:  # identity projection, no params (and no proj dropout)
                wout = jnp.eye(inner, self.dim, dtype=jnp.float32)
                bout = jnp.zeros((self.dim,), jnp.float32)
            p = LayerParams(
                ln1_scale=tree["attn_norm"]["scale"],
                ln1_bias=tree["attn_norm"]["bias"],
                wqkv=tree["attn"]["to_qkv"]["kernel"],
                wout=wout,
                bout=bout,
                ln2_scale=tree["ff_norm"]["scale"],
                ln2_bias=tree["ff_norm"]["bias"],
                w1=tree["ff"]["fc1"]["kernel"],
                b1=tree["ff"]["fc1"]["bias"],
                w2=tree["ff"]["fc2"]["kernel"],
                b2=tree["ff"]["fc2"]["bias"],
            )
            xb = run_layer(xb, p, base_seed + jnp.int32(i))
        return xb.reshape(*lead, x.shape[-2], x.shape[-1])


class BlockwisePatchEmbedding(nn.Module):
    """Per-spectral-block linear patch embedding as one batched einsum.

    The reference keeps ``num_blocks`` separate ``nn.Linear(patch_dim, dim)``
    modules and loops over them in Python
    (src/vit_spatial_spectral.py:203-222). On TPU that is ``num_blocks`` tiny
    matmuls and a stack; here the weights live in a single
    ``[num_blocks, patch_dim, dim]`` tensor contracted in one einsum, which
    XLA tiles onto the MXU in one shot. The checkpoint importer stacks the
    reference's per-block weights into this layout.

    Input:  cube [B, C, H, W] with C = num_blocks * patch_depth.
    Output: tokens [B, num_blocks * n_spatial, dim], block-major token order
            (all spatial positions of block 0, then block 1, ...).
    """

    num_channels: int
    dim: int
    patch_depth: int
    patch_height: int
    patch_width: int
    dtype: Optional[jnp.dtype] = None

    @property
    def num_blocks(self) -> int:
        return self.num_channels // self.patch_depth

    @property
    def patch_dim(self) -> int:
        return self.patch_depth * self.patch_height * self.patch_width

    def to_patch(self, x):
        """[B, C, H, W] → patches [B, g, n, p]: g spectral blocks, n spatial
        patches (row-major), p = patch_depth*patch_height*patch_width pixels,
        ordered (p0, p1, p2) like the reference einops pattern
        ``b (c p0) (h p1) (w p2) -> b c (h w) (p0 p1 p2)``."""
        b, c, hh, ww = x.shape
        g, p0 = self.num_blocks, self.patch_depth
        p1, p2 = self.patch_height, self.patch_width
        h, w = hh // p1, ww // p2
        x = x.reshape(b, g, p0, h, p1, w, p2)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)  # b g h w p0 p1 p2
        return x.reshape(b, g, h * w, p0 * p1 * p2)

    def to_patch_pn(self, x):
        """[B, C, H, W] → patches [B, g, p, n] — same contents as
        :meth:`to_patch` with the (n, p) axes swapped. For 1x1 spatial
        patches (the reference recipe) this is a PURE RESHAPE: no transpose,
        and no [.., n, p] array whose 10-wide trailing dim would tile onto
        128 TPU lanes at ~8% utilization (measured ~0.3 ms/step of
        data-formatting copies at the reference recipe)."""
        b, c, hh, ww = x.shape
        g, p0 = self.num_blocks, self.patch_depth
        p1, p2 = self.patch_height, self.patch_width
        if p1 == 1 and p2 == 1:
            return x.reshape(b, g, p0, hh * ww)
        h, w = hh // p1, ww // p2
        x = x.reshape(b, g, p0, h, p1, w, p2)
        x = x.transpose(0, 1, 2, 4, 6, 3, 5)  # b g p0 p1 p2 h w
        return x.reshape(b, g, p0 * p1 * p2, h * w)

    @nn.compact
    def embed(self, patches):
        """patches [B, g, n, p] → tokens [B, g*n, dim].

        One batched einsum over the block axis, consuming the block-major
        patch layout directly. An earlier revision expanded the kernel to a
        block-diagonal [g*p, g*d] dense matmul instead — device-time
        profiling (deterministic module timings, see CLAUDE.md) shows the
        batched form is faster end-to-end because it needs no [B,g,n,p] ↔
        [B,n,g*p] transposes (physical relayouts under TPU tiling), while
        the batched matmul's per-instance cost is negligible at g=20."""
        patches = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="pre_norm")(patches)
        kernel = self.param(
            "blockwise_kernel",
            nn.initializers.lecun_normal(),
            (self.num_blocks, self.patch_dim, self.dim),
        )
        bias = self.param(
            "blockwise_bias", nn.initializers.zeros, (self.num_blocks, self.dim)
        )
        dtype = self.dtype or patches.dtype
        b, g, n, _ = patches.shape
        tokens = jnp.einsum(
            "bgnp,gpd->bgnd",
            patches.astype(dtype),
            kernel.astype(dtype),
            preferred_element_type=dtype,
        )
        tokens = tokens + bias.astype(dtype)[None, :, None, :]
        tokens = tokens.reshape(b, g * n, self.dim)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="post_norm")(tokens)

    @nn.compact
    def embed_pn(self, patches_pn):
        """patches [B, g, p, n] (see :meth:`to_patch_pn`) → tokens
        [B, g*n, dim]. Identical math and parameter tree as :meth:`embed`
        (the pre-norm LayerNorm normalizes the p axis, here axis -2), with
        the einsum contracting p straight out of the sublane dimension — the
        [.., n, p] lane-hostile intermediate never exists."""
        patches_pn = nn.LayerNorm(
            epsilon=LN_EPS, dtype=self.dtype, name="pre_norm",
            reduction_axes=-2, feature_axes=-2,
        )(patches_pn)
        kernel = self.param(
            "blockwise_kernel",
            nn.initializers.lecun_normal(),
            (self.num_blocks, self.patch_dim, self.dim),
        )
        bias = self.param(
            "blockwise_bias", nn.initializers.zeros, (self.num_blocks, self.dim)
        )
        dtype = self.dtype or patches_pn.dtype
        b, g, _, n = patches_pn.shape
        tokens = jnp.einsum(
            "bgpn,gpd->bgnd",
            patches_pn.astype(dtype),
            kernel.astype(dtype),
            preferred_element_type=dtype,
        )
        tokens = tokens + bias.astype(dtype)[None, :, None, :]
        tokens = tokens.reshape(b, g * n, self.dim)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="post_norm")(tokens)

    @nn.compact
    def embed_mask_fused(
        self, patches_pn, pos, mask_token, mask, mesh=None, interpret: bool = False
    ):
        """Fused SimMIM tokenization head (ops/fused_embed.py): pre-LN →
        blockwise embed → post-LN → +pos → mask-token replacement, one
        Pallas kernel per batch block, custom-VJP backward. Declares the
        identical parameter tree as :meth:`embed`/:meth:`embed_pn` (exactly
        one of the methods runs per trace): ``pre_norm``/``post_norm`` as
        dict-valued params with the LayerNorm leaf names.

        patches_pn [B, g, p, n]; pos [g, n, d]; mask [B, g, n] 0/1 float.
        Returns tokens [B, g, n, d]. On a multi-device ``data`` mesh the
        call is shard_mapped over the batch (GSPMD treats Mosaic custom
        calls as opaque)."""
        from maskedsst_tpu.ops.fused_embed import fused_embed_mask

        pd = self.patch_dim
        pre = self.param(
            "pre_norm",
            lambda rng: {"scale": jnp.ones((pd,)), "bias": jnp.zeros((pd,))},
        )
        kernel = self.param(
            "blockwise_kernel",
            nn.initializers.lecun_normal(),
            (self.num_blocks, pd, self.dim),
        )
        bias = self.param(
            "blockwise_bias", nn.initializers.zeros, (self.num_blocks, self.dim)
        )
        post = self.param(
            "post_norm",
            lambda rng: {"scale": jnp.ones((self.dim,)), "bias": jnp.zeros((self.dim,))},
        )
        # match embed_pn's default (self.dtype or input dtype) so the fused
        # and XLA paths stay numerically interchangeable when dtype is None
        compute_dtype = self.dtype or patches_pn.dtype
        interpret = interpret or jax.default_backend() == "cpu"

        from maskedsst_tpu.parallel.mesh import data_axis_or_warn

        n_data = data_axis_or_warn(
            mesh, patches_pn.shape[0], "BlockwisePatchEmbedding.embed_mask_fused"
        )
        if n_data > 1:
            from jax.sharding import PartitionSpec as P

            def run(pp, mm, prs, prb, k, bs, pls, plb, po, mt):
                return fused_embed_mask(
                    pp, mm, prs, prb, k, bs, pls, plb, po, mt,
                    compute_dtype, interpret,
                )

            return jax.shard_map(
                run,
                mesh=mesh,
                in_specs=(P("data"), P("data")) + (P(),) * 8,
                out_specs=P("data"),
                check_vma=False,
            )(
                patches_pn, mask, pre["scale"], pre["bias"], kernel, bias,
                post["scale"], post["bias"], pos, mask_token,
            )
        return fused_embed_mask(
            patches_pn, mask, pre["scale"], pre["bias"], kernel, bias,
            post["scale"], post["bias"], pos, mask_token,
            compute_dtype, interpret,
        )

    def __call__(self, x):
        if self.patch_height == 1 and self.patch_width == 1:
            return self.embed_pn(self.to_patch_pn(x))
        return self.embed(self.to_patch(x))


class PatchEmbed(nn.Module):
    """Shared (non-blockwise) patch embedding
    (reference PatchEmbed, src/vit_spatial_spectral.py:232-253):
    ``to_patch`` = rearrange to [B, g*n, p] + LN(p); ``embed`` = Linear(p, dim)
    + LN(dim). The pre-norm LN deliberately sits inside ``to_patch`` because
    the SimMIM wrapper reconstructs the output of ``to_patch`` — with this
    variant the reconstruction targets are layer-normed patches, unlike the
    blockwise variant whose targets are raw pixels."""

    dim: int
    patch_depth: int
    patch_height: int
    patch_width: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def to_patch(self, x):
        """[B, C, H, W] → layer-normed patches [B, g*n, p] (block-major,
        same token order as the blockwise variant)."""
        b, c, hh, ww = x.shape
        p0, p1, p2 = self.patch_depth, self.patch_height, self.patch_width
        g, h, w = c // p0, hh // p1, ww // p2
        x = x.reshape(b, g, p0, h, p1, w, p2)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6)
        x = x.reshape(b, g * h * w, p0 * p1 * p2)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="pre_norm")(x)

    @nn.compact
    def embed(self, patches):
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(patches)
        return nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="post_norm")(x)

    def __call__(self, x):
        return self.embed(self.to_patch(x))
