"""CLIP text transformer + ViT visual transformer in Flax.

Re-implements the reference's text stack (detectron2/modeling/backbone/
clip_backbone.py:281-360 ResidualAttentionBlock/Transformer, :732-814
CLIPLangEncoder.encode_text) and the ViT visual encoder
(clip_backbone.py:321-356 VisualTransformer, clip_vit.py): QuickGELU MLPs,
pre-LN residual attention blocks, causal mask for text, EOT-token pooling
(`text.argmax(-1)` — the EOT token has the highest id) @ text_projection.
"""

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def quick_gelu(x):
    """x * sigmoid(1.702 x) — CLIP's GELU variant (clip_backbone.py:281-283)."""
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible layer (packed qkv in_proj +
    out_proj) so converted CLIP weights drop in 1:1."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        n, l, c = x.shape
        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,))
        qkv = x @ in_proj_w.T.astype(self.dtype) + in_proj_b.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c // self.heads
        q = q.reshape(n, l, self.heads, hd)
        k = k.reshape(n, l, self.heads, hd)
        v = v.reshape(n, l, self.heads, hd)
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(hd).astype(attn.dtype)
        if causal:
            mask = jnp.tril(jnp.ones((l, l), dtype=bool))
            attn = jnp.where(mask[None, None], attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, l, c)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block with QuickGELU MLP (clip_backbone.py:286-307)."""

    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        ln1 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")  # LN in fp32 like reference LayerNorm
        ln2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")
        x = x + MultiheadAttention(self.width, self.heads, dtype=self.dtype, name="attn")(
            ln1(x).astype(self.dtype), causal=causal
        )
        h = ln2(x).astype(self.dtype)
        h = nn.Dense(self.width * 4, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """The reference CLIPLangEncoder (clip_backbone.py:732-814): 12-layer
    width-512 causal transformer over BPE tokens, EOT pooling to embed_dim.

    setup()-style so the block stack can be pipelined: with `pipeline_axis`
    set (and a mesh installed via jax.sharding.set_mesh carrying that axis),
    the resblocks run as a GPipe pipeline over the axis
    (parallel/pp.py pipeline_blocks) — per-block params stay under their
    `resblocks_i` names (checkpoint layout unchanged); stacking happens
    in-graph. The list attribute name `resblocks` auto-derives the same
    `resblocks_{i}` param names the compact form used."""

    embed_dim: int = 1024
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 512
    heads: int = 8
    layers: int = 12
    dtype: Any = jnp.float32
    pipeline_axis: Optional[str] = None
    pipeline_microbatches: Optional[int] = None

    def setup(self):
        self.token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02), (self.vocab_size, self.width)
        )
        self.positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (self.context_length, self.width)
        )
        self.resblocks = [
            ResidualAttentionBlock(self.width, self.heads, dtype=self.dtype)
            for _ in range(self.layers)
        ]
        self.ln_final = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32)
        self.text_projection = self.param(
            "text_projection", nn.initializers.normal(self.width ** -0.5), (self.width, self.embed_dim)
        )

    def embed(self, text: jnp.ndarray) -> jnp.ndarray:
        return self.token_embedding[text].astype(self.dtype) + self.positional_embedding[
            None
        ].astype(self.dtype)

    def finalize(self, x: jnp.ndarray, text: jnp.ndarray, only_eot: bool = True) -> jnp.ndarray:
        x = self.ln_final(x)
        if only_eot:
            eot = jnp.argmax(text, axis=-1)  # EOT token has the highest id
            x = x[jnp.arange(x.shape[0]), eot]
        return x @ self.text_projection

    def __call__(self, text: jnp.ndarray, only_eot: bool = True) -> jnp.ndarray:
        """text: (N, context_length) int32 token ids -> (N, embed_dim) if
        only_eot else (N, L, embed_dim)."""
        x = self.embed(text)
        if self.pipeline_axis and not self.is_initializing():
            from ...parallel.pp import ambient_mesh, pipeline_batch_spec, pipeline_blocks, stack_trees

            mesh = ambient_mesh()
            assert mesh is not None and self.pipeline_axis in mesh.axis_names, (
                f"pipeline_axis={self.pipeline_axis!r} needs a set_mesh mesh carrying it"
            )
            stacked = stack_trees([b.variables["params"] for b in self.resblocks])
            # parent=None detaches the template from this module's scope so
            # applying it per-stage inside shard_map doesn't register a child
            block = self.resblocks[0].clone(parent=None)
            x = pipeline_blocks(
                lambda bp, a: block.apply({"params": bp}, a, causal=True),
                stacked,
                x,
                mesh,
                axis=self.pipeline_axis,
                microbatches=self.pipeline_microbatches,
                batch_spec=pipeline_batch_spec(mesh),
            )
        else:
            for blk in self.resblocks:
                x = blk(x, causal=True)
        return self.finalize(x, text, only_eot)


class VisualTransformer(nn.Module):
    """CLIP ViT visual encoder (reference clip_backbone.py:321-356 /
    clip_vit.py — unused by the CDDMSL configs, provided for parity)."""

    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, H, W, 3) -> (N, output_dim)."""
        n = x.shape[0]
        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x.astype(self.dtype))
        x = x.reshape(n, -1, self.width)  # (N, grid^2, width)
        cls = self.param("class_embedding", nn.initializers.normal(self.width ** -0.5), (self.width,))
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.width ** -0.5),
            ((self.input_resolution // self.patch_size) ** 2 + 1, self.width),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (n, 1, self.width)), x], axis=1)
        x = x + pos[None].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(self.dtype)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, dtype=self.dtype, name=f"resblocks_{i}"
            )(x, causal=False)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width ** -0.5), (self.width, self.output_dim)
        )
        return x.astype(self.dtype) @ proj.astype(self.dtype)


def build_clip_text_encoder_module(cfg) -> CLIPTextEncoder:
    """Config -> CLIPTextEncoder (reference build_clip_language_encoder,
    clip_backbone.py:817-877)."""
    depth = cfg.MODEL.RESNETS.DEPTH
    width = {50: 512, 101: 512, 200: 640}[depth]
    heads = {50: 8, 101: 8, 200: 10}[depth]
    embed = {50: 1024, 101: 512, 200: 640}[depth]
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return CLIPTextEncoder(
        embed_dim=embed,
        context_length=cfg.MODEL.TEXT_ENCODER.CONTEXT_LENGTH,
        vocab_size=cfg.MODEL.TEXT_ENCODER.VOCAB_SIZE,
        width=width,
        heads=heads,
        layers=cfg.MODEL.TEXT_ENCODER.LAYERS,
        dtype=dtype,
    )
