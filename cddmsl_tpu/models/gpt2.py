"""GPT-2 language model in Flax, with KV-cache decode.

Supports the ClipCap caption stack (reference detectron2/modeling/backbone/
clipcap/clipcap.py:166-220 ClipCaptionModel wraps HF GPT2LMHeadModel). This
is the TPU-native replacement for the reference's per-token Python decode
loops (clipcap.py:360-385, 440-494, 732-792) which re-run the full model on a
growing sequence (quadratic): here decode is a fixed-length `lax.scan` over a
preallocated KV cache (SURVEY.md §5 long-context note).

Weights import 1:1 from HF `GPT2LMHeadModel.state_dict()` via
checkpoint.convert_torch-style mapping (HF Conv1D stores (in, out) — no
transpose needed for our Dense kernels).
"""

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class GPT2Config(NamedTuple):
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12


class GPT2Block(nn.Module):
    cfg: GPT2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask, cache: Optional[Dict] = None, cache_index: Optional[jnp.ndarray] = None):
        """x: (B, T, C). mask: (B, 1, T, S) attention mask (True=attend).
        With cache, keys/values are written at cache_index and attention runs
        over the full cache length."""
        c = self.cfg
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x).astype(self.dtype)
        qkv = nn.Dense(3 * c.n_embd, dtype=self.dtype, param_dtype=jnp.float32, name="c_attn")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t, _ = q.shape
        hd = c.n_embd // c.n_head
        q = q.reshape(b, t, c.n_head, hd)
        k = k.reshape(b, t, c.n_head, hd)
        v = v.reshape(b, t, c.n_head, hd)

        if cache is not None:
            # write new k/v at cache_index
            k_cache = jax.lax.dynamic_update_slice(cache["k"], k, (0, cache_index, 0, 0))
            v_cache = jax.lax.dynamic_update_slice(cache["v"], v, (0, cache_index, 0, 0))
            k, v = k_cache, v_cache
            cache = {"k": k_cache, "v": v_cache}

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn / jnp.sqrt(hd).astype(attn.dtype)
        attn = jnp.where(mask, attn, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, t, c.n_embd)
        out = nn.Dense(c.n_embd, dtype=self.dtype, param_dtype=jnp.float32, name="c_proj")(out)
        x = x + out

        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x).astype(self.dtype)
        h = nn.Dense(4 * c.n_embd, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_fc")(h)
        h = 0.5 * h * (1.0 + jnp.tanh(0.7978845608028654 * (h + 0.044715 * h ** 3)))  # gelu_new
        h = nn.Dense(c.n_embd, dtype=self.dtype, param_dtype=jnp.float32, name="mlp_c_proj")(h)
        return x + h, cache


class GPT2LMHead(nn.Module):
    cfg: GPT2Config = GPT2Config()
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        self.wte = self.param("wte", nn.initializers.normal(0.02), (c.vocab_size, c.n_embd))
        self.wpe = self.param("wpe", nn.initializers.normal(0.01), (c.n_positions, c.n_embd))
        self.blocks = [GPT2Block(c, dtype=self.dtype, name=f"h_{i}") for i in range(c.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_f")

    def __call__(
        self,
        input_embeds: jnp.ndarray,  # (B, T, C) — ClipCap feeds embeddings directly
        position_offset: jnp.ndarray = None,  # scalar start position
        attn_mask: Optional[jnp.ndarray] = None,  # (B, S) key validity
        caches: Optional[Tuple[Dict, ...]] = None,
        cache_index: Optional[jnp.ndarray] = None,
    ):
        """Returns (logits (B, T, vocab), new_caches)."""
        c = self.cfg
        b, t, _ = input_embeds.shape
        if position_offset is None:
            positions = jnp.arange(t)
        else:
            positions = jnp.arange(t) + position_offset
        x = input_embeds.astype(self.dtype) + self.wpe[positions].astype(self.dtype)

        s = t if caches is None else caches[0]["k"].shape[1]
        if caches is None:
            causal = jnp.tril(jnp.ones((t, t), bool))
        else:
            # query positions are cache_index..cache_index+t-1; keys 0..S-1
            kpos = jnp.arange(s)[None, :]
            qpos = (jnp.arange(t) + cache_index)[:, None]
            causal = kpos <= qpos
        mask = causal[None, None]
        if attn_mask is not None:
            mask = mask & attn_mask[:, None, None, :]

        new_caches = []
        for i, block in enumerate(self.blocks):
            cache_i = caches[i] if caches is not None else None
            x, new_cache = block(x, mask, cache_i, cache_index)
            new_caches.append(new_cache)
        x = self.ln_f(x)
        logits = x.astype(jnp.float32) @ self.wte.T.astype(jnp.float32)
        return logits, tuple(new_caches) if caches is not None else None

    def embed_tokens(self, tokens: jnp.ndarray) -> jnp.ndarray:
        return self.wte[tokens]


def init_cache(cfg: GPT2Config, batch: int, length: int, dtype=jnp.float32):
    hd = cfg.n_embd // cfg.n_head
    return tuple(
        {
            "k": jnp.zeros((batch, length, cfg.n_head, hd), dtype),
            "v": jnp.zeros((batch, length, cfg.n_head, hd), dtype),
        }
        for _ in range(cfg.n_layer)
    )


def convert_hf_gpt2(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF GPT2LMHeadModel state_dict -> GPT2LMHead params. HF uses Conv1D
    with (in, out) weight layout = flax Dense kernel layout (no transpose)."""
    tree: Dict[str, Any] = {}

    def put(path, v):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v

    for key, val in sd.items():
        k = key[len("transformer."):] if key.startswith("transformer.") else key
        if k == "wte.weight":
            put(("wte",), val)
        elif k == "wpe.weight":
            put(("wpe",), val)
        elif k.startswith("ln_f."):
            put(("ln_f", "scale" if k.endswith("weight") else "bias"), val)
        else:
            import re

            m = re.match(r"^h\.(\d+)\.(.+)$", k)
            if not m:
                continue
            blk, rest = f"h_{m.group(1)}", m.group(2)
            lmap = {
                "ln_1.weight": ("ln_1", "scale"),
                "ln_1.bias": ("ln_1", "bias"),
                "ln_2.weight": ("ln_2", "scale"),
                "ln_2.bias": ("ln_2", "bias"),
                "attn.c_attn.weight": ("c_attn", "kernel"),
                "attn.c_attn.bias": ("c_attn", "bias"),
                "attn.c_proj.weight": ("c_proj", "kernel"),
                "attn.c_proj.bias": ("c_proj", "bias"),
                "mlp.c_fc.weight": ("mlp_c_fc", "kernel"),
                "mlp.c_fc.bias": ("mlp_c_fc", "bias"),
                "mlp.c_proj.weight": ("mlp_c_proj", "kernel"),
                "mlp.c_proj.bias": ("mlp_c_proj", "bias"),
            }
            if rest in lmap:
                put((blk,) + lmap[rest], val)
    return {"params": tree}
