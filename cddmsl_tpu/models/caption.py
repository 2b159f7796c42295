"""ClipCap caption model: frozen mapper + GPT-2, with TPU-native decode.

Re-implements the reference ClipCaptionModel stack (detectron2/modeling/
backbone/clipcap/clipcap.py):
  * ClipCaptionModel / ClipCaptionPrefix (:166-223): CLIP prefix -> mapper ->
    GPT-2; teacher-forced caption CE
  * greedy / top-p(0.8) decode (`generate2` :732-792, `generate_beam`-family
    variants, entry_length 40/67, stop token ".")
  * pseudo_labeling_loss (:335-413): decode pseudo-caption tokens from the
    source view (no grad), teacher-force the target view onto them
  * unsupervised_loss (:416-499): per-step KL between source and target
    decode distributions
  * generate_feature_caption (:589-643) / generate_first_feature_caption
    (:646-711): hidden-state features along the decode path

The reference decodes token-by-token in Python, re-running GPT-2 on the
growing sequence per step *per region* (quadratic; SURVEY.md §5). Here decode
is a single `lax.scan` over a preallocated KV cache: prefill the 40-token
prefix once, then one fused step per token.
"""

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .clipcap import TransformerMapper
from .gpt2 import GPT2Config, GPT2LMHead, init_cache

STOP_TOKEN = 13  # "." in the GPT-2 BPE vocab (reference uses tokenizer.encode('.')[0])


class ClipCaptionModel(nn.Module):
    prefix_length: int = 40
    clip_length: int = 40
    dim_clip: int = 1024
    gpt_config: GPT2Config = GPT2Config()
    dtype: Any = jnp.float32

    def setup(self):
        self.clip_project = TransformerMapper(
            dim_clip=self.dim_clip,
            dim_embedding=self.gpt_config.n_embd,
            prefix_length=self.prefix_length,
            clip_length=self.clip_length,
            dtype=self.dtype,
        )
        self.gpt = GPT2LMHead(self.gpt_config, dtype=self.dtype)

    # ---- teacher-forced forward (reference ClipCaptionModel.forward) ----
    def __call__(self, tokens: jnp.ndarray, prefix: jnp.ndarray, token_mask: Optional[jnp.ndarray] = None):
        """tokens (B, T) int32, prefix (B, dim_clip) -> logits (B, 40+T, V)."""
        prefix_emb = self.clip_project(prefix)  # (B, 40, 768)
        tok_emb = self.gpt.embed_tokens(tokens).astype(self.dtype)
        inputs = jnp.concatenate([prefix_emb, tok_emb], axis=1)
        logits, _ = self.gpt(inputs)
        return logits

    def caption_loss(self, tokens: jnp.ndarray, prefix: jnp.ndarray, token_mask: jnp.ndarray):
        """CE over caption tokens given the prefix (ClipCap training loss)."""
        logits = self(tokens, prefix)
        # logits at position prefix_length-1+i predict tokens[i]
        pred = logits[:, self.prefix_length - 1 : -1]
        lp = jax.nn.log_softmax(pred, axis=-1)
        nll = -jnp.take_along_axis(lp, tokens[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(token_mask), 1.0)
        return jnp.sum(nll * token_mask) / denom

    # ---- decode building blocks (called through apply by the free
    # functions below; flax submodules cannot be invoked inside lax.scan) ----
    def map_prefix(self, prefix: jnp.ndarray) -> jnp.ndarray:
        return self.clip_project(prefix)

    def prefill(self, prefix_emb: jnp.ndarray, total_len: int):
        b = prefix_emb.shape[0]
        caches = init_cache(self.gpt_config, b, total_len, self.dtype)
        logits, caches = self.gpt(
            prefix_emb, position_offset=jnp.int32(0), caches=caches, cache_index=jnp.int32(0)
        )
        return logits[:, -1], caches

    def decode_step(self, tokens: jnp.ndarray, position: jnp.ndarray, caches):
        """One cached token step: tokens (B,) -> (next logits (B, V), caches)."""
        emb = self.gpt.embed_tokens(tokens)[:, None].astype(self.dtype)
        logits, caches = self.gpt(
            emb, position_offset=position, caches=caches, cache_index=position
        )
        return logits[:, -1], caches


class ClipCaptionPrefix(ClipCaptionModel):
    """Variant whose GPT-2 is frozen (reference clipcap.py:223) — in JAX the
    distinction is an optimizer mask on the 'gpt' subtree, so this subclass
    exists for API parity."""


def generate(
    model: ClipCaptionModel,
    params,
    prefix: jnp.ndarray,  # (B, dim_clip)
    max_len: int = 67,
    top_p: float = 0.0,  # 0 -> greedy; the reference samples with 0.8
    temperature: float = 1.0,
    rng: Optional[jax.Array] = None,
    stop_token: int = STOP_TOKEN,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan/KV-cache autoregressive decode. Returns (tokens (B, max_len),
    valid (B, max_len)); positions after the stop token are masked (the
    reference truncates at '.')."""
    prefix_emb = model.apply(params, prefix, method=model.map_prefix)
    b = prefix.shape[0]
    total = model.prefix_length + max_len
    last_logits, caches = model.apply(params, prefix_emb, total, method=model.prefill)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def sample(logits, key):
        logits = logits / temperature
        if top_p <= 0.0:
            return jnp.argmax(logits, axis=-1)
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_idx = jnp.sum(cum < top_p, axis=-1)  # keep until cum > p (incl.)
        threshold = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        masked = jnp.where(logits >= threshold, logits, -jnp.inf)
        return jax.random.categorical(key, masked, axis=-1)

    def step(carry, i):
        last_logits, caches, stopped, key = carry
        key, sub = jax.random.split(key)
        tok = sample(last_logits, sub)  # (B,)
        emitted = jnp.where(stopped, stop_token, tok).astype(jnp.int32)
        live = ~stopped
        stopped = stopped | (tok == stop_token)
        logits, caches = model.apply(
            params, emitted, model.prefix_length + i, caches, method=model.decode_step
        )
        return (logits, caches, stopped, key), (emitted, live)

    (_, _, _, _), (tokens, live) = jax.lax.scan(
        step,
        (last_logits, caches, jnp.zeros((b,), bool), rng),
        jnp.arange(max_len),
    )
    return jnp.transpose(tokens), jnp.transpose(live)


def pseudo_labeling_loss(
    model: ClipCaptionModel, params, prefix_src: jnp.ndarray, prefix_trgt: jnp.ndarray, max_len: int = 40
) -> jnp.ndarray:
    """Decode pseudo-caption tokens from the src view (stop-grad), train the
    trgt view to reproduce them (reference clipcap.py:335-413)."""
    tokens, valid = generate(model, params, jax.lax.stop_gradient(prefix_src), max_len=max_len)
    tokens = jax.lax.stop_gradient(tokens)
    valid = jax.lax.stop_gradient(valid)
    return model.apply(
        params, tokens, prefix_trgt, valid.astype(jnp.float32), method=model.caption_loss
    )


def unsupervised_kl_loss(
    model: ClipCaptionModel, params, prefix_src: jnp.ndarray, prefix_trgt: jnp.ndarray, max_len: int = 40
) -> jnp.ndarray:
    """Per-step KL(src decode dist || trgt dist on the same tokens)
    (reference unsupervised_loss clipcap.py:416-499)."""
    tokens, valid = generate(model, params, jax.lax.stop_gradient(prefix_src), max_len=max_len)
    tokens = jax.lax.stop_gradient(tokens)
    logits_src = model.apply(params, tokens, jax.lax.stop_gradient(prefix_src))
    logits_trgt = model.apply(params, tokens, prefix_trgt)
    pl = model.prefix_length
    ls = logits_src[:, pl - 1 : -1]
    lt = logits_trgt[:, pl - 1 : -1]
    p = jax.nn.softmax(ls, axis=-1)
    kl = jnp.sum(p * (jax.nn.log_softmax(ls, -1) - jax.nn.log_softmax(lt, -1)), axis=-1)
    m = valid.astype(jnp.float32)
    return jnp.sum(kl * m) / jnp.maximum(jnp.sum(m), 1.0)
