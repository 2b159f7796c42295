"""Reference-code-in-the-loop ClipCap oracle (r3 VERDICT next-round #3).

Imports the ACTUAL reference file
/root/reference/detectron2/modeling/backbone/clipcap/clipcap.py by path
(three import shims: a stub `clip` module, a stub `tqdm`, and
transformers.AdamW -> torch.optim.AdamW — HF 4.57 dropped AdamW), loads
IDENTICAL random weights into the reference torch modules and our flax
stack, and pins:

  * v2l output at full CDDMSL scale (ref clipcap.py:714-719 v2l hardcodes
    view(-1, 40, 768), so the mapper runs at dim_clip=1024/768/40/8L/8H)
  * teacher-forced logits of ClipCaptionModel.forward (clipcap.py:185-195)
    with a tiny config-built GPT-2 (no download; GPT2LMHeadModel.from_pretrained
    is monkeypatched to a seeded config build)
  * the greedy decode loop of pseudo_labeling_loss (clipcap.py:360-385:
    top-p filter then argmax == global argmax) vs our scan/KV-cache generate
  * the composite pseudo_labeling_loss scalar (clipcap.py:335-413,
    non-region batch=1 path) vs the same math computed from our primitives

This replaces builder-written oracles for the v2l/caption stack with the
reference's own code.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF_CLIPCAP = "/root/reference/detectron2/modeling/backbone/clipcap/clipcap.py"


@pytest.fixture(scope="module")
def refmod():
    import os

    if not os.path.exists(REF_CLIPCAP):
        pytest.skip("reference tree not available")
    # --- import shims (none of these affect the numerics under test) ---
    if "clip" not in sys.modules:
        sys.modules["clip"] = types.ModuleType("clip")
    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it=None, **kw: it
        tq.trange = lambda n, **kw: range(n)
        sys.modules["tqdm"] = tq
    import transformers

    if not hasattr(transformers, "AdamW"):
        transformers.AdamW = torch.optim.AdamW
    spec = importlib.util.spec_from_file_location("ref_clipcap", REF_CLIPCAP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_v2l_mapper_matches_reference_full_scale(refmod, rng):
    """Full-scale TransformerMapper + v2l: ref clipcap.py:149-163 + :714-719
    vs models/clipcap.py TransformerMapper + v2l."""
    torch.manual_seed(0)
    ref = refmod.TransformerMapper(
        dim_clip=1024, dim_embedding=768, prefix_length=40, clip_length=40, num_layers=8
    ).eval()
    x = rng.randn(2, 1024).astype(np.float32)
    with torch.no_grad():
        want_tokens = ref(torch.from_numpy(x)).numpy()  # (2, 40, 768)
        want_v2l = refmod.v2l(torch.from_numpy(x), ref).numpy()  # (2, 768)

    from cddmsl_tpu.models.clipcap import TransformerMapper, v2l

    ours = TransformerMapper(dim_clip=1024, dim_embedding=768, prefix_length=40, clip_length=40, num_layers=8)
    params = {"params": _mapper_sd_to_flax_direct(ref)}
    got_tokens = ours.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_tokens), want_tokens, rtol=2e-3, atol=2e-3)
    got_v2l = v2l(got_tokens)
    np.testing.assert_allclose(np.asarray(got_v2l), want_v2l, rtol=2e-3, atol=2e-3)


def _mapper_sd_to_flax_direct(mapper: torch.nn.Module):
    from cddmsl_tpu.checkpoint.convert_torch import convert_clipcap_mapper

    sd = {f"clip_project.{k}": v.detach().numpy() for k, v in mapper.state_dict().items()}
    return convert_clipcap_mapper(sd)


def _tiny_ref_model(refmod):
    """Reference ClipCaptionModel with a deterministic tiny config-built
    GPT-2 (monkeypatching the module-level GPT2LMHeadModel/GPT2Tokenizer
    symbols the reference looks up at :211-214 — the reference logic under
    test is untouched)."""
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    class _StubLM:
        @staticmethod
        def from_pretrained(name):
            torch.manual_seed(7)
            return GPT2LMHeadModel(
                HFConfig(
                    vocab_size=96, n_positions=128, n_embd=32, n_layer=2, n_head=4,
                    attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
                )
            )

    class _StubTok:
        @staticmethod
        def from_pretrained(name):
            tok = types.SimpleNamespace()
            tok.encode = lambda s: [13]  # '.' -> our STOP_TOKEN
            tok.decode = lambda ids: " ".join(str(i) for i in ids)
            return tok

    saved = refmod.GPT2LMHeadModel, refmod.GPT2Tokenizer
    refmod.GPT2LMHeadModel, refmod.GPT2Tokenizer = _StubLM, _StubTok
    try:
        torch.manual_seed(3)
        model = refmod.ClipCaptionModel(
            prefix_length=6, clip_length=4, prefix_size=64, num_layers=8
        ).eval()
    finally:
        refmod.GPT2LMHeadModel, refmod.GPT2Tokenizer = saved
    return model


def _our_model_with_ref_weights(ref_model):
    """Build our ClipCaptionModel and graft the reference's weights."""
    from cddmsl_tpu.models.caption import ClipCaptionModel
    from cddmsl_tpu.models.gpt2 import GPT2Config, convert_hf_gpt2

    cfg = GPT2Config(vocab_size=96, n_positions=128, n_embd=32, n_layer=2, n_head=4)
    ours = ClipCaptionModel(prefix_length=6, clip_length=4, dim_clip=64, gpt_config=cfg)
    gpt_sd = {k: v.detach().numpy() for k, v in ref_model.gpt.state_dict().items()}
    params = {
        "params": {
            "clip_project": _mapper_sd_to_flax_direct(ref_model.clip_project),
            "gpt": convert_hf_gpt2(gpt_sd)["params"],
        }
    }
    # device arrays throughout: the scan-decode path indexes wte with tracers
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return ours, params


def test_teacher_forced_logits_match_reference(refmod, rng):
    """ClipCaptionModel.forward (ref clipcap.py:185-195) vs our __call__."""
    ref_model = _tiny_ref_model(refmod)
    ours, params = _our_model_with_ref_weights(ref_model)

    prefix = rng.randn(2, 64).astype(np.float32)
    tokens = rng.randint(1, 96, (2, 9)).astype(np.int64)
    with torch.no_grad():
        want = ref_model(torch.from_numpy(tokens), torch.from_numpy(prefix)).logits.numpy()
    got = ours.apply(params, jnp.asarray(tokens, jnp.int32), jnp.asarray(prefix))
    assert got.shape == want.shape  # (2, 6+9, 96)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def _ref_greedy_decode(refmod, ref_model, prefix, entry_length=40):
    """The decode loop of pseudo_labeling_loss verbatim (ref
    clipcap.py:355-386): per entry, re-run GPT-2 on the growing embedding
    sequence, top-p(0.8) filter then argmax (== global argmax), stop at
    '.'; returns per-entry token lists."""
    import torch.nn.functional as nnf

    stop_token_index = 13
    top_p, filter_value = 0.8, -float("Inf")
    gpt_embedding_size = ref_model.gpt.transformer.wte.weight.shape[1]
    outs = []
    with torch.no_grad():
        embed = ref_model.clip_project(prefix).view(-1, ref_model.prefix_length, gpt_embedding_size)
        for entry_idx in range(len(embed)):
            generated = embed[entry_idx].unsqueeze(0)
            tokens = None
            for _ in range(entry_length):
                logits = ref_model.gpt(inputs_embeds=generated).logits[:, -1, :]
                sorted_logits, sorted_indices = torch.sort(logits, descending=True)
                cumulative_probs = torch.cumsum(nnf.softmax(sorted_logits, dim=-1), dim=-1)
                sorted_indices_to_remove = cumulative_probs > top_p
                sorted_indices_to_remove[..., 1:] = sorted_indices_to_remove[..., :-1].clone()
                sorted_indices_to_remove[..., 0] = 0
                logits[:, sorted_indices[sorted_indices_to_remove]] = filter_value
                next_token = torch.argmax(logits, -1).unsqueeze(0)
                tokens = next_token if tokens is None else torch.cat((tokens, next_token), dim=1)
                generated = torch.cat(
                    (generated, ref_model.gpt.transformer.wte(next_token)), dim=1
                )
                if stop_token_index == next_token.item():
                    break
            outs.append(tokens.squeeze(0).tolist())
    return outs


def test_greedy_decode_matches_reference(refmod, rng):
    """The pseudo-label decode (ref clipcap.py:360-385) vs our scan/KV-cache
    generate (models/caption.py) — token-exact."""
    from cddmsl_tpu.models.caption import generate

    ref_model = _tiny_ref_model(refmod)
    ours, params = _our_model_with_ref_weights(ref_model)

    prefix = rng.randn(3, 64).astype(np.float32)
    want = _ref_greedy_decode(refmod, ref_model, torch.from_numpy(prefix), entry_length=12)

    tokens, live = generate(ours, params, jnp.asarray(prefix), max_len=12, top_p=0.0)
    tokens, live = np.asarray(tokens), np.asarray(live)
    for i, ref_toks in enumerate(want):
        got = tokens[i][live[i]].tolist()
        assert got == ref_toks, f"entry {i}: {got} != {ref_toks}"


def test_pseudo_labeling_loss_matches_reference(refmod, rng):
    """Composite pin: ref pseudo_labeling_loss (clipcap.py:335-413,
    non-region batch=1 — the batched path needs equal caption lengths) vs
    the same CE(ignore 0, mean) computed from OUR decode + teacher-forced
    logits."""
    ref_model = _tiny_ref_model(refmod)
    ours, params = _our_model_with_ref_weights(ref_model)

    prefix_teacher = rng.randn(1, 64).astype(np.float32)
    prefix_student = rng.randn(1, 64).astype(np.float32)
    want, _ = refmod.pseudo_labeling_loss(
        torch.from_numpy(prefix_teacher), torch.from_numpy(prefix_student),
        ref_model, prefix_length=6,
    )
    want = float(want)

    from cddmsl_tpu.models.caption import generate

    tokens, live = generate(
        ours, params, jnp.asarray(prefix_teacher), max_len=40, top_p=0.0
    )
    toks = np.asarray(tokens)[0][np.asarray(live)[0]]
    logits = ours.apply(
        params, jnp.asarray(toks[None], jnp.int32), jnp.asarray(prefix_student)
    )
    pred = np.asarray(logits)[0, 5:-1]  # positions predicting toks
    lp = pred - np.log(np.exp(pred - pred.max(-1, keepdims=True)).sum(-1, keepdims=True)) - pred.max(-1, keepdims=True)
    keep = toks != 0  # ignore_index=0
    got = float(-lp[np.arange(len(toks)), toks][keep].mean())
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
