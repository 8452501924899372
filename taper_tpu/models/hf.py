"""HuggingFace interop: load GPT-2 / Llama weights into TinyGPT.

Beyond-reference scope (the reference has no sequence models): a user
switching to this framework can bring pretrained GPT-2-family
checkpoints with them — ``from_hf_gpt2`` maps a
``transformers.GPT2LMHeadModel`` (any size; the architecture is
config-driven) onto :class:`~taper_tpu.models.transformer.TinyGPT`,
whose GPT-2-style choices line up one-to-one:

* pre-LN blocks, learned positional embeddings (``rope=False``),
  tied LM head, LayerNorm eps 1e-5, tanh-approximate GELU
  (``gelu_new`` == ``jax.nn.gelu(approximate=True)``);
* HF ``Conv1D`` stores weights ``[in, out]`` — transposed into the
  framework's ``[out, in]`` ``_proj`` convention;
* the fused ``c_attn`` ``[E, 3E]`` splits into wq/wk/wv; the head
  reshape convention (head-major last dim) matches.

Logit parity with the torch reference is asserted to ~1e-4 in
``tests/test_hf_gpt2.py`` (random-init models — this zero-egress
environment has no downloaded checkpoints, but the mapping is
checkpoint-independent).  After conversion the full serving stack
applies: KV-cache generate, paged pools, PTQ/LoRA, TP sharding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from taper_tpu.models.transformer import TinyGPT

__all__ = ["tinygpt_from_gpt2_config", "params_from_gpt2_state_dict",
           "from_hf_gpt2", "tinygpt_from_llama_config",
           "params_from_llama_state_dict", "from_hf_llama"]


def tinygpt_from_gpt2_config(cfg) -> TinyGPT:
    """TinyGPT shaped like a ``transformers.GPT2Config``."""
    # only the tanh-approximate GELU family matches TinyGPT's MLP
    # (jax.nn.gelu approximate=True); HF's exact-erf "gelu" would
    # silently break the promised logit parity
    act = getattr(cfg, "activation_function", "gelu_new")
    assert act in ("gelu_new", "gelu_pytorch_tanh"), (
        f"activation_function={act!r} is not the tanh-approximate GELU "
        f"TinyGPT computes — logit parity would not hold")
    return TinyGPT(vocab_size=cfg.vocab_size, dim=cfg.n_embd,
                   depth=cfg.n_layer, num_heads=cfg.n_head,
                   max_seq=cfg.n_positions, rope=False,
                   mlp_ratio=4, dropout=0.0)


def params_from_gpt2_state_dict(model: TinyGPT, state_dict):
    """TinyGPT params pytree from a GPT-2 ``state_dict()`` (torch
    tensors or numpy arrays)."""
    def t(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    e = model.dim
    params = {
        "tok": {"w": t("transformer.wte.weight")},
        "pos": {"w": t("transformer.wpe.weight")},
        "ln_f": {"g": t("transformer.ln_f.weight"),
                 "b": t("transformer.ln_f.bias")},
        "blocks": [],
    }
    for i in range(model.depth):
        p = f"transformer.h.{i}."
        ca_w = t(p + "attn.c_attn.weight")          # [E, 3E] (Conv1D)
        ca_b = t(p + "attn.c_attn.bias")            # [3E]
        blk = {
            "ln1": {"g": t(p + "ln_1.weight"), "b": t(p + "ln_1.bias")},
            "ln2": {"g": t(p + "ln_2.weight"), "b": t(p + "ln_2.bias")},
            "attn": {
                "wq": ca_w[:, :e].T, "bq": ca_b[:e],
                "wk": ca_w[:, e:2 * e].T, "bk": ca_b[e:2 * e],
                "wv": ca_w[:, 2 * e:].T, "bv": ca_b[2 * e:],
                "wo": t(p + "attn.c_proj.weight").T,
                "bo": t(p + "attn.c_proj.bias"),
            },
            "mlp": {
                "w1": t(p + "mlp.c_fc.weight").T,
                "b1": t(p + "mlp.c_fc.bias"),
                "w2": t(p + "mlp.c_proj.weight").T,
                "b2": t(p + "mlp.c_proj.bias"),
            },
        }
        params["blocks"].append(blk)
    return params


def from_hf_gpt2(hf_model):
    """``(TinyGPT, params)`` from a ``transformers.GPT2LMHeadModel``."""
    model = tinygpt_from_gpt2_config(hf_model.config)
    return model, params_from_gpt2_state_dict(model,
                                              hf_model.state_dict())


# ---------------------------------------------------------------------------
# Llama family (RoPE + RMSNorm + SwiGLU + GQA — all native TinyGPT
# options; torch Linear weights are already [out, in], no transposes)
# ---------------------------------------------------------------------------

def tinygpt_from_llama_config(cfg) -> TinyGPT:
    """TinyGPT shaped like a ``transformers.LlamaConfig`` (the Llama
    recipe maps onto the framework's ``norm="rms"``/``mlp_act="swiglu"``
    options; ``intermediate_size`` must be a multiple of ``n_embd`` —
    the framework's ``mlp_ratio`` is integer)."""
    assert cfg.hidden_act in ("silu",), cfg.hidden_act
    assert cfg.intermediate_size % cfg.hidden_size == 0, (
        cfg.intermediate_size, cfg.hidden_size)
    model = TinyGPT(
        vocab_size=cfg.vocab_size, dim=cfg.hidden_size,
        depth=cfg.num_hidden_layers, num_heads=cfg.num_attention_heads,
        num_kv_heads=cfg.num_key_value_heads,
        max_seq=cfg.max_position_embeddings, rope=True,
        mlp_ratio=cfg.intermediate_size // cfg.hidden_size,
        tied_head=bool(getattr(cfg, "tie_word_embeddings", False)),
        norm="rms", mlp_act="swiglu", dropout=0.0)
    # HF eps/rope-base are config knobs; retune the constructed modules
    from taper_tpu.nn.transformer import rope_angles
    eps = float(cfg.rms_norm_eps)
    base = float(getattr(cfg, "rope_theta", 10000.0))
    model.ln_f.eps = eps
    for blk in model.blocks:
        blk.ln1.eps = blk.ln2.eps = eps
        if base != 10000.0:
            blk.attn._rope = rope_angles(blk.attn.head_dim,
                                         model.max_seq, base)
    return model


def params_from_llama_state_dict(model: TinyGPT, state_dict):
    """TinyGPT params pytree from a ``LlamaForCausalLM.state_dict()``.
    Llama projections carry no biases — the keys are simply omitted
    (``_proj`` treats missing biases as zero)."""
    def t(name):
        v = state_dict[name]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return jnp.asarray(np.asarray(v, np.float32))

    params = {
        "tok": {"w": t("model.embed_tokens.weight")},
        # rope models never read the positional table; keep the tree
        # shape with an all-zeros stand-in
        "pos": {"w": jnp.zeros((model.max_seq, model.dim), jnp.float32)},
        "ln_f": {"g": t("model.norm.weight")},
        "blocks": [],
    }
    for i in range(model.depth):
        p = f"model.layers.{i}."
        params["blocks"].append({
            "ln1": {"g": t(p + "input_layernorm.weight")},
            "ln2": {"g": t(p + "post_attention_layernorm.weight")},
            "attn": {
                "wq": t(p + "self_attn.q_proj.weight"),
                "wk": t(p + "self_attn.k_proj.weight"),
                "wv": t(p + "self_attn.v_proj.weight"),
                "wo": t(p + "self_attn.o_proj.weight"),
            },
            "mlp": {
                "w1": t(p + "mlp.gate_proj.weight"),   # silu branch
                "w3": t(p + "mlp.up_proj.weight"),
                "w2": t(p + "mlp.down_proj.weight"),
            },
        })
    if not model.tied_head:
        params["head"] = t("lm_head.weight")
    return params


def from_hf_llama(hf_model):
    """``(TinyGPT, params)`` from a ``transformers.LlamaForCausalLM``."""
    model = tinygpt_from_llama_config(hf_model.config)
    return model, params_from_llama_state_dict(model,
                                               hf_model.state_dict())
