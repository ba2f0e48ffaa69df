"""Helpers for logit-parity tests against torch transformers (the reference).

Pattern follows the reference's model_addition_debugger_context idea
(reference src/transformers/model_debugging_utils.py:393): run the same tiny
random checkpoint through both frameworks and diff outputs.
"""

from __future__ import annotations

import numpy as np


def make_tiny_torch_llama(tmp_dir: str, *, vocab_size=99, hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
                          max_position_embeddings=512, tie_word_embeddings=False, seed=0,
                          rope_scaling=None):
    """Build a tiny random torch LlamaForCausalLM and save_pretrained it."""
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(seed)
    config = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_hidden_layers,
        num_attention_heads=num_attention_heads,
        num_key_value_heads=num_key_value_heads,
        max_position_embeddings=max_position_embeddings,
        tie_word_embeddings=tie_word_embeddings,
        rope_scaling=rope_scaling,
        attn_implementation="eager",
    )
    model = LlamaForCausalLM(config)
    model.eval()
    model.save_pretrained(tmp_dir, safe_serialization=True)
    return model, config


def torch_logits(model, input_ids: np.ndarray, attention_mask: np.ndarray | None = None) -> np.ndarray:
    import torch

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(input_ids, dtype=torch.long),
            attention_mask=None if attention_mask is None else torch.tensor(attention_mask, dtype=torch.long),
        )
    return out.logits.float().numpy()


def max_abs_diff(a, b) -> float:
    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))
