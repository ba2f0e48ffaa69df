"""Decoder-family parity suite — the tester-mixin analog (reference
tests/causal_lm_tester.py): each family declares a tiny config; a shared
battery checks logit parity vs torch transformers, cached decode consistency,
and greedy-generate parity.
"""

import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from parity_utils import max_abs_diff, torch_logits  # noqa: E402

import transformers_tpu as ttpu  # noqa: E402

TINY = dict(
    vocab_size=99,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
)

# family -> (hf config class name, tiny-config overrides)
FAMILIES = {
    "mistral": ("MistralConfig", dict(sliding_window=4)),
    "mistral-nowindow": ("MistralConfig", dict(sliding_window=None)),
    "qwen2": ("Qwen2Config", dict(use_sliding_window=False)),
    "qwen2-sliding": ("Qwen2Config", dict(use_sliding_window=True, sliding_window=4, max_window_layers=1)),
    "qwen3": ("Qwen3Config", dict(head_dim=8)),
    "gemma": ("GemmaConfig", dict(head_dim=8, num_key_value_heads=4)),
    "gemma2": ("Gemma2Config", dict(
        head_dim=8, query_pre_attn_scalar=8, sliding_window=4,
        final_logit_softcapping=30.0, attn_logit_softcapping=50.0,
    )),
    "phi3": ("Phi3Config", dict(num_key_value_heads=2, pad_token_id=0, eos_token_id=2, bos_token_id=1)),
    "llama-tied": ("LlamaConfig", dict(tie_word_embeddings=True)),
    "llama-tied2": ("LlamaConfig", dict(tie_word_embeddings=True)),
    "mixtral": ("MixtralConfig", dict(num_local_experts=4, num_experts_per_tok=2, sliding_window=None)),
}

# Families whose configs use different field names: full config dicts, no TINY merge.
FAMILIES_RAW = {
    "olmo2": ("Olmo2Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        pad_token_id=0, eos_token_id=2)),
    "granitemoeshared": ("GraniteMoeSharedConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        embedding_multiplier=2.0, logits_scaling=1.5, residual_multiplier=0.5,
        attention_multiplier=0.3, num_local_experts=4, num_experts_per_tok=2,
        shared_intermediate_size=48)),
    "flex_olmo": ("FlexOlmoConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        pad_token_id=0, eos_token_id=2)),
    "llama4_text": ("Llama4TextConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=48,
        intermediate_size_mlp=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=8, max_position_embeddings=256,
        num_experts_per_tok=2, num_local_experts=4, interleave_moe_layer_step=2,
        no_rope_layer_interval=2, attention_chunk_size=4, use_qk_norm=True,
        attn_temperature_tuning=True, floor_scale=4, attn_scale=0.1)),
    "deepseek_v2": ("DeepseekV2Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256,
        kv_lora_rank=16, q_lora_rank=24, qk_nope_head_dim=8, qk_rope_head_dim=8,
        v_head_dim=8, moe_intermediate_size=32, n_routed_experts=8,
        n_shared_experts=1, num_experts_per_tok=2, first_k_dense_replace=1,
        routed_scaling_factor=1.0, topk_method="greedy")),
    "deepseek_v2-group": ("DeepseekV2Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=256,
        kv_lora_rank=16, q_lora_rank=None, qk_nope_head_dim=8, qk_rope_head_dim=8,
        v_head_dim=8, moe_intermediate_size=32, n_routed_experts=8,
        n_shared_experts=1, num_experts_per_tok=2, first_k_dense_replace=1,
        routed_scaling_factor=2.0, topk_method="group_limited_greedy",
        n_group=2, topk_group=1)),
    "dots1": ("Dots1Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, moe_intermediate_size=32,
        n_routed_experts=8, n_shared_experts=1, n_group=2, topk_group=1,
        num_experts_per_tok=2, first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, sliding_window=None)),
    "ernie4_5_moe": ("Ernie4_5_MoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        moe_intermediate_size=32, moe_k=2, moe_num_experts=4,
        moe_num_shared_experts=1, moe_layer_start_index=1,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "hunyuan_v1_dense": ("HunYuanDenseV1Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256)),
    "hunyuan-ntk-alpha": ("HunYuanDenseV1Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, rope_scaling={"type": "dynamic", "alpha": 50.0})),
    "diffllama": ("DiffLlamaConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)),
    "vaultgemma": ("VaultGemmaConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, query_pre_attn_scalar=8, sliding_window=4,
        final_logit_softcapping=30.0, attn_logit_softcapping=50.0)),
    "ministral": ("MinistralConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, sliding_window=4)),
    "bitnet": ("BitNetConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)),
    "apertus": ("ApertusConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)),
    "olmo3": ("Olmo3Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        sliding_window=4, rope_scaling={"rope_type": "linear", "factor": 2.0},
        pad_token_id=0, eos_token_id=2)),
    "starcoder2": ("Starcoder2Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        sliding_window=4, bos_token_id=1, eos_token_id=2)),
    "stablelm": ("StableLmConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        partial_rotary_factor=0.5, use_qkv_bias=True)),
    "stablelm-parallel": ("StableLmConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        partial_rotary_factor=0.25, use_parallel_residual=True)),
    "phi": ("PhiConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=256, partial_rotary_factor=0.5)),
    "qwen2_moe": ("Qwen2MoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        shared_expert_intermediate_size=64, norm_topk_prob=False, use_sliding_window=False)),
    "smollm3": ("SmolLM3Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        no_rope_layer_interval=2, pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "qwen3_moe": ("Qwen3MoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, norm_topk_prob=True)),
    "gemma3_text": ("Gemma3TextConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, query_pre_attn_scalar=8, sliding_window=4,
        sliding_window_pattern=2, rope_theta=1000000.0, rope_local_base_freq=10000.0)),
    "gpt2": ("GPT2Config", dict(vocab_size=99, n_embd=32, n_layer=3, n_head=4, n_positions=256)),
    "gpt_neox": ("GPTNeoXConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, rotary_pct=0.5, use_parallel_residual=True, max_position_embeddings=256)),
    "gpt_neox-seq": ("GPTNeoXConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, rotary_pct=0.25, use_parallel_residual=False, max_position_embeddings=256)),
    "gptj": ("GPTJConfig", dict(
        vocab_size=99, n_embd=32, n_layer=3, n_head=4, n_positions=256, rotary_dim=4,
        bos_token_id=1, eos_token_id=2)),
    "cohere": ("CohereConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        logit_scale=0.25, pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "cohere-qknorm": ("CohereConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        logit_scale=0.0625, use_qk_norm=True, pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "granite": ("GraniteConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        embedding_multiplier=6.0, logits_scaling=3.0, residual_multiplier=0.5,
        attention_multiplier=0.3, bos_token_id=1, eos_token_id=2)),
    "falcon-7b-style": ("FalconConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        multi_query=True, parallel_attn=True, new_decoder_architecture=False,
        bias=False, max_position_embeddings=256)),
    "falcon-40b-style": ("FalconConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        num_kv_heads=2, new_decoder_architecture=True, bias=False,
        max_position_embeddings=256)),
    "falcon-rw-style": ("FalconConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
        multi_query=False, parallel_attn=False, alibi=True, bias=True,
        new_decoder_architecture=False, max_position_embeddings=256)),
    "deepseek_v3": ("DeepseekV3Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, moe_intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=16, kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=8,
        v_head_dim=8, n_routed_experts=8, n_group=4, topk_group=2,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        norm_topk_prob=True, routed_scaling_factor=2.5, max_position_embeddings=256,
        rope_interleave=True)),
    "opt": ("OPTConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, ffn_dim=64,
        num_attention_heads=4, max_position_embeddings=256, dropout=0.0)),
    "opt-350m-style": ("OPTConfig", dict(
        vocab_size=99, hidden_size=32, num_hidden_layers=3, ffn_dim=64,
        num_attention_heads=4, max_position_embeddings=256, dropout=0.0,
        do_layer_norm_before=False, word_embed_proj_dim=16)),
    "gpt_oss": ("GptOssConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_local_experts=4, num_experts_per_tok=2, sliding_window=4,
        max_position_embeddings=256, pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "glm": ("GlmConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, pad_token_id=0, eos_token_id=2)),
    "glm4": ("Glm4Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, pad_token_id=0, eos_token_id=2)),
    "nemotron": ("NemotronConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        bos_token_id=1, eos_token_id=2)),
    "persimmon": ("PersimmonConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=256, qk_layernorm=True,
        bos_token_id=1, eos_token_id=2)),
    "bloom": ("BloomConfig", dict(
        vocab_size=99, hidden_size=32, n_layer=3, n_head=4, bos_token_id=1, eos_token_id=2)),
    "bloom-postln": ("BloomConfig", dict(
        vocab_size=99, hidden_size=32, n_layer=3, n_head=4,
        apply_residual_connection_post_layernorm=True, bos_token_id=1, eos_token_id=2)),
    "mpt": ("MptConfig", dict(
        vocab_size=99, d_model=32, n_layers=3, n_heads=4, max_seq_len=256)),
    "mpt-clip": ("MptConfig", dict(
        vocab_size=99, d_model=32, n_layers=3, n_heads=4, max_seq_len=256,
        attn_config={"clip_qkv": 0.5, "softmax_scale": 0.3})),
    "gpt_neo": ("GPTNeoConfig", dict(
        vocab_size=99, hidden_size=32, num_layers=4, num_heads=4,
        attention_types=[[["global", "local"], 2]], window_size=4,
        max_position_embeddings=256)),
    "codegen": ("CodeGenConfig", dict(
        vocab_size=99, n_embd=32, n_layer=3, n_head=4, n_positions=256, rotary_dim=4)),
    "olmo": ("OlmoConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        clip_qkv=0.5, eos_token_id=2)),
    "olmoe": ("OlmoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True, eos_token_id=2)),
    "dbrx": ("DbrxConfig", dict(
        d_model=32, n_heads=4, n_layers=2, max_seq_len=256, vocab_size=99,
        attn_config=dict(kv_n_heads=2, clip_qkv=1.0),
        ffn_config=dict(ffn_hidden_size=32, moe_num_experts=4, moe_top_k=2))),
    "helium": ("HeliumConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "arcee": ("ArceeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256)),
    "ernie4_5": ("Ernie4_5Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        use_bias=True)),
    "exaone4": ("Exaone4Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256, sliding_window=4, sliding_window_pattern=2)),
    "seed_oss": ("SeedOssConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        max_position_embeddings=256)),
    "granitemoe": ("GraniteMoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
        num_local_experts=4, num_experts_per_tok=2, embedding_multiplier=2.0,
        logits_scaling=1.5, residual_multiplier=0.7, attention_multiplier=0.25)),
    "gpt_bigcode": ("GPTBigCodeConfig", dict(
        vocab_size=99, n_embd=32, n_layer=3, n_head=4, n_positions=256,
        multi_query=True)),
    "gpt_bigcode-mha": ("GPTBigCodeConfig", dict(
        vocab_size=99, n_embd=32, n_layer=3, n_head=4, n_positions=256,
        multi_query=False)),
    "biogpt": ("BioGptConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=256)),
    "xglm": ("XGLMConfig", dict(
        vocab_size=99, d_model=32, ffn_dim=64, num_layers=3, attention_heads=4,
        max_position_embeddings=256, dropout=0.0)),
    "cohere2": ("Cohere2Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, sliding_window=4,
        sliding_window_pattern=2, logit_scale=0.25, max_position_embeddings=256,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "phimoe": ("PhimoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=256,
        bos_token_id=1, eos_token_id=2)),
    "glm4_moe": ("Glm4MoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, max_position_embeddings=256,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "glm4_moe-qknorm": ("Glm4MoeConfig", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8, use_qk_norm=True,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, max_position_embeddings=256,
        pad_token_id=0, bos_token_id=1, eos_token_id=2)),
    "deepseek_v3-noqlora": ("DeepseekV3Config", dict(
        vocab_size=99, hidden_size=32, intermediate_size=64, moe_intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=16, qk_rope_head_dim=8, qk_nope_head_dim=8,
        v_head_dim=8, n_routed_experts=8, n_group=4, topk_group=2,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        norm_topk_prob=True, max_position_embeddings=256, rope_interleave=False)),
}


FAMILIES_RAW["hunyuan_v1_moe"] = ("HunYuanMoEV1Config", dict(
    vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    head_dim=8, num_experts=4, moe_topk=2, pad_token_id=0, eos_token_id=2,
    bos_token_id=1))
FAMILIES_RAW["doge"] = ("DogeConfig", dict(
    vocab_size=99, hidden_size=32, intermediate_size=64, num_hidden_layers=3,
    num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    keep_window_size=2048, pad_token_id=0, eos_token_id=2, bos_token_id=1))
# NB is_moe=True and the keep-window top-k path cannot be driven through the
# fresh-init torch oracle (CDMoE returns a tuple into dropout; A=0 init makes
# every dynamic gate 1.0 so top-k tie-breaking is implementation-defined).
# Both are covered by tests/models/test_doge_cdmoe.py with perturbed params.
FAMILIES_RAW["minimax"] = ("MiniMaxConfig", dict(
    vocab_size=99, hidden_size=32, intermediate_size=48, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2, head_dim=8,
    max_position_embeddings=256, num_experts_per_tok=2, num_local_experts=4,
    block_size=4, pad_token_id=0, eos_token_id=2, bos_token_id=1))
FAMILIES_RAW["gpt_neox_japanese"] = ("GPTNeoXJapaneseConfig", dict(
    vocab_size=99, hidden_size=32, num_hidden_layers=3, num_attention_heads=4,
    intermediate_multiple_size=2, rotary_pct=0.5, max_position_embeddings=256,
    bos_token_id=1, eos_token_id=2, attention_dropout=0.0, tie_word_embeddings=False))
FAMILIES_RAW["modernbert_decoder"] = ("ModernBertDecoderConfig", dict(
    vocab_size=99, hidden_size=32, intermediate_size=48, num_hidden_layers=4,
    num_attention_heads=4, max_position_embeddings=256,
    global_attn_every_n_layers=2, local_attention=8,
    pad_token_id=0, eos_token_id=2, bos_token_id=1, cls_token_id=1,
    sep_token_id=2))


def make_tiny(tmp_dir: str, hf_config_name: str, cfg: dict, seed=0):
    import torch
    import transformers

    torch.manual_seed(seed)
    config_cls = getattr(transformers, hf_config_name)
    config = config_cls(**cfg, attn_implementation="eager")
    arch = transformers.AutoModelForCausalLM._model_mapping[type(config)]
    model = arch(config)
    model.eval()
    model.save_pretrained(tmp_dir, safe_serialization=True)
    return model


def family_config(family: str) -> tuple[str, dict]:
    if family in FAMILIES_RAW:
        return FAMILIES_RAW[family]
    name, overrides = FAMILIES[family]
    return name, {**TINY, **overrides}


@pytest.mark.parametrize("family", sorted(FAMILIES) + sorted(FAMILIES_RAW))
def test_logit_parity(family, tmp_path):
    name, cfg = family_config(family)
    d = str(tmp_path / family)
    torch_model = make_tiny(d, name, cfg)

    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    assert not model.load_report.missing_keys, model.load_report.missing_keys
    assert not model.load_report.unexpected_keys, model.load_report.unexpected_keys

    ids = np.array([[1, 5, 9, 3, 22, 7, 14, 2]], dtype=np.int64)
    ref = torch_logits(torch_model, ids)
    out = model(model.params, input_ids=jnp.asarray(ids))
    diff = max_abs_diff(out.logits, ref)
    assert diff < 3e-5, f"{family}: logit diff {diff}"


@pytest.mark.parametrize("family", ["mistral", "gemma2", "qwen3", "phi3", "gpt2", "gpt_neox", "gptj", "cohere", "granite", "falcon-7b-style", "falcon-40b-style", "falcon-rw-style", "deepseek_v3", "gpt_oss", "opt", "opt-350m-style",
                                    "mixtral", "olmo2", "stablelm", "phi", "qwen2_moe",
                                    "gemma3_text", "starcoder2",
                                    "glm", "glm4", "nemotron", "persimmon", "bloom",
                                    "mpt", "gpt_neo", "codegen",
                                    "olmo", "olmoe", "dbrx", "helium",
                                    "arcee", "ernie4_5", "exaone4", "seed_oss",
                                    "granitemoe", "gpt_bigcode", "biogpt", "xglm",
                                    "cohere2", "phimoe", "glm4_moe",
                                    "olmo3", "vaultgemma", "ministral", "bitnet", "apertus",
                                    "granitemoeshared", "flex_olmo", "hunyuan_v1_dense", "diffllama",
                                    "llama4_text", "deepseek_v2", "dots1", "ernie4_5_moe",
                                    "hunyuan_v1_moe", "modernbert_decoder", "gpt_neox_japanese", "doge", "minimax"])
def test_cached_decode_matches_full(family, tmp_path):
    """Incremental decode with the static cache == one-shot forward — this is
    what exercises sliding windows and softcapping under cache geometry."""
    name, cfg = family_config(family)
    d = str(tmp_path / family)
    make_tiny(d, name, cfg)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    params = model.params
    ids = np.array([[1, 5, 9, 3, 22, 7, 14, 2]], dtype=np.int32)
    full = model(params, input_ids=jnp.asarray(ids))
    cache = model.init_cache(1, 8, dtype=jnp.float32)
    mask = np.zeros((1, 8), np.int32)
    mask[:, :4] = 1
    out = model(params, input_ids=jnp.asarray(ids[:, :4]), attention_mask=jnp.asarray(mask),
                past_key_values=cache, cache_position=0)
    assert max_abs_diff(out.logits, full.logits[:, :4]) < 1e-4
    cache = out.past_key_values
    for t in range(4, 8):
        mask[:, t] = 1
        step = model(params, input_ids=jnp.asarray(ids[:, t : t + 1]),
                     attention_mask=jnp.asarray(mask), position_ids=jnp.asarray([[t]]),
                     past_key_values=cache, cache_position=t)
        cache = step.past_key_values
        assert max_abs_diff(step.logits[:, 0], full.logits[:, t]) < 1e-4, f"{family} step {t}"


@pytest.mark.parametrize("family", ["mistral", "gemma", "gpt2", "gpt_bigcode", "biogpt", "xglm",
                                    "olmo3", "bitnet", "apertus", "diffllama", "modernbert_decoder", "gpt_neox_japanese"])
def test_greedy_generate_matches_torch(family, tmp_path):
    import torch

    name, cfg = family_config(family)
    d = str(tmp_path / family)
    torch_model = make_tiny(d, name, cfg)
    model = ttpu.AutoModelForCausalLM.from_pretrained(d, dtype="float32")
    ids = np.array([[1, 5, 9, 3]], dtype=np.int64)
    with torch.no_grad():
        ref = torch_model.generate(torch.tensor(ids), max_new_tokens=8, do_sample=False,
                                   pad_token_id=0).numpy()
    out = np.asarray(model.generate(model.params, input_ids=jnp.asarray(ids),
                                    max_new_tokens=8, prompt_pad_multiple=4))
    np.testing.assert_array_equal(out[0], ref[0])
