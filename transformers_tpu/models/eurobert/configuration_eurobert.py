"""EuroBERT config (reference src/transformers/models/eurobert/configuration_eurobert.py)."""

from __future__ import annotations

from ..llama.configuration_llama import LlamaConfig


class EuroBertConfig(LlamaConfig):
    model_type = "eurobert"

    def __init__(self, vocab_size=128256, hidden_size=768, intermediate_size=3072,
                 num_hidden_layers=12, num_attention_heads=12,
                 num_key_value_heads=None, hidden_act="silu",
                 max_position_embeddings=8192, rms_norm_eps=1e-5,
                 bos_token_id=128000, eos_token_id=128001, pad_token_id=128001,
                 mask_token_id=128002, classifier_pooling="late",
                 rope_theta=250000.0, **kwargs):
        if num_key_value_heads is None:
            num_key_value_heads = num_attention_heads
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads,
                         hidden_act=hidden_act,
                         max_position_embeddings=max_position_embeddings,
                         rms_norm_eps=rms_norm_eps, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, pad_token_id=pad_token_id,
                         rope_theta=rope_theta, **kwargs)
        self.mask_token_id = mask_token_id
        self.classifier_pooling = classifier_pooling
