"""CWM config (reference src/transformers/models/cwm/modular_cwm.py)."""

from __future__ import annotations

from ..llama.configuration_llama import LlamaConfig


class CwmConfig(LlamaConfig):
    model_type = "cwm"

    def __init__(self, vocab_size=128256, hidden_size=6144, intermediate_size=21504,
                 num_hidden_layers=64, num_attention_heads=48, num_key_value_heads=8,
                 head_dim=128, max_position_embeddings=131072, rms_norm_eps=1e-5,
                 rope_theta=1_000_000.0, rope_scaling=None, sliding_window=8192,
                 layer_types=None, bos_token_id=128000, eos_token_id=None, **kwargs):
        if rope_scaling is None:
            # reference default (modular_cwm.py __post_init__): llama3 scaling
            rope_scaling = {"rope_type": "llama3", "factor": 16.0,
                            "high_freq_factor": 4.0, "low_freq_factor": 1.0,
                            "original_max_position_embeddings": 8192}
        if layer_types is None:
            # every 4th layer full attention, the rest sliding
            layer_types = ["full_attention" if i % 4 == 0 else "sliding_attention"
                           for i in range(num_hidden_layers)]
        self.sliding_window = int(sliding_window) if sliding_window else None
        self.layer_types = list(layer_types)
        if eos_token_id is None:
            eos_token_id = [128001, 128008, 128009]
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads, head_dim=head_dim,
                         max_position_embeddings=max_position_embeddings,
                         rms_norm_eps=rms_norm_eps, rope_theta=rope_theta,
                         rope_scaling=rope_scaling, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
