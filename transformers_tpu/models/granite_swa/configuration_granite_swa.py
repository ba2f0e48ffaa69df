"""GraniteSWA config (reference
src/transformers/models/granite_swa/modular_granite_swa.py)."""

from __future__ import annotations

from ..granite.configuration_granite import GraniteConfig


class GraniteSWAConfig(GraniteConfig):
    model_type = "granite_swa"

    def __init__(self, vocab_size=100352, hidden_size=2560, intermediate_size=8192,
                 num_hidden_layers=24, num_attention_heads=20, num_key_value_heads=4,
                 max_position_embeddings=8192, rms_norm_eps=1e-5,
                 bos_token_id=100257, eos_token_id=100257,
                 tie_word_embeddings=True, sliding_window=128, layer_types=None,
                 layer_rope_theta=None, **kwargs):
        if layer_types is None:
            layer_types = ["full_attention" if i % 4 == 0 else "sliding_attention"
                           for i in range(num_hidden_layers)]
        self.sliding_window = sliding_window
        self.layer_types = list(layer_types)
        super().__init__(vocab_size=vocab_size, hidden_size=hidden_size,
                         intermediate_size=intermediate_size,
                         num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         num_key_value_heads=num_key_value_heads,
                         max_position_embeddings=max_position_embeddings,
                         rms_norm_eps=rms_norm_eps, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)
        # per-layer rope base; 0 => NoPE for that layer (reference
        # modular_granite_swa.py __post_init__). After super() so rope_theta
        # is resolved.
        if layer_rope_theta is None:
            layer_rope_theta = [self.rope_theta] * num_hidden_layers
        self.layer_rope_theta = list(layer_rope_theta)
