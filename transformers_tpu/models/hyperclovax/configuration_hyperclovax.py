"""HyperCLOVAX config (reference src/transformers/models/hyperclovax/configuration_hyperclovax.py)."""

from __future__ import annotations

from ..granite.configuration_granite import GraniteConfig


class HyperCLOVAXConfig(GraniteConfig):
    model_type = "hyperclovax"

    def __init__(self, head_dim=None, attention_multiplier=None,
                 use_post_norm=True, **kwargs):
        kwargs.setdefault("embedding_multiplier", 1.0)
        kwargs.setdefault("logits_scaling", 1.0)
        kwargs.setdefault("residual_multiplier", 1.0)
        super().__init__(attention_multiplier=1.0, **kwargs)
        self.head_dim = head_dim if head_dim is not None \
            else self.hidden_size // self.num_attention_heads
        # MuP default resolves to standard 1/sqrt(head_dim)
        self.attention_multiplier = (attention_multiplier
                                     if attention_multiplier is not None
                                     else self.head_dim**-0.5)
        self.use_post_norm = use_post_norm
