"""GIT config (reference src/transformers/models/git/configuration_git.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class GitVisionConfig(PretrainedConfig):
    model_type = "git_vision_model"

    def __init__(self, hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
                 num_attention_heads=12, num_channels=3, image_size=224, patch_size=16,
                 hidden_act="quick_gelu", layer_norm_eps=1e-5, attention_dropout=0.0,
                 initializer_range=0.02, projection_dim=512, **kwargs):
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_channels = num_channels
        self.image_size = image_size
        self.patch_size = patch_size
        self.hidden_act = hidden_act
        self.layer_norm_eps = layer_norm_eps
        self.attention_dropout = attention_dropout
        self.initializer_range = initializer_range
        self.projection_dim = projection_dim
        super().__init__(**kwargs)


class GitConfig(PretrainedConfig):
    model_type = "git"
    sub_configs = {"vision_config": GitVisionConfig}

    def __init__(self, vision_config=None, vocab_size=30522, hidden_size=768,
                 num_hidden_layers=6, num_attention_heads=12, intermediate_size=3072,
                 hidden_act="gelu", hidden_dropout_prob=0.1,
                 attention_probs_dropout_prob=0.1, max_position_embeddings=1024,
                 initializer_range=0.02, layer_norm_eps=1e-12, pad_token_id=0,
                 position_embedding_type="absolute", use_cache=True,
                 num_image_with_embedding=None, bos_token_id=101, eos_token_id=102,
                 **kwargs):
        self.vision_config = (GitVisionConfig(**vision_config)
                              if isinstance(vision_config, dict)
                              else vision_config or GitVisionConfig())
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.position_embedding_type = position_embedding_type
        self.use_cache = use_cache
        self.num_image_with_embedding = num_image_with_embedding
        self.tie_word_embeddings = kwargs.pop("tie_word_embeddings", False)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         tie_word_embeddings=self.tie_word_embeddings, **kwargs)
