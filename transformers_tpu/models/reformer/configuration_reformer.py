"""Reformer config (reference src/transformers/models/reformer/configuration_reformer.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ReformerConfig(PretrainedConfig):
    model_type = "reformer"

    def __init__(self, attention_head_size=64,
                 attn_layers=("local", "lsh", "local", "lsh", "local", "lsh"),
                 axial_norm_std=1.0, axial_pos_embds=True, axial_pos_shape=(64, 64),
                 axial_pos_embds_dim=(64, 192), chunk_size_lm_head=0, eos_token_id=2,
                 feed_forward_size=512, hash_seed=None, hidden_act="relu",
                 hidden_dropout_prob=0.05, hidden_size=256, initializer_range=0.02,
                 is_decoder=False, layer_norm_eps=1e-12, local_num_chunks_before=1,
                 local_num_chunks_after=0, local_attention_probs_dropout_prob=0.05,
                 local_attn_chunk_length=64, lsh_attn_chunk_length=64,
                 lsh_attention_probs_dropout_prob=0.0, lsh_num_chunks_before=1,
                 lsh_num_chunks_after=0, max_position_embeddings=4096,
                 num_attention_heads=12, num_buckets=None, num_hashes=1,
                 pad_token_id=0, vocab_size=320, tie_word_embeddings=False,
                 use_cache=True, classifier_dropout=None, **kwargs):
        self.attention_head_size = attention_head_size
        self.attn_layers = list(attn_layers)
        self.axial_norm_std = axial_norm_std
        self.axial_pos_embds = axial_pos_embds
        self.axial_pos_shape = list(axial_pos_shape)
        self.axial_pos_embds_dim = list(axial_pos_embds_dim)
        self.chunk_size_lm_head = chunk_size_lm_head
        self.feed_forward_size = feed_forward_size
        self.hash_seed = hash_seed
        self.hidden_act = hidden_act
        self.hidden_dropout_prob = hidden_dropout_prob
        self.hidden_size = hidden_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.local_num_chunks_before = local_num_chunks_before
        self.local_num_chunks_after = local_num_chunks_after
        self.local_attention_probs_dropout_prob = local_attention_probs_dropout_prob
        self.local_attn_chunk_length = local_attn_chunk_length
        self.lsh_attn_chunk_length = lsh_attn_chunk_length
        self.lsh_attention_probs_dropout_prob = lsh_attention_probs_dropout_prob
        self.lsh_num_chunks_before = lsh_num_chunks_before
        self.lsh_num_chunks_after = lsh_num_chunks_after
        self.max_position_embeddings = max_position_embeddings
        self.num_attention_heads = num_attention_heads
        self.num_buckets = num_buckets
        self.num_hashes = num_hashes
        self.vocab_size = vocab_size
        self.use_cache = use_cache
        self.classifier_dropout = classifier_dropout
        self.num_hidden_layers = len(self.attn_layers)
        super().__init__(pad_token_id=pad_token_id, eos_token_id=eos_token_id,
                         tie_word_embeddings=tie_word_embeddings,
                         is_decoder=is_decoder, **kwargs)
