"""MPT config (reference src/transformers/models/mpt/configuration_mpt.py).

``attn_config`` is a nested sub-config (reference MptAttentionConfig); it is
kept as a plain attribute object that round-trips through dicts.
"""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class MptAttentionConfig:
    def __init__(
        self,
        attn_type="multihead_attention",
        attn_pdrop=0.0,
        attn_impl="torch",
        clip_qkv=None,
        softmax_scale=None,
        prefix_lm=False,
        qk_ln=False,
        attn_uses_sequence_id=False,
        alibi=True,
        alibi_bias_max=8,
        **kwargs,
    ):
        self.attn_type = attn_type
        self.attn_pdrop = attn_pdrop
        self.attn_impl = attn_impl
        self.clip_qkv = clip_qkv
        self.softmax_scale = softmax_scale
        self.prefix_lm = prefix_lm
        self.qk_ln = qk_ln
        self.attn_uses_sequence_id = attn_uses_sequence_id
        self.alibi = alibi
        self.alibi_bias_max = alibi_bias_max

    def to_dict(self):
        return dict(self.__dict__)


class MptConfig(PretrainedConfig):
    model_type = "mpt"
    attribute_map = {
        "num_attention_heads": "n_heads",
        "hidden_size": "d_model",
        "num_hidden_layers": "n_layers",
        "max_position_embeddings": "max_seq_len",
    }

    def __init__(
        self,
        d_model=2048,
        n_heads=16,
        n_layers=24,
        expansion_ratio=4,
        max_seq_len=2048,
        vocab_size=50368,
        resid_pdrop=0.0,
        layer_norm_epsilon=1e-5,
        emb_pdrop=0.0,
        learned_pos_emb=True,
        attn_config=None,
        init_device="cpu",
        logit_scale=None,
        no_bias=True,
        verbose=0,
        embedding_fraction=1.0,
        norm_type="low_precision_layernorm",
        use_cache=False,
        initializer_range=0.02,
        **kwargs,
    ):
        if attn_config is None:
            attn_config = MptAttentionConfig()
        elif isinstance(attn_config, dict):
            attn_config = MptAttentionConfig(**attn_config)
        self.d_model = d_model
        self.n_heads = n_heads
        self.n_layers = n_layers
        self.expansion_ratio = expansion_ratio
        self.max_seq_len = max_seq_len
        self.vocab_size = vocab_size
        self.resid_pdrop = resid_pdrop
        self.emb_pdrop = emb_pdrop
        self.learned_pos_emb = learned_pos_emb
        self.attn_config = attn_config
        self.init_device = init_device
        self.logit_scale = logit_scale
        self.no_bias = no_bias
        self.verbose = verbose
        self.embedding_fraction = embedding_fraction
        self.norm_type = norm_type
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(use_cache=use_cache, **kwargs)

    def to_dict(self):
        out = super().to_dict()
        if isinstance(out.get("attn_config"), MptAttentionConfig):
            out["attn_config"] = out["attn_config"].to_dict()
        return out
