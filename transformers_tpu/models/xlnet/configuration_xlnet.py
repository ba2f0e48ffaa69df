"""XLNet config (reference src/transformers/models/xlnet/configuration_xlnet.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class XLNetConfig(PretrainedConfig):
    model_type = "xlnet"
    attribute_map = {"hidden_size": "d_model", "num_attention_heads": "n_head",
                     "num_hidden_layers": "n_layer"}

    def __init__(self, vocab_size=32000, d_model=1024, n_layer=24, n_head=16,
                 d_inner=4096, ff_activation="gelu", attn_type="bi",
                 initializer_range=0.02, layer_norm_eps=1e-12, dropout=0.1,
                 mem_len=512, reuse_len=None, use_mems_eval=True,
                 use_mems_train=False, bi_data=False, clamp_len=-1,
                 same_length=False, summary_type="last", summary_use_proj=True,
                 summary_activation="tanh", summary_last_dropout=0.1,
                 start_n_top=5, end_n_top=5, pad_token_id=5, bos_token_id=1,
                 eos_token_id=2, **kwargs):
        self.vocab_size = vocab_size
        self.d_model = d_model
        self.n_layer = n_layer
        self.n_head = n_head
        self.d_head = d_model // n_head
        self.d_inner = d_inner
        self.ff_activation = ff_activation
        self.attn_type = attn_type
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.dropout = dropout
        self.mem_len = mem_len
        self.reuse_len = reuse_len
        self.use_mems_eval = use_mems_eval
        self.use_mems_train = use_mems_train
        self.bi_data = bi_data
        self.clamp_len = clamp_len
        self.same_length = same_length
        self.summary_type = summary_type
        self.summary_use_proj = summary_use_proj
        self.summary_activation = summary_activation
        self.summary_last_dropout = summary_last_dropout
        self.start_n_top = start_n_top
        self.end_n_top = end_n_top
        kwargs.setdefault("tie_word_embeddings", True)
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)
