"""GPT-NeoX-Japanese (reference models/gpt_neox_japanese/modeling_gpt_neox_japanese.py).

GPT-NeoX variant: bias-free fused ``query_key_value``/``dense`` (:168-172),
a free-standing ``dense_bias`` vector on the LAST layer only (:171-172,
:330-333), sequential (non-parallel) residuals (:348-374), bias-free MLP
sized ``hidden * intermediate_multiple_size`` (:307-320), partial rotary via
``rotary_pct`` and ``rotary_emb_base``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..gpt_neox.modeling_gpt_neox import GPTNeoXAttention, GPTNeoXModel


class GPTNeoXJapaneseConfig(PretrainedConfig):
    model_type = "gpt_neox_japanese"

    def __init__(self, vocab_size=32000, hidden_size=2560, num_hidden_layers=32,
                 num_attention_heads=32, intermediate_multiple_size=4,
                 hidden_act="gelu", rotary_pct=1.0, rotary_emb_base=10000,
                 max_position_embeddings=2048, initializer_range=0.02,
                 layer_norm_eps=1e-5, use_cache=True, bos_token_id=31996,
                 eos_token_id=31999, rope_scaling=None, attention_dropout=0.1,
                 hidden_dropout=0.0, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_multiple_size = intermediate_multiple_size
        self.hidden_act = hidden_act
        self.rotary_pct = rotary_pct
        self.partial_rotary_factor = rotary_pct
        self.rotary_emb_base = rotary_emb_base
        self.rope_theta = rotary_emb_base
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.use_cache = use_cache
        self.rope_scaling = rope_scaling
        self.attention_dropout = attention_dropout
        self.hidden_dropout = hidden_dropout
        # the parent GPTNeoX stack is built first, then swapped (modeling)
        self.use_parallel_residual = False
        self.intermediate_size = int(hidden_size * intermediate_multiple_size)
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id, **kwargs)


class GPTNeoXJapaneseAttention(GPTNeoXAttention):
    def __init__(self, config, layer_idx, *, dtype, param_dtype, use_bias=False):
        cfg_bias = getattr(config, "attention_bias", True)
        config.attention_bias = False
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        config.attention_bias = cfg_bias
        self.use_dense_bias = use_bias
        self.hidden_size = config.hidden_size

    def init(self, rng):
        params = super().init(rng)
        if self.use_dense_bias:
            params["dense_bias"] = jnp.zeros((self.hidden_size,), self.param_dtype)
        return params


class GPTNeoXJapaneseLayer(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.input_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size,
                                                  config.layer_norm_eps, **kw)
        self.attention = GPTNeoXJapaneseAttention(
            config, layer_idx, use_bias=layer_idx == config.num_hidden_layers - 1, **kw)
        inter = int(config.hidden_size * config.intermediate_multiple_size)
        mlp = Module(**kw)
        mlp.dense_h_to_4h = Linear(config.hidden_size, inter, False, **lkw)
        mlp.dense_4h_to_h = Linear(inter, config.hidden_size, False, **lkw)
        self.mlp = mlp
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        ln_out = self.input_layernorm(params["input_layernorm"], hidden)
        attn_out, cache = self.attention(params["attention"], ln_out, cos, sin,
                                         attn_args, cache, cache_position)
        if self.attention.use_dense_bias:
            attn_out = attn_out + params["attention"]["dense_bias"].astype(attn_out.dtype)
        hidden = attn_out + residual
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        mlp_out = self.mlp.dense_4h_to_h(
            params["mlp"]["dense_4h_to_h"],
            self.act(self.mlp.dense_h_to_4h(params["mlp"]["dense_h_to_4h"], h)))
        return mlp_out + hidden, cache


class GPTNeoXJapaneseModel(GPTNeoXModel):
    def __init__(self, config, *, dtype, param_dtype):
        # swap the layer class before the parent builds the stack
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        del self._children["layers"]
        object.__delattr__(self, "layers")
        self.layers = [GPTNeoXJapaneseLayer(config, i, **kw)
                       for i in range(config.num_hidden_layers)]


class GPTNeoXJapanesePreTrainedModel(PreTrainedModel):
    config_class = GPTNeoXJapaneseConfig
    base_model_prefix = "gpt_neox_japanese"


class GPTNeoXJapaneseModelStandalone(GPTNeoXJapanesePreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.gpt_neox_japanese = GPTNeoXJapaneseModel(config, dtype=self.dtype,
                                                      param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.gpt_neox_japanese(params["gpt_neox_japanese"], *args, **kwargs)


class GPTNeoXJapaneseForCausalLM(GPTNeoXJapanesePreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.gpt_neox_japanese = GPTNeoXJapaneseModel(config, **kw)
        if not config.tie_word_embeddings:
            self.embed_out = Linear(config.hidden_size, config.vocab_size, False,
                                    kernel_init=normal_init(config.initializer_range), **kw)

    def get_input_embedding_path(self):
        return "gpt_neox_japanese.embed_in.weight"

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            table = params["gpt_neox_japanese"]["embed_in"]["weight"]
            return jnp.dot(hidden.astype(self.dtype), table.astype(self.dtype).T)
        return self.embed_out(params["embed_out"], hidden)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None,
                 labels=None, logits_to_keep: int = 0, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        outputs = self.gpt_neox_japanese(
            params["gpt_neox_japanese"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        from ...cache_utils import cache_from_config

        return cache_from_config(self.config, batch_size, max_len, dtype or self.dtype,
                                 implementation=implementation)
