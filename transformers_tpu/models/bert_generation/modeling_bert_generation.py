"""BertGeneration (reference models/bert_generation/modeling_bert_generation.py).

A BERT encoder stripped for seq2seq use (Rothe et al. leveraging checkpoints):
word + position embeddings only (no token types, :524), no pooler, base
prefix ``bert``; the decoder variant adds a causal mask and a tied
``lm_head`` (decoder Linear + standalone bias).
"""

from __future__ import annotations

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import (BaseModelOutputWithPooling,
                                 CausalLMOutputWithPast)
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import BertEncoder


class BertGenerationConfig(PretrainedConfig):
    model_type = "bert-generation"

    def __init__(self, vocab_size=50358, hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16, intermediate_size=4096, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, initializer_range=0.02,
                 layer_norm_eps=1e-12, pad_token_id=0, bos_token_id=2,
                 eos_token_id=1, position_embedding_type="absolute",
                 use_cache=True, **kwargs):
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
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class BertGenerationEmbeddings(Module):
    """word + position only (reference :524)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, position_ids=None, inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        s = inputs_embeds.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        h = inputs_embeds + self.position_embeddings(params["position_embeddings"], position_ids)
        return self.LayerNorm(params["LayerNorm"], h)


class BertGenerationPreTrainedModel(PreTrainedModel):
    config_class = BertGenerationConfig
    base_model_prefix = "bert"


class BertGenerationEncoder(BertGenerationPreTrainedModel):
    """reference BertGenerationEncoder — bare encoder, no pooler."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.embeddings = BertGenerationEmbeddings(config, **kw)
        self.encoder = BertEncoder(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 inputs_embeds=None, output_hidden_states=False, is_causal=False,
                 **kwargs) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, position_ids,
                                 inputs_embeds)
        b, s, _ = hidden.shape
        kv_valid = attention_mask if attention_mask is not None else jnp.ones((b, s), jnp.int32)
        attn_args = {"kv_valid": kv_valid, "is_causal": is_causal}
        if is_causal:
            attn_args["q_positions"] = jnp.broadcast_to(
                jnp.arange(s, dtype=jnp.int32)[None], (b, s))
        hidden, all_hidden = self.encoder(params["encoder"], hidden, attn_args,
                                          output_hidden_states)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=None,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class BertGenerationOnlyLMHead(Module):
    """Tied decoder + head-level standalone bias (checkpoint key lm_head.bias)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = config.vocab_size
        self.decoder = Linear(config.hidden_size, config.vocab_size, False,
                              dtype=dtype, param_dtype=param_dtype,
                              kernel_init=normal_init(config.initializer_range))

    def init(self, rng):
        params = super().init(rng)
        params["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def __call__(self, params, hidden):
        return self.decoder(params["decoder"], hidden) + params["bias"].astype(self.dtype)


class BertGenerationDecoder(BertGenerationPreTrainedModel):
    """reference BertGenerationDecoder — causal LM over the encoder stack."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.bert = BertGenerationEncoder(config, dtype=self.dtype,
                                          param_dtype=self.param_dtype)
        self.lm_head = BertGenerationOnlyLMHead(config, dtype=self.dtype,
                                                param_dtype=self.param_dtype)

    @property
    def tied_weights_keys(self):
        return ("lm_head.decoder.weight",)

    def tie_weights(self, params):
        # our Linear kernels are [in, out]; the embedding table is [vocab, hidden]
        params["lm_head"]["decoder"]["weight"] = \
            params["bert"]["embeddings"]["word_embeddings"]["weight"].T
        return params

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 inputs_embeds=None, labels=None, output_hidden_states=False,
                 **kwargs) -> CausalLMOutputWithPast:
        outputs = self.bert(params["bert"], input_ids, attention_mask, position_ids,
                            inputs_embeds, output_hidden_states, is_causal=True)
        logits = self.lm_head(params["lm_head"], outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      hidden_states=outputs.hidden_states)
