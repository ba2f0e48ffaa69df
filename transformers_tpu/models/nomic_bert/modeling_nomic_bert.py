"""Nomic BERT (reference models/nomic_bert/modular_nomic_bert.py): the Jina
V3 post-norm rope encoder with UNBIASED q/k/v/o projections and a gated
SwiGLU MLP (GemmaMLP shape); MLM head ties to the word embeddings."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ..jina_embeddings_v3.modeling_jina_embeddings_v3 import (
    JinaEmbeddingsV3Attention,
    JinaEmbeddingsV3Layer,
    JinaEmbeddingsV3Model,
    JinaEmbeddingsV3PreTrainedModel,
)
from .configuration_nomic_bert import NomicBertConfig


class NomicBertAttention(JinaEmbeddingsV3Attention):
    proj_bias = False


class NomicBertMLP(Module):
    """Gemma-shaped gated MLP (gate/up/down, reference NomicBertMLP)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h, i = config.hidden_size, config.intermediate_size
        self.gate_proj = Linear(h, i, False, **kw)
        self.up_proj = Linear(h, i, False, **kw)
        self.down_proj = Linear(i, h, False, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.down_proj(params["down_proj"],
                              self.act(self.gate_proj(params["gate_proj"], x))
                              * self.up_proj(params["up_proj"], x))


class NomicBertLayer(JinaEmbeddingsV3Layer):
    attention_cls = NomicBertAttention
    mlp_cls = NomicBertMLP


class NomicBertModel(JinaEmbeddingsV3Model):
    layer_cls = NomicBertLayer
    base_model_prefix = "nomic_bert"


class NomicBertPreTrainedModel(JinaEmbeddingsV3PreTrainedModel):
    config_class = NomicBertConfig
    base_model_prefix = "nomic_bert"


class NomicBertModelStandalone(NomicBertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.nomic_bert = NomicBertModel(config, add_pooling_layer=False,
                                         dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.nomic_bert(params["nomic_bert"], *args, **kwargs)


class NomicBertForMaskedLM(NomicBertPreTrainedModel):
    """BERT-style MLM head (transform + tied decoder)."""

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.nomic_bert = NomicBertModel(config, add_pooling_layer=False, **kw)
        lkw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   kernel_init=normal_init(config.initializer_range))
        self.transform_dense = Linear(config.hidden_size, config.hidden_size,
                                      True, **lkw)
        from ...core.module import LayerNorm

        self.transform_norm = LayerNorm(config.hidden_size,
                                        config.layer_norm_eps, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["decoder_bias"] = jnp.zeros((self.config.vocab_size,),
                                           self.param_dtype)
        return params

    def get_input_embedding_path(self):
        return "nomic_bert.embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, labels=None, **kwargs):
        out = self.nomic_bert(params["nomic_bert"], input_ids, attention_mask,
                              token_type_ids, position_ids)
        h = jax.nn.gelu(self.transform_dense(params["transform_dense"],
                                             out.last_hidden_state))
        h = self.transform_norm(params["transform_norm"], h)
        table = params["nomic_bert"]["embeddings"]["word_embeddings"]["weight"]
        logits = h @ table.astype(h.dtype).T + params["decoder_bias"].astype(h.dtype)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        from ...modeling_outputs import MaskedLMOutput

        return MaskedLMOutput(loss=loss, logits=logits)
