"""XLM (reference models/xlm/modeling_xlm.py): post-LN encoder with learned
(or sinusoidal) positions, optional language embeddings, padded positions
zeroed between layers (:876), tied biased prediction layer (:919)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPast, MaskedLMOutput
from ...modeling_utils import PreTrainedModel


class XLMConfig(PretrainedConfig):
    model_type = "xlm"
    attribute_map = {"hidden_size": "emb_dim", "num_attention_heads": "n_heads",
                     "num_hidden_layers": "n_layers", "vocab_size": "n_words"}

    def __init__(self, vocab_size=30145, emb_dim=2048, n_layers=12, n_heads=16,
                 dropout=0.1, attention_dropout=0.1, gelu_activation=True,
                 sinusoidal_embeddings=False, causal=False, asm=False, n_langs=1,
                 use_lang_emb=True, max_position_embeddings=512,
                 embed_init_std=2048**-0.5, layer_norm_eps=1e-12,
                 init_std=0.02, bos_index=0, eos_index=1, pad_index=2, unk_index=3,
                 mask_index=5, is_encoder=True, mask_token_id=0, lang_id=0, **kwargs):
        self.n_words = vocab_size
        self.emb_dim = emb_dim
        self.n_layers = n_layers
        self.n_heads = n_heads
        self.dropout = dropout
        self.attention_dropout = attention_dropout
        self.gelu_activation = gelu_activation
        self.sinusoidal_embeddings = sinusoidal_embeddings
        self.causal = causal
        self.asm = asm
        self.n_langs = n_langs
        self.use_lang_emb = use_lang_emb
        self.max_position_embeddings = max_position_embeddings
        self.embed_init_std = embed_init_std
        self.layer_norm_eps = layer_norm_eps
        self.init_std = init_std
        self.bos_index = bos_index
        self.eos_index = eos_index
        self.pad_index = pad_index
        self.unk_index = unk_index
        self.mask_index = mask_index
        self.is_encoder = is_encoder
        self.mask_token_id = mask_token_id
        self.lang_id = lang_id
        super().__init__(**kwargs)


class XLMAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.n_heads = config.n_heads
        self.head_dim = config.emb_dim // config.n_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.init_std))
        d = config.emb_dim
        self.q_lin = Linear(d, d, True, **kw)
        self.k_lin = Linear(d, d, True, **kw)
        self.v_lin = Linear(d, d, True, **kw)
        self.out_lin = Linear(d, d, True, **kw)

    def __call__(self, params, x, attn_bias):
        b, s, d = x.shape
        q = self.q_lin(params["q_lin"], x).reshape(b, s, self.n_heads, self.head_dim)
        k = self.k_lin(params["k_lin"], x).reshape(b, s, self.n_heads, self.head_dim)
        v = self.v_lin(params["v_lin"], x).reshape(b, s, self.n_heads, self.head_dim)
        w = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(self.head_dim)
        w = w + attn_bias
        probs = jax.nn.softmax(w, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return self.out_lin(params["out_lin"], out)


class XLMPreTrainedModel(PreTrainedModel):
    config_class = XLMConfig
    base_model_prefix = "transformer"


class XLMModel(XLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ekw = dict(dtype=self.dtype, param_dtype=self.param_dtype,
                   embedding_init=normal_init(config.embed_init_std))
        d = config.emb_dim
        self.position_embeddings = Embedding(config.max_position_embeddings, d, **ekw)
        if config.n_langs > 1 and config.use_lang_emb:
            self.lang_embeddings = Embedding(config.n_langs, d, **ekw)
        self.embeddings = Embedding(config.n_words, d, **ekw)
        self.layer_norm_emb = LayerNorm(d, config.layer_norm_eps, **kw)
        self.attentions = [XLMAttention(config, **kw) for _ in range(config.n_layers)]
        self.layer_norm1 = [LayerNorm(d, config.layer_norm_eps, **kw)
                            for _ in range(config.n_layers)]
        ffns = []
        for _ in range(config.n_layers):
            ffn = Module(**kw)
            ffn.lin1 = Linear(d, d * 4, True, kernel_init=normal_init(config.init_std), **kw)
            ffn.lin2 = Linear(d * 4, d, True, kernel_init=normal_init(config.init_std), **kw)
            ffns.append(ffn)
        self.ffns = ffns
        self.layer_norm2 = [LayerNorm(d, config.layer_norm_eps, **kw)
                            for _ in range(config.n_layers)]
        self.causal = config.causal
        self.gelu = config.gelu_activation

    def __call__(self, params, input_ids=None, attention_mask=None, langs=None,
                 token_type_ids=None, position_ids=None, lengths=None,
                 inputs_embeds=None, output_hidden_states=False, **kwargs):
        if inputs_embeds is None:
            inputs_embeds = self.embeddings(params["embeddings"], input_ids)
        b, s, d = inputs_embeds.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        mask = attention_mask.astype(jnp.float32)
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None]
        h = inputs_embeds + self.position_embeddings(params["position_embeddings"],
                                                     position_ids)
        if langs is not None and hasattr(self, "lang_embeddings"):
            h = h + self.lang_embeddings(params["lang_embeddings"], langs)
        if token_type_ids is not None:
            h = h + self.embeddings(params["embeddings"], token_type_ids)
        h = self.layer_norm_emb(params["layer_norm_emb"], h)
        h = h * mask[..., None]

        neg = jnp.finfo(jnp.float32).min
        attn_bias = (1.0 - mask[:, None, None, :]) * neg
        if self.causal:
            causal = jnp.triu(jnp.full((s, s), neg, jnp.float32), 1)
            attn_bias = attn_bias + causal[None, None]

        all_hidden = [] if output_hidden_states else None
        for i in range(len(self.attentions)):
            if output_hidden_states:
                all_hidden.append(h)
            attn = self.attentions[i](params["attentions"][str(i)], h, attn_bias)
            h = self.layer_norm1[i](params["layer_norm1"][str(i)], h + attn)
            ffn = self.ffns[i]
            f = ffn.lin1(params["ffns"][str(i)]["lin1"], h)
            f = jax.nn.gelu(f, approximate=False) if self.gelu else jax.nn.relu(f)
            f = ffn.lin2(params["ffns"][str(i)]["lin2"], f)
            h = self.layer_norm2[i](params["layer_norm2"][str(i)], h + f)
            h = h * mask[..., None]
        if output_hidden_states:
            all_hidden.append(h)
        return BaseModelOutputWithPast(
            last_hidden_state=h,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class XLMModelStandalone(XLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = XLMModel(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)


class XLMWithLMHeadModel(XLMPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = XLMModel(config, dtype=self.dtype,
                                    param_dtype=self.param_dtype)
        pred = Module(dtype=self.dtype, param_dtype=self.param_dtype)
        pred.proj = Linear(config.emb_dim, config.n_words, True,
                           dtype=self.dtype, param_dtype=self.param_dtype,
                           kernel_init=normal_init(config.init_std))
        self.pred_layer = pred

    @property
    def tied_weights_keys(self):
        return ("pred_layer.proj.weight",)

    def tie_weights(self, params):
        params["pred_layer"]["proj"]["weight"] = \
            params["transformer"]["embeddings"]["weight"].T
        return params

    def get_input_embedding_path(self):
        return "transformer.embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, langs=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 labels=None, output_hidden_states=False, **kwargs):
        outputs = self.transformer(params["transformer"], input_ids, attention_mask,
                                   langs, token_type_ids, position_ids, None,
                                   inputs_embeds, output_hidden_states)
        logits = self.pred_layer.proj(params["pred_layer"]["proj"],
                                      outputs.last_hidden_state)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.n_words)
        return MaskedLMOutput(loss=loss, logits=logits,
                              hidden_states=outputs.hidden_states)
