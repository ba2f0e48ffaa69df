"""ViLT (reference models/vilt/modeling_vilt.py).

Single-stream vision-and-language ViT: BERT-style text embeddings and ViT
patch embeddings each offset by a modality-type embedding, concatenated and
run through one pre-norm ViT stack (:417-452). The reference's variable-
resolution patch *sampling* (:92-180) is a random permutation when every
patch is valid — attention is permutation-equivariant, so the TPU-native
path keeps the natural raster order and static shapes. Heads: MLM
(``mlm_score`` transform + tied decoder), VQA classifier over the pooled
CLS.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.attention import get_attention_fn
from ..bert.configuration_bert import BertConfig


class ViltConfig(BertConfig):
    model_type = "vilt"

    def __init__(self, vocab_size=30522, type_vocab_size=2,
                 modality_type_vocab_size=2, max_position_embeddings=40,
                 hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                 intermediate_size=3072, hidden_act="gelu", image_size=384,
                 patch_size=32, num_channels=3, qkv_bias=True, max_image_length=-1,
                 tie_word_embeddings=False, num_images=-1, **kwargs):
        self.modality_type_vocab_size = modality_type_vocab_size
        self.image_size = image_size
        self.patch_size = patch_size
        self.num_channels = num_channels
        self.qkv_bias = qkv_bias
        self.max_image_length = max_image_length
        self.num_images = num_images
        super().__init__(vocab_size=vocab_size, type_vocab_size=type_vocab_size,
                         max_position_embeddings=max_position_embeddings,
                         hidden_size=hidden_size, num_hidden_layers=num_hidden_layers,
                         num_attention_heads=num_attention_heads,
                         intermediate_size=intermediate_size, hidden_act=hidden_act,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)


class ViltEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        ekw = dict(**kw, embedding_init=normal_init(config.initializer_range))
        text = Module(**kw)
        text.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **ekw)
        text.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **ekw)
        text.token_type_embeddings = Embedding(config.type_vocab_size,
                                               config.hidden_size, **ekw)
        text.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.text_embeddings = text
        patch = Module(**kw)
        patch.projection = Conv(config.num_channels, config.hidden_size,
                                config.patch_size, stride=config.patch_size,
                                use_bias=True, ndim=2, **kw)
        self.patch_embeddings = patch
        self.num_patches = (config.image_size // config.patch_size) ** 2
        self.token_type_embeddings = Embedding(config.modality_type_vocab_size,
                                               config.hidden_size, **ekw)

    def init(self, rng):
        params = super().init(rng)
        h = self.config.hidden_size
        params["cls_token"] = jnp.zeros((1, 1, h), self.param_dtype)
        params["position_embeddings"] = jnp.zeros((1, self.num_patches + 1, h),
                                                  self.param_dtype)
        return params

    def __call__(self, params, input_ids, attention_mask, token_type_ids,
                 pixel_values, pixel_mask, image_token_type_idx=1):
        te = params["text_embeddings"]
        b, s = input_ids.shape
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, s), jnp.int32)
        pos_ids = jnp.arange(s, dtype=jnp.int32)[None]
        text = (self.text_embeddings.word_embeddings(te["word_embeddings"], input_ids)
                + self.text_embeddings.position_embeddings(te["position_embeddings"], pos_ids)
                + self.text_embeddings.token_type_embeddings(te["token_type_embeddings"],
                                                             token_type_ids))
        text = self.text_embeddings.LayerNorm(te["LayerNorm"], text)

        x = self.patch_embeddings.projection(params["patch_embeddings"]["projection"],
                                             pixel_values)  # [B, C, H', W']
        bb, c, hh, ww = x.shape
        x = x.reshape(bb, c, hh * ww).transpose(0, 2, 1)
        pos = params["position_embeddings"].astype(x.dtype)
        cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (bb, 1, c))
        x = jnp.concatenate([cls, x], axis=1) + pos[:, : hh * ww + 1]
        if pixel_mask is not None:
            # nearest-downsample the pixel mask to the patch grid
            m = pixel_mask[:, ::self.config.patch_size, ::self.config.patch_size]
            image_masks = m.reshape(bb, -1).astype(jnp.int32)
        else:
            image_masks = jnp.ones((bb, hh * ww), jnp.int32)
        image_masks = jnp.concatenate([jnp.ones((bb, 1), jnp.int32), image_masks], axis=1)

        text = text + self.token_type_embeddings(
            params["token_type_embeddings"], jnp.zeros((b, s), jnp.int32))
        x = x + self.token_type_embeddings(
            params["token_type_embeddings"],
            jnp.full(image_masks.shape, image_token_type_idx, jnp.int32))
        embeds = jnp.concatenate([text, x], axis=1)
        masks = jnp.concatenate([attention_mask, image_masks], axis=1)
        return embeds, masks


class ViltLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        attention = Module(**kw)
        inner = Module(**kw)
        h = config.hidden_size
        inner.query = Linear(h, h, config.qkv_bias, **lkw)
        inner.key = Linear(h, h, config.qkv_bias, **lkw)
        inner.value = Linear(h, h, config.qkv_bias, **lkw)
        attention.attention = inner
        out = Module(**kw)
        out.dense = Linear(h, h, True, **lkw)
        attention.output = out
        self.attention = attention
        inter = Module(**kw)
        inter.dense = Linear(h, config.intermediate_size, True, **lkw)
        self.intermediate = inter
        outp = Module(**kw)
        outp.dense = Linear(config.intermediate_size, h, True, **lkw)
        self.output = outp
        self.layernorm_before = LayerNorm(h, config.layer_norm_eps, **kw)
        self.layernorm_after = LayerNorm(h, config.layer_norm_eps, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, attn_args):
        ap = params["attention"]
        normed = self.layernorm_before(params["layernorm_before"], hidden)
        b, s, e = normed.shape
        inner = self.attention.attention
        q = inner.query(ap["attention"]["query"], normed).reshape(b, s, self.num_heads, self.head_dim)
        k = inner.key(ap["attention"]["key"], normed).reshape(b, s, self.num_heads, self.head_dim)
        v = inner.value(ap["attention"]["value"], normed).reshape(b, s, self.num_heads, self.head_dim)
        attn_fn = get_attention_fn(self.config.attn_implementation)
        attn = attn_fn(q, k, v, scale=self.head_dim**-0.5, **attn_args).reshape(b, s, e)
        attn = self.attention.output.dense(ap["output"]["dense"], attn)
        hidden = attn + hidden
        h2 = self.layernorm_after(params["layernorm_after"], hidden)
        inner_h = self.act(self.intermediate.dense(params["intermediate"]["dense"], h2))
        return self.output.dense(params["output"]["dense"], inner_h) + hidden


class ViltModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = ViltEmbeddings(config, **kw)
        encoder = Module(**kw)
        encoder.layer = [ViltLayer(config, **kw) for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        self.layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        if add_pooling_layer:
            pooler = Module(**kw)
            pooler.dense = Linear(config.hidden_size, config.hidden_size, True,
                                  kernel_init=normal_init(config.initializer_range), **kw)
            self.pooler = pooler
        else:
            self.pooler = None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 pixel_values=None, pixel_mask=None, image_token_type_idx=1,
                 output_hidden_states=False, **kwargs) -> BaseModelOutputWithPooling:
        b, s = input_ids.shape
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        h, masks = self.embeddings(params["embeddings"], input_ids, attention_mask,
                                   token_type_ids, pixel_values, pixel_mask,
                                   image_token_type_idx)
        attn_args = {"kv_valid": masks, "is_causal": False}
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layer):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layer"][str(i)], h, attn_args)
        h = self.layernorm(params["layernorm"], h)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = jnp.tanh(self.pooler.dense(params["pooler"]["dense"], h[:, 0]))
        return BaseModelOutputWithPooling(
            last_hidden_state=h, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class ViltPreTrainedModel(PreTrainedModel):
    config_class = ViltConfig
    base_model_prefix = "vilt"
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)


class ViltModelStandalone(ViltPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vilt = ViltModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.vilt(params["vilt"], *args, **kwargs)


class ViltForMaskedLM(ViltPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.vilt = ViltModel(config, **kw)
        score = Module(**kw)
        transform = Module(**kw)
        transform.dense = Linear(config.hidden_size, config.hidden_size, True, **lkw)
        transform.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        score.transform = transform
        # untied decoder unless config.tie_word_embeddings (reference ties
        # via post_init only when configured; hub checkpoints ship both)
        if not config.tie_word_embeddings:
            score.decoder = Linear(config.hidden_size, config.vocab_size, False, **lkw)
        self.mlm_score = score
        self.vocab_size = config.vocab_size
        self.act = get_activation(config.hidden_act)

    def init(self, rng):
        params = super().init(rng)
        params["mlm_score"]["bias"] = jnp.zeros((self.vocab_size,), self.param_dtype)
        return params

    def get_input_embedding_path(self):
        return "vilt.embeddings.text_embeddings.word_embeddings.weight"

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 pixel_values=None, pixel_mask=None, labels=None, **kwargs) -> MaskedLMOutput:
        out = self.vilt(params["vilt"], input_ids, attention_mask, token_type_ids,
                        pixel_values, pixel_mask)
        text_len = input_ids.shape[1]
        text_hidden = out.last_hidden_state[:, :text_len]
        sp = params["mlm_score"]
        h = self.act(self.mlm_score.transform.dense(sp["transform"]["dense"], text_hidden))
        h = self.mlm_score.transform.LayerNorm(sp["transform"]["LayerNorm"], h)
        if self.config.tie_word_embeddings:
            table = params["vilt"]["embeddings"]["text_embeddings"]["word_embeddings"]["weight"]
            logits = jnp.dot(h, table.T) + sp["bias"]
        else:
            logits = self.mlm_score.decoder(sp["decoder"], h) + sp["bias"]
        return MaskedLMOutput(logits=logits, hidden_states=out.hidden_states)


class ViltForQuestionAnswering(ViltPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"\.position_ids$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.vilt = ViltModel(config, **kw)
        classifier = Module(**kw)
        setattr(classifier, "0", Linear(config.hidden_size, config.hidden_size * 2,
                                        True, **lkw))
        setattr(classifier, "1", LayerNorm(config.hidden_size * 2,
                                           config.layer_norm_eps, **kw))
        setattr(classifier, "3", Linear(config.hidden_size * 2, config.num_labels,
                                        True, **lkw))
        self.classifier = classifier

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 pixel_values=None, pixel_mask=None, labels=None, **kwargs):
        out = self.vilt(params["vilt"], input_ids, attention_mask, token_type_ids,
                        pixel_values, pixel_mask)
        cp = params["classifier"]
        x = getattr(self.classifier, "0")(cp["0"], out.pooler_output)
        x = getattr(self.classifier, "1")(cp["1"], x)
        x = jax.nn.gelu(x, approximate=False)
        logits = getattr(self.classifier, "3")(cp["3"], x)
        return SequenceClassifierOutput(logits=logits)
