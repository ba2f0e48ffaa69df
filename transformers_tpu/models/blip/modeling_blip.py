"""BLIP, TPU-native.

Semantics match reference src/transformers/models/blip/modeling_blip.py:
ViT tower with raw class/position embedding parameters (:172-244), fused-qkv
pre-norm attention (:285-345), ``post_layernorm`` applied to the full sequence
AND AGAIN to the CLS slice for the pooled output (:492-495);
``BlipForConditionalGeneration`` captions by decoding the text tower against
the image sequence (:769-930, default prompt = [bos], eos = sep_token_id);
``BlipForQuestionAnswering`` encodes the question WITH cross-attention over
the image, then decodes the answer against the question states (:942-1160,
the decoder's encoder mask is all-ones over the question, :1145);
``BlipForImageTextRetrieval`` scores image-text pairs with an ITM head on the
cross-attended CLS, or cosine similarity of the projections (:1206-1280).

Decode-time design: both generate paths run one jitted program — vision
encode -> per-layer cross K/V precompute -> ``lax.while_loop`` decode with a
StaticKVCache (see modeling_blip_text.build_cross_decode_loop).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ...core.module import Conv, LayerNorm, Linear, Module, normal_init
from ...generation.configuration_utils import GenerationConfig
from ...modeling_outputs import BaseModelOutputWithPooling
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...utils.generic import ModelOutput
from .configuration_blip import BlipConfig, BlipVisionConfig
from .modeling_blip_text import BlipTextLMHeadModel, BlipTextModel, build_cross_decode_loop


@dataclass
class BlipForConditionalGenerationModelOutput(ModelOutput):
    loss: Any = None
    logits: Any = None
    image_embeds: Any = None
    last_hidden_state: Any = None


@dataclass
class BlipTextVisionModelOutput(ModelOutput):
    loss: Any = None
    image_embeds: Any = None
    last_hidden_state: Any = None


@dataclass
class BlipImageTextMatchingModelOutput(ModelOutput):
    itm_score: Any = None
    last_hidden_state: Any = None
    question_embeds: Any = None


@dataclass
class BlipOutput(ModelOutput):
    logits_per_image: Any = None
    logits_per_text: Any = None
    text_embeds: Any = None
    image_embeds: Any = None


class BlipVisionEmbeddings(Module):
    """Patch conv + raw class/position embedding parameters (reference :172)."""

    def __init__(self, config: BlipVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.embed_dim = config.hidden_size
        self.num_positions = (config.image_size // config.patch_size) ** 2 + 1
        self.patch_embedding = Conv(3, config.hidden_size, config.patch_size,
                                    stride=config.patch_size, padding=0, ndim=2,
                                    dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        params["class_embedding"] = jax.random.normal(k1, (1, 1, self.embed_dim), self.param_dtype)
        params["position_embedding"] = jax.random.normal(
            k2, (1, self.num_positions, self.embed_dim), self.param_dtype)
        return params

    def __call__(self, params, pixel_values):
        b = pixel_values.shape[0]
        patches = self.patch_embedding(params["patch_embedding"], pixel_values.astype(self.dtype))
        patches = patches.reshape(b, self.embed_dim, -1).transpose(0, 2, 1)
        cls_tok = jnp.broadcast_to(params["class_embedding"].astype(self.dtype),
                                   (b, 1, self.embed_dim))
        h = jnp.concatenate([cls_tok, patches], axis=1)
        return h + params["position_embedding"].astype(self.dtype)[:, : h.shape[1]]


class BlipAttention(Module):
    """Fused qkv projection (reference :285)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.qkv = Linear(config.hidden_size, 3 * config.hidden_size, True, **kw)
        self.projection = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden):
        from ...ops.attention import get_attention_fn

        b, s, e = hidden.shape
        mixed = self.qkv(params["qkv"], hidden).reshape(b, s, 3, self.num_heads, self.head_dim)
        q, k, v = mixed[:, :, 0], mixed[:, :, 1], mixed[:, :, 2]
        attn_fn = get_attention_fn(self.config.attn_implementation)
        out = attn_fn(q, k, v, scale=self.head_dim**-0.5, is_causal=False)
        return self.projection(params["projection"], out.reshape(b, s, e))


class BlipMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw)
        self.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, x):
        return self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], x)))


class BlipEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.self_attn = BlipAttention(config, **kw)
        self.layer_norm1 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)
        self.mlp = BlipMLP(config, **kw)
        self.layer_norm2 = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, hidden):
        h = self.layer_norm1(params["layer_norm1"], hidden)
        hidden = hidden + self.self_attn(params["self_attn"], h)
        h = self.layer_norm2(params["layer_norm2"], hidden)
        return hidden + self.mlp(params["mlp"], h)


class BlipEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layers = [BlipEncoderLayer(config, dtype=dtype, param_dtype=param_dtype)
                       for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden):
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden)
        return hidden


class BlipVisionModel(Module):
    def __init__(self, config: BlipVisionConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = BlipVisionEmbeddings(config, **kw)
        self.encoder = BlipEncoder(config, **kw)
        self.post_layernorm = LayerNorm(config.hidden_size, config.layer_norm_eps, **kw)

    def __call__(self, params, pixel_values) -> BaseModelOutputWithPooling:
        h = self.embeddings(params["embeddings"], pixel_values)
        h = self.encoder(params["encoder"], h)
        last = self.post_layernorm(params["post_layernorm"], h)
        # the CLS pooled output gets post_layernorm applied AGAIN (reference :492-495)
        pooled = self.post_layernorm(params["post_layernorm"], last[:, 0])
        return BaseModelOutputWithPooling(last_hidden_state=last, pooler_output=pooled)


class BlipPreTrainedModel(PreTrainedModel):
    config_class = BlipConfig
    base_model_prefix = "blip"
    main_input_name = "pixel_values"
    # cls.predictions.decoder.{weight,bias} are tied duplicates of the word
    # embeddings / predictions.bias; position_ids are buffers.
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")


class BlipModel(BlipPreTrainedModel):
    """CLIP-style dual encoder (reference :509, deprecated but in-surface)."""

    def __init__(self, config: BlipConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.text_model = BlipTextModel(config.text_config, **kw)
        self.vision_model = BlipVisionModel(config.vision_config, **kw)
        self.visual_projection = Linear(config.vision_config.hidden_size, config.projection_dim,
                                        False, **kw, kernel_init=normal_init(0.02))
        self.text_projection = Linear(config.text_config.hidden_size, config.projection_dim,
                                      False, **kw, kernel_init=normal_init(0.02))
        self.logit_scale_init_value = config.logit_scale_init_value

    def init(self, rng):
        params = super().init(rng)
        params["logit_scale"] = jnp.asarray(self.logit_scale_init_value, self.param_dtype)
        return params

    def get_text_features(self, params, input_ids, attention_mask=None):
        out = self.text_model(params["text_model"], input_ids, attention_mask)
        return self.text_projection(params["text_projection"], out.pooler_output)

    def get_image_features(self, params, pixel_values):
        out = self.vision_model(params["vision_model"], pixel_values)
        return self.visual_projection(params["visual_projection"], out.pooler_output)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None, **kwargs):
        img = self.get_image_features(params, pixel_values)
        txt = self.get_text_features(params, input_ids, attention_mask)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
        logits_per_text = txt @ img.T * scale
        return BlipOutput(logits_per_image=logits_per_text.T, logits_per_text=logits_per_text,
                          text_embeds=txt, image_embeds=img)


class _BlipGenerationMixin:
    """Shared jitted cross-decode entry for the two generating wrappers."""

    def _decode(self, params, prompt_ids, prompt_mask, encoder_hidden, encoder_mask,
                gen: GenerationConfig, prng_key, eos_override=None):
        text_cfg = self.config.text_config
        # the reference wrappers always stop on sep_token_id (reference :924,
        # :1148) — the checkpoint generation_config's eos does NOT apply
        eos_id = int(eos_override if eos_override is not None else text_cfg.sep_token_id)
        pad_id = int(gen.pad_token_id if gen.pad_token_id is not None else text_cfg.pad_token_id)
        max_new = int(gen.max_new_tokens or gen.max_length or 20)
        do_sample = bool(gen.do_sample)
        temperature = float(gen.temperature or 1.0)
        sig = (prompt_ids.shape, encoder_hidden.shape, eos_id, pad_id, max_new, do_sample, temperature)
        store = getattr(self, "_gen_cache", None) or {}
        self._gen_cache = store
        if sig not in store:
            store[sig] = build_cross_decode_loop(
                self.text_decoder, prompt_len=prompt_ids.shape[1], max_new=max_new,
                eos_id=eos_id, pad_id=pad_id, do_sample=do_sample, temperature=temperature)
        if prng_key is None:
            prng_key = jax.random.key(0)
        return store[sig](params["text_decoder"], prompt_ids, prompt_mask,
                          encoder_hidden, encoder_mask, prng_key)


class BlipForConditionalGeneration(BlipPreTrainedModel, _BlipGenerationMixin):
    """Image captioning (reference :769)."""

    def __init__(self, config: BlipConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = BlipVisionModel(config.vision_config, **kw)
        self.text_decoder = BlipTextLMHeadModel(config.text_config, **kw)

    def get_input_embedding_path(self):
        return "text_decoder.bert.embeddings.word_embeddings.weight"

    def __call__(self, params, pixel_values=None, input_ids=None, attention_mask=None,
                 labels=None, **kwargs) -> BlipForConditionalGenerationModelOutput:
        vision = self.vision_model(params["vision_model"], pixel_values)
        image_embeds = vision.last_hidden_state
        out = self.text_decoder(params["text_decoder"], input_ids, attention_mask,
                                encoder_hidden_states=image_embeds, labels=labels)
        return BlipForConditionalGenerationModelOutput(
            loss=out.loss, logits=out.logits, image_embeds=image_embeds,
            last_hidden_state=vision.last_hidden_state)

    def generate(self, params=None, pixel_values=None, input_ids=None, attention_mask=None,
                 generation_config=None, prng_key=None, **kwargs):
        """reference :858-930: default prompt [bos] (input_ids' trailing [SEP]
        stripped), first token forced to bos, eos = sep_token_id."""
        params = params if params is not None else self.params
        gen = (generation_config or getattr(self, "generation_config", None) or GenerationConfig()).copy()
        gen.update(**kwargs)
        pixel_values = jnp.asarray(pixel_values)
        b = pixel_values.shape[0]
        text_cfg = self.config.text_config
        if input_ids is None:
            input_ids = jnp.full((b, 2), text_cfg.bos_token_id, jnp.int32)
            input_ids = input_ids.at[:, 1].set(text_cfg.eos_token_id)
        input_ids = jnp.asarray(input_ids, jnp.int32).at[:, 0].set(text_cfg.bos_token_id)
        prompt_ids = input_ids[:, :-1]
        if attention_mask is not None:
            prompt_mask = jnp.asarray(attention_mask, jnp.int32)[:, :-1]
        else:
            prompt_mask = jnp.ones(prompt_ids.shape, jnp.int32)

        vision = self.vision_model(params["vision_model"], pixel_values)
        image_embeds = vision.last_hidden_state
        image_mask = jnp.ones(image_embeds.shape[:-1], jnp.int32)
        return self._decode(params, prompt_ids, prompt_mask, image_embeds, image_mask,
                            gen, prng_key, eos_override=kwargs.get("eos_token_id"))


class BlipForQuestionAnswering(BlipPreTrainedModel, _BlipGenerationMixin):
    """VQA: question encoded with cross-attention over the image; answer
    decoded against the question states (reference :942)."""

    def __init__(self, config: BlipConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = BlipVisionModel(config.vision_config, **kw)
        self.text_encoder = BlipTextModel(config.text_config, add_pooling_layer=False, **kw)
        self.text_decoder = BlipTextLMHeadModel(config.text_config, **kw)

    def get_input_embedding_path(self):
        return "text_encoder.embeddings.word_embeddings.weight"

    def encode_question(self, params, input_ids, attention_mask, pixel_values):
        vision = self.vision_model(params["vision_model"], jnp.asarray(pixel_values))
        image_embeds = vision.last_hidden_state
        image_mask = jnp.ones(image_embeds.shape[:-1], jnp.int32)
        q = self.text_encoder(params["text_encoder"], input_ids, attention_mask,
                              encoder_hidden_states=image_embeds, encoder_attention_mask=image_mask)
        return q.last_hidden_state, vision

    def __call__(self, params, input_ids=None, pixel_values=None, decoder_input_ids=None,
                 decoder_attention_mask=None, attention_mask=None, labels=None,
                 **kwargs) -> BlipTextVisionModelOutput:
        question_embeds, vision = self.encode_question(params, input_ids, attention_mask, pixel_values)
        if labels is not None and decoder_input_ids is None:
            decoder_input_ids = labels  # labels come pre-shifted (reference :1046)
        out = self.text_decoder(params["text_decoder"], decoder_input_ids, decoder_attention_mask,
                                encoder_hidden_states=question_embeds,
                                encoder_attention_mask=attention_mask, labels=labels)
        return BlipTextVisionModelOutput(loss=out.loss, image_embeds=vision.last_hidden_state,
                                         last_hidden_state=vision.last_hidden_state)

    def generate(self, params=None, input_ids=None, pixel_values=None, attention_mask=None,
                 generation_config=None, prng_key=None, **kwargs):
        params = params if params is not None else self.params
        gen = (generation_config or getattr(self, "generation_config", None) or GenerationConfig()).copy()
        gen.update(**kwargs)
        input_ids = jnp.asarray(input_ids, jnp.int32)
        question_embeds, _ = self.encode_question(params, input_ids, attention_mask, pixel_values)
        # the decoder sees an all-ones mask over the question (reference :1145)
        question_mask = jnp.ones(question_embeds.shape[:-1], jnp.int32)
        b = question_embeds.shape[0]
        bos = jnp.full((b, 1), self.config.text_config.bos_token_id, jnp.int32)
        return self._decode(params, bos, jnp.ones((b, 1), jnp.int32),
                            question_embeds, question_mask, gen, prng_key,
                            eos_override=kwargs.get("eos_token_id"))


class BlipForImageTextRetrieval(BlipPreTrainedModel):
    """ITM scoring (reference :1165)."""

    def __init__(self, config: BlipConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = BlipVisionModel(config.vision_config, **kw)
        self.text_encoder = BlipTextModel(config.text_config, add_pooling_layer=False, **kw)
        lkw = dict(**kw, kernel_init=normal_init(0.02))
        self.vision_proj = Linear(config.vision_config.hidden_size,
                                  config.image_text_hidden_size, True, **lkw)
        self.text_proj = Linear(config.text_config.hidden_size,
                                config.image_text_hidden_size, True, **lkw)
        self.itm_head = Linear(config.text_config.hidden_size, 2, True, **lkw)

    def __call__(self, params, input_ids=None, pixel_values=None, use_itm_head=True,
                 attention_mask=None, **kwargs) -> BlipImageTextMatchingModelOutput:
        vision = self.vision_model(params["vision_model"], jnp.asarray(pixel_values))
        image_embeds = vision.last_hidden_state
        image_mask = jnp.ones(image_embeds.shape[:-1], jnp.int32)
        if use_itm_head:
            q = self.text_encoder(params["text_encoder"], input_ids, attention_mask,
                                  encoder_hidden_states=image_embeds,
                                  encoder_attention_mask=image_mask)
            question_embeds = q.last_hidden_state
            score = self.itm_head(params["itm_head"], question_embeds[:, 0])
        else:
            q = self.text_encoder(params["text_encoder"], input_ids, attention_mask)
            question_embeds = q.last_hidden_state
            img = self.vision_proj(params["vision_proj"], image_embeds[:, 0])
            txt = self.text_proj(params["text_proj"], question_embeds[:, 0])
            img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
            txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
            score = img @ txt.T
        return BlipImageTextMatchingModelOutput(
            itm_score=score, last_hidden_state=vision.last_hidden_state,
            question_embeds=question_embeds)


class BlipVisionModelStandalone(BlipPreTrainedModel):
    config_class = BlipVisionConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.vision_model = BlipVisionModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, **kwargs):
        return self.vision_model(params["vision_model"], pixel_values)
