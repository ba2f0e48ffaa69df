"""Granite Speech (reference models/granite_speech/modeling_granite_speech.py):
ASR-tuned LLM — a conformer CTC encoder (Shaw relative-position blocked
attention :145, GLU conv module with frozen BatchNorm :229, half-weighted
macaron FFNs, a mid-stack CTC re-injection :333) windows its features through
a BLIP-2 Q-Former projector (:90) and scatters them into the Granite LLM at
<|audio|> placeholders."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...cache_utils import cache_from_config
from ...core.loading import WeightRule
from ...core.module import (
    BatchNorm,
    Conv,
    Embedding,
    LayerNorm,
    Linear,
    Module,
    normal_init,
)
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..blip_2.modeling_blip_2 import Blip2QFormerModel
from ..llava.modeling_llava import _language_model_cls
from .configuration_granite_speech import (
    GraniteSpeechConfig,
    GraniteSpeechEncoderConfig,
)

NEG = float(np.finfo(np.float32).min)


class GraniteSpeechConformerFeedForward(Module):
    """reference :125 — ln -> up -> silu -> down."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_dim
        self.pre_norm = LayerNorm(d, 1e-5, **kw)
        self.up_proj = Linear(d, d * config.feedforward_mult, **kw)
        self.down_proj = Linear(d * config.feedforward_mult, d, **kw)

    def __call__(self, params, x):
        h = self.up_proj(params["up_proj"], self.pre_norm(params["pre_norm"], x))
        return self.down_proj(params["down_proj"], jax.nn.silu(h))


class GraniteSpeechConformerAttention(Module):
    """reference :145 — context_size-blocked MHA with Shaw relative position
    scores added as the attention bias."""

    def __init__(self, config: GraniteSpeechEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        inner = config.dim_head * config.num_heads
        self.num_heads = config.num_heads
        self.dim_head = config.dim_head
        self.context_size = config.context_size
        self.max_pos_emb = config.max_pos_emb
        self.pre_norm = LayerNorm(config.hidden_dim, 1e-5, **kw)
        self.to_q = Linear(config.hidden_dim, inner, use_bias=False, **kw)
        self.to_kv = Linear(config.hidden_dim, inner * 2, use_bias=False, **kw)
        self.to_out = Linear(inner, config.hidden_dim, **kw)
        self.rel_pos_emb = Embedding(2 * config.max_pos_emb + 1, config.dim_head, **kw)
        # clamped relative distances (reference buffer, :317)
        seq = np.arange(config.context_size)
        dist = np.clip(seq[:, None] - seq[None, :],
                       -config.context_size, config.context_size)
        self.attention_dists = jnp.asarray(dist + config.max_pos_emb)

    def __call__(self, params, hidden):
        hidden = self.pre_norm(params["pre_norm"], hidden)
        b, n, _ = hidden.shape
        ctx = self.context_size
        nblocks = math.ceil(n / ctx)
        remainder = n % ctx
        pad = nblocks * ctx - n
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        q = self.to_q(params["to_q"], hidden)
        kv = self.to_kv(params["to_kv"], hidden)
        k, v = jnp.split(kv, 2, axis=-1)
        fb = b * nblocks
        h, hd = self.num_heads, self.dim_head
        q = q.reshape(fb, ctx, h, hd)
        k = k.reshape(fb, ctx, h, hd)
        v = v.reshape(fb, ctx, h, hd)
        rel = self.rel_pos_emb(params["rel_pos_emb"], self.attention_dists)
        scale = hd ** -0.5
        pos_attn = jnp.einsum("bchd,crd->bhcr", q, rel.astype(q.dtype),
                              preferred_element_type=jnp.float32) * scale
        if remainder > 0:
            # reference :200 — in the final (ragged) block, only the leading
            # remainder x remainder square is un-penalized
            sq = np.zeros((ctx, ctx), np.float32)
            sq[:, :] = NEG
            sq[:remainder, :remainder] = 0.0
            blk_mask = jnp.asarray(sq)[None, None]
            is_last = (jnp.arange(fb) % nblocks) == nblocks - 1
            pos_attn = jnp.where(is_last[:, None, None, None],
                                 pos_attn + blk_mask, pos_attn)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        scores = scores + pos_attn
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(fb, ctx, h * hd)
        out = out.reshape(b, nblocks * ctx, h * hd)[:, :n]
        return self.to_out(params["to_out"], out)


class GraniteSpeechConformerConvModule(Module):
    """reference :229 — 1x1 up conv -> GLU -> depthwise conv (asymmetric pad)
    -> BatchNorm (running stats) -> silu -> 1x1 down conv."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        d = config.hidden_dim
        inner = d * config.conv_expansion_factor
        ks = config.conv_kernel_size
        self.norm = LayerNorm(d, 1e-5, **kw)
        self.up_conv = Conv(d, inner * 2, 1, ndim=1, **kw)
        depth = Module(**kw)
        depth._children["conv"] = Conv(inner, inner, ks, groups=inner,
                                       use_bias=False, ndim=1, **kw)
        self.depth_conv = depth
        self.batch_norm = BatchNorm(inner, **kw)
        self.down_conv = Conv(inner, d, 1, ndim=1, **kw)
        pad = ks // 2
        self.pad = (pad, pad - (ks + 1) % 2)

    def __call__(self, params, x):
        h = self.norm(params["norm"], x)
        h = self.up_conv(params["up_conv"], h.transpose(0, 2, 1))
        a, g = jnp.split(h, 2, axis=1)
        h = a * jax.nn.sigmoid(g)
        h = jnp.pad(h, ((0, 0), (0, 0), self.pad))
        h = self.depth_conv._children["conv"](params["depth_conv"]["conv"], h)
        h = jax.nn.silu(self.batch_norm(params["batch_norm"], h))
        return self.down_conv(params["down_conv"], h).transpose(0, 2, 1)


class GraniteSpeechConformerBlock(Module):
    """reference :260 — macaron half-FFNs around attention and conv."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.ff1 = GraniteSpeechConformerFeedForward(config, **kw)
        self.attn = GraniteSpeechConformerAttention(config, **kw)
        self.conv = GraniteSpeechConformerConvModule(config, **kw)
        self.ff2 = GraniteSpeechConformerFeedForward(config, **kw)
        self.post_norm = LayerNorm(config.hidden_dim, 1e-5, **kw)

    def __call__(self, params, hidden):
        hidden = 0.5 * self.ff1(params["ff1"], hidden) + hidden
        hidden = self.attn(params["attn"], hidden) + hidden
        hidden = self.conv(params["conv"], hidden) + hidden
        hidden = 0.5 * self.ff2(params["ff2"], hidden) + hidden
        return self.post_norm(params["post_norm"], hidden)


class GraniteSpeechCTCEncoder(Module):
    """reference :304 — conformer stack with mid-stack CTC re-injection."""

    def __init__(self, config: GraniteSpeechEncoderConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.input_linear = Linear(config.input_dim, config.hidden_dim, **kw)
        self.layers = [GraniteSpeechConformerBlock(config, **kw)
                       for _ in range(config.num_layers)]
        self.out = Linear(config.hidden_dim, config.output_dim, **kw)
        self.out_mid = Linear(config.output_dim, config.hidden_dim, **kw)
        self.num_layers = config.num_layers

    def __call__(self, params, hidden):
        hidden = self.input_linear(params["input_linear"], hidden)
        for idx, layer in enumerate(self.layers, start=1):
            hidden = layer(params["layers"][str(idx - 1)], hidden)
            if idx == self.num_layers // 2:
                mid = self.out(params["out"], hidden)
                hidden = hidden + self.out_mid(params["out_mid"],
                                               jax.nn.softmax(mid, axis=-1))
        return hidden


class GraniteSpeechEncoderProjector(Module):
    """reference :90 — window the encoder features into window_size blocks,
    resample each with a Q-Former query, project to the LLM width."""

    def __init__(self, config: GraniteSpeechConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        pc = config.projector_config
        self.window_size = config.window_size
        self.downsample_rate = config.downsample_rate
        self.num_queries = config.window_size // config.downsample_rate
        self.hidden_size = pc.hidden_size
        self.qformer = Blip2QFormerModel(pc, **kw)
        self.linear = Linear(pc.hidden_size, config.text_config.hidden_size, **kw)

    def init(self, rng):
        params = super().init(rng)
        params["query"] = jax.random.normal(
            rng, (1, self.num_queries, self.hidden_size), self.param_dtype)
        return params

    def __call__(self, params, hidden):
        b, n, d = hidden.shape
        nblocks = math.ceil(n / self.window_size)
        pad = nblocks * self.window_size - n
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        hidden = hidden.reshape(b * nblocks, self.window_size, d)
        query = jnp.broadcast_to(params["query"].astype(hidden.dtype),
                                 (b * nblocks, self.num_queries, self.hidden_size))
        out = self.qformer(params["qformer"], query, hidden)
        out = out.reshape(b, nblocks * self.num_queries, -1)
        return self.linear(params["linear"], out)


class GraniteSpeechModel(Module):
    def __init__(self, config: GraniteSpeechConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = GraniteSpeechCTCEncoder(config.encoder_config, **kw)
        self.projector = GraniteSpeechEncoderProjector(config, **kw)
        lm = _language_model_cls(config.text_config.model_type)(
            config.text_config, **kw)
        self.language_model = lm.model

    def get_audio_features(self, params, input_features):
        feats = self.encoder(params["encoder"], input_features)
        return self.projector(params["projector"], feats)

    def __call__(self, params, input_ids=None, input_features=None,
                 input_features_mask=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False):
        if inputs_embeds is None:
            mask = input_ids == self.config.audio_token_id
            embeds = self.language_model.embed_tokens(
                params["language_model"]["embed_tokens"],
                jnp.where(mask, 0, input_ids))
            if input_features is not None:
                audio = self.get_audio_features(params, input_features)
                flat = audio.reshape(-1, audio.shape[-1]).astype(embeds.dtype)
                order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
                placed = jnp.take(flat, jnp.clip(order, 0, flat.shape[0] - 1),
                                  axis=0).reshape(embeds.shape)
                embeds = jnp.where(mask[..., None], placed, embeds)
            # Granite multiplies inputs_embeds AFTER the merge
            # (reference granite modeling :411)
            if getattr(self.language_model, "scale_embeddings", False):
                embeds = embeds * self.language_model.embed_scale()
            inputs_embeds = embeds
        return self.language_model(
            params["language_model"], None, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds,
            output_hidden_states)


class GraniteSpeechPreTrainedModel(PreTrainedModel):
    config_class = GraniteSpeechConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r".*num_batches_tracked$",)


class GraniteSpeechForConditionalGeneration(GraniteSpeechPreTrainedModel,
                                            GenerationMixin):
    _prefill_input_names = ("input_features", "input_features_mask")
    # legacy (pre-v5) checkpoint layout -> composed layout
    _weight_rules = (
        WeightRule(pattern=r"^language_model\.model\.",
                   rename="model.language_model."),
        WeightRule(pattern=r"^language_model\.lm_head\.", rename="lm_head."),
        WeightRule(pattern=r"^encoder\.", rename="model.encoder."),
        WeightRule(pattern=r"^projector\.", rename="model.projector."),
    )

    def __init__(self, config: GraniteSpeechConfig, *, dtype=jnp.float32,
                 param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = GraniteSpeechModel(config, dtype=self.dtype,
                                        param_dtype=self.param_dtype)
        tc = config.text_config
        if not tc.tie_word_embeddings:
            self.lm_head = Linear(tc.hidden_size, tc.vocab_size, False,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  kernel_init=normal_init(0.02))

    def get_input_embedding_path(self):
        return "model.language_model.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.text_config.tie_word_embeddings:
            logits = self.model.language_model.embed_tokens.attend(
                params["model"]["language_model"]["embed_tokens"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        scaling = getattr(self.config.text_config, "logits_scaling", None)
        if scaling and scaling != 1.0:
            logits = logits / scaling
        return logits

    def init_cache(self, batch_size, max_len, dtype=None,
                   implementation: str = "static"):
        return cache_from_config(self.config.text_config, batch_size, max_len,
                                 dtype or self.dtype,
                                 implementation=implementation)

    def __call__(self, params, input_ids=None, input_features=None,
                 input_features_mask=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs) -> CausalLMOutputWithPast:
        outputs = self.model(params["model"], input_ids, input_features,
                             input_features_mask, attention_mask, position_ids,
                             past_key_values, cache_position, inputs_embeds,
                             output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels,
                                      self.config.text_config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits,
                                      past_key_values=outputs.past_key_values,
                                      hidden_states=outputs.hidden_states)
