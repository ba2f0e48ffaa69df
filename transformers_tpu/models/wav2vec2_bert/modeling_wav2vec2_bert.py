"""Wav2Vec2-BERT / w2v-BERT 2.0 (reference models/wav2vec2_bert/modeling_wav2vec2_bert.py;
the SeamlessM4T-v2 speech encoder).

Takes mel ``input_features`` straight into a LayerNorm+Linear projection
(:119-131, no conv feature stack), Conformer blocks whose conv module is
CAUSAL (left-padded depthwise conv with LayerNorm, :157-227), attention in
three flavors — ``relative_key`` learned distance embeddings clamped to
[-left, right] (:308-323), Transformer-XL ``relative``, or ``rotary`` — and
an optional stride-2 GLU conv adapter stack (:551-712).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Conv, Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutput, CausalLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..wav2vec2_conformer.modeling_wav2vec2_conformer import rel_positional_encoding


class Wav2Vec2BertConfig(PretrainedConfig):
    model_type = "wav2vec2-bert"

    def __init__(self, vocab_size=None, hidden_size=1024, num_hidden_layers=24,
                 num_attention_heads=16, intermediate_size=4096,
                 feature_projection_input_dim=160, hidden_act="swish",
                 hidden_dropout=0.0, activation_dropout=0.0, attention_dropout=0.0,
                 feat_proj_dropout=0.0, final_dropout=0.1, layerdrop=0.1,
                 initializer_range=0.02, layer_norm_eps=1e-5, apply_spec_augment=True,
                 mask_time_prob=0.05, mask_time_length=10, mask_time_min_masks=2,
                 mask_feature_prob=0.0, mask_feature_length=10, mask_feature_min_masks=0,
                 ctc_loss_reduction="sum", ctc_zero_infinity=False,
                 use_weighted_layer_sum=False, classifier_proj_size=768,
                 tdnn_dim=(512, 512, 512, 512, 1500), tdnn_kernel=(5, 3, 3, 1, 1),
                 tdnn_dilation=(1, 2, 3, 1, 1), xvector_output_dim=512,
                 pad_token_id=0, bos_token_id=1, eos_token_id=2, add_adapter=False,
                 adapter_kernel_size=3, adapter_stride=2, num_adapter_layers=1,
                 adapter_act="relu", use_intermediate_ffn_before_adapter=False,
                 output_hidden_size=None, position_embeddings_type="relative_key",
                 rotary_embedding_base=10000, max_source_positions=5000,
                 left_max_position_embeddings=64, right_max_position_embeddings=8,
                 conv_depthwise_kernel_size=31, conformer_conv_dropout=0.1, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.intermediate_size = intermediate_size
        self.feature_projection_input_dim = feature_projection_input_dim
        self.hidden_act = hidden_act
        self.hidden_dropout = hidden_dropout
        self.activation_dropout = activation_dropout
        self.attention_dropout = attention_dropout
        self.feat_proj_dropout = feat_proj_dropout
        self.final_dropout = final_dropout
        self.layerdrop = layerdrop
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.apply_spec_augment = apply_spec_augment
        self.mask_time_prob = mask_time_prob
        self.mask_time_length = mask_time_length
        self.mask_time_min_masks = mask_time_min_masks
        self.mask_feature_prob = mask_feature_prob
        self.mask_feature_length = mask_feature_length
        self.mask_feature_min_masks = mask_feature_min_masks
        self.ctc_loss_reduction = ctc_loss_reduction
        self.ctc_zero_infinity = ctc_zero_infinity
        self.use_weighted_layer_sum = use_weighted_layer_sum
        self.classifier_proj_size = classifier_proj_size
        self.tdnn_dim = list(tdnn_dim)
        self.tdnn_kernel = list(tdnn_kernel)
        self.tdnn_dilation = list(tdnn_dilation)
        self.xvector_output_dim = xvector_output_dim
        self.add_adapter = add_adapter
        self.adapter_kernel_size = adapter_kernel_size
        self.adapter_stride = adapter_stride
        self.num_adapter_layers = num_adapter_layers
        self.adapter_act = adapter_act
        self.use_intermediate_ffn_before_adapter = use_intermediate_ffn_before_adapter
        self.output_hidden_size = output_hidden_size or hidden_size
        self.position_embeddings_type = position_embeddings_type
        self.rotary_embedding_base = rotary_embedding_base
        self.max_source_positions = max_source_positions
        self.left_max_position_embeddings = left_max_position_embeddings
        self.right_max_position_embeddings = right_max_position_embeddings
        self.conv_depthwise_kernel_size = conv_depthwise_kernel_size
        self.conformer_conv_dropout = conformer_conv_dropout
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, **kwargs)


class Wav2Vec2BertSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype, is_adapter_attention=False):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = config.hidden_size if not is_adapter_attention else config.output_hidden_size
        self.num_heads = config.num_attention_heads
        self.head_dim = h // config.num_attention_heads
        self.pos_type = None if is_adapter_attention else config.position_embeddings_type
        self.left_max = config.left_max_position_embeddings
        self.right_max = config.right_max_position_embeddings
        self.linear_q = Linear(h, h, True, **kw)
        self.linear_k = Linear(h, h, True, **kw)
        self.linear_v = Linear(h, h, True, **kw)
        self.linear_out = Linear(h, h, True, **kw)
        if self.pos_type == "relative":
            self.linear_pos = Linear(h, h, False, **kw)
        if self.pos_type == "relative_key":
            n = self.left_max + self.right_max + 1
            self.distance_embedding = Embedding(n, self.head_dim,
                                                embedding_init=normal_init(config.initializer_range),
                                                dtype=dtype, param_dtype=param_dtype)

    def init(self, rng):
        params = super().init(rng)
        if self.pos_type == "relative":
            params["pos_bias_u"] = jnp.zeros((self.num_heads, self.head_dim), self.param_dtype)
            params["pos_bias_v"] = jnp.zeros((self.num_heads, self.head_dim), self.param_dtype)
        return params

    def _rotary(self, x, rel):
        b, s, _ = x.shape
        x = x.reshape(b, s, self.num_heads, self.head_dim)
        cos, sin = rel[0, :s], rel[1, :s]
        half = self.head_dim // 2
        rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
        x = x * cos[None, :, None, :] + rot * sin[None, :, None, :]
        return x.reshape(b, s, -1)

    def __call__(self, params, hidden, mask_bias, rel):
        b, s, h = hidden.shape
        qk_in = hidden
        if self.pos_type == "rotary":
            qk_in = self._rotary(hidden, rel)
        q = self.linear_q(params["linear_q"], qk_in).reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        k = self.linear_k(params["linear_k"], qk_in).reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        v = self.linear_v(params["linear_v"], hidden).reshape(b, s, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
        if self.pos_type == "relative":
            pos = self.linear_pos(params["linear_pos"], rel)
            pos = pos.reshape(1, -1, self.num_heads, self.head_dim).transpose(0, 2, 1, 3)
            qu = q + params["pos_bias_u"].astype(q.dtype)[None, :, None, :]
            qv = q + params["pos_bias_v"].astype(q.dtype)[None, :, None, :]
            scores_ac = jnp.einsum("bhqd,bhkd->bhqk", qu, k)
            scores_bd = jnp.einsum("bhqd,xhrd->bhqr", qv, pos)
            zero = jnp.zeros((*scores_bd.shape[:3], 1), scores_bd.dtype)
            padded = jnp.concatenate([zero, scores_bd], axis=-1)
            padded = padded.reshape(*scores_bd.shape[:2],
                                    scores_bd.shape[3] + 1, scores_bd.shape[2])
            scores_bd = padded[:, :, 1:].reshape(scores_bd.shape)
            scores_bd = scores_bd[..., : scores_bd.shape[-1] // 2 + 1]
            scores = (scores_ac + scores_bd) / math.sqrt(self.head_dim)
        else:
            scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(self.head_dim)
        if self.pos_type == "relative_key":
            dist = jnp.arange(s)[None, :] - jnp.arange(s)[:, None]
            dist = jnp.clip(dist, -self.left_max, self.right_max)
            pos_emb = self.distance_embedding(params["distance_embedding"],
                                              dist + self.left_max)  # [S, S, D]
            rel_w = jnp.einsum("bhld,lrd->bhlr", q, pos_emb.astype(q.dtype))
            scores = scores + rel_w / math.sqrt(self.head_dim)
        if mask_bias is not None:
            scores = scores + mask_bias
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        return self.linear_out(params["linear_out"],
                               out.transpose(0, 2, 1, 3).reshape(b, s, h))


class Wav2Vec2BertFeedForward(Module):
    def __init__(self, config, act_fn=None, hidden_size=None, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        h = hidden_size or config.hidden_size
        self.intermediate_dense = Linear(h, config.intermediate_size, True, **kw)
        self.output_dense = Linear(config.intermediate_size, h, True, **kw)
        self.act = get_activation(act_fn or config.hidden_act)

    def __call__(self, params, x):
        return self.output_dense(params["output_dense"],
                                 self.act(self.intermediate_dense(params["intermediate_dense"], x)))


class Wav2Vec2BertConvolutionModule(Module):
    """Causal conformer conv block (left-padded depthwise, LayerNorm)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        self.k = config.conv_depthwise_kernel_size
        self.layer_norm = LayerNorm(h, config.layer_norm_eps, **kw)
        self.pointwise_conv1 = Conv(h, 2 * h, 1, use_bias=False, ndim=1, **kw)
        self.depthwise_conv = Conv(h, h, self.k, stride=1, padding=0, groups=h,
                                   use_bias=False, ndim=1, **kw)
        self.depthwise_layer_norm = LayerNorm(h, config.layer_norm_eps, **kw)
        self.pointwise_conv2 = Conv(h, h, 1, use_bias=False, ndim=1, **kw)
        self.act = get_activation(config.hidden_act)

    def __call__(self, params, hidden, conv_mask=None):
        x = self.layer_norm(params["layer_norm"], hidden)
        if conv_mask is not None:
            x = x * conv_mask[..., None].astype(x.dtype)
        x = jnp.swapaxes(x, 1, 2)
        x = self.pointwise_conv1(params["pointwise_conv1"], x)
        a, g = jnp.split(x, 2, axis=1)
        x = a * jax.nn.sigmoid(g)
        x = jnp.pad(x, ((0, 0), (0, 0), (self.k - 1, 0)))
        x = self.depthwise_conv(params["depthwise_conv"], x)
        x = jnp.swapaxes(self.depthwise_layer_norm(
            params["depthwise_layer_norm"], jnp.swapaxes(x, 1, 2)), 1, 2)
        x = self.act(x)
        x = self.pointwise_conv2(params["pointwise_conv2"], x)
        return jnp.swapaxes(x, 1, 2)


class Wav2Vec2BertEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.hidden_size
        eps = config.layer_norm_eps
        self.ffn1_layer_norm = LayerNorm(h, eps, **kw)
        self.ffn1 = Wav2Vec2BertFeedForward(config, **kw)
        self.self_attn_layer_norm = LayerNorm(h, eps, **kw)
        self.self_attn = Wav2Vec2BertSelfAttention(config, **kw)
        self.conv_module = Wav2Vec2BertConvolutionModule(config, **kw)
        self.ffn2_layer_norm = LayerNorm(h, eps, **kw)
        self.ffn2 = Wav2Vec2BertFeedForward(config, **kw)
        self.final_layer_norm = LayerNorm(h, eps, **kw)

    def __call__(self, params, hidden, mask_bias, rel, conv_mask):
        h = self.ffn1(params["ffn1"], self.ffn1_layer_norm(params["ffn1_layer_norm"], hidden))
        hidden = h * 0.5 + hidden
        h = self.self_attn(params["self_attn"],
                           self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden),
                           mask_bias, rel)
        hidden = h + hidden
        hidden = self.conv_module(params["conv_module"], hidden, conv_mask) + hidden
        h = self.ffn2(params["ffn2"], self.ffn2_layer_norm(params["ffn2_layer_norm"], hidden))
        hidden = h * 0.5 + hidden
        return self.final_layer_norm(params["final_layer_norm"], hidden)


class Wav2Vec2BertAdapterLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        h = config.output_hidden_size
        eps = config.layer_norm_eps
        k, s = config.adapter_kernel_size, config.adapter_stride
        self.stride = s
        self.residual_layer_norm = LayerNorm(h, eps, **kw)
        self.residual_conv = Conv(h, 2 * h, k, stride=s, padding=s // 2,
                                  use_bias=True, ndim=1, **kw)
        self.self_attn_layer_norm = LayerNorm(h, eps, **kw)
        self.self_attn_conv = Conv(h, 2 * h, k, stride=s, padding=s // 2,
                                   use_bias=True, ndim=1, **kw)
        self.self_attn = Wav2Vec2BertSelfAttention(config, is_adapter_attention=True, **kw)
        self.ffn_layer_norm = LayerNorm(h, eps, **kw)
        self.ffn = Wav2Vec2BertFeedForward(config, act_fn=config.adapter_act,
                                           hidden_size=h, **kw)

    @staticmethod
    def _glu_conv(conv, params, x):
        y = conv(params, jnp.swapaxes(x, 1, 2))
        a, g = jnp.split(y, 2, axis=1)
        return jnp.swapaxes(a * jax.nn.sigmoid(g), 1, 2)

    def __call__(self, params, hidden):
        residual = self.residual_layer_norm(params["residual_layer_norm"], hidden)
        residual = self._glu_conv(self.residual_conv, params["residual_conv"], residual)
        x = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        x = self._glu_conv(self.self_attn_conv, params["self_attn_conv"], x)
        x = self.self_attn(params["self_attn"], x, None, None)
        hidden = x + residual
        residual = hidden
        x = self.ffn_layer_norm(params["ffn_layer_norm"], hidden)
        return self.ffn(params["ffn"], x) + residual


class Wav2Vec2BertModel(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        fp = Module(**kw)
        fp.layer_norm = LayerNorm(config.feature_projection_input_dim,
                                  config.layer_norm_eps, **kw)
        fp.projection = Linear(config.feature_projection_input_dim, config.hidden_size,
                               True, kernel_init=normal_init(config.initializer_range), **kw)
        self.feature_projection = fp
        encoder = Module(**kw)
        encoder.layers = [Wav2Vec2BertEncoderLayer(config, **kw)
                          for _ in range(config.num_hidden_layers)]
        self.encoder = encoder
        if config.add_adapter:
            adapter = Module(**kw)
            if config.output_hidden_size != config.hidden_size:
                adapter.proj = Linear(config.hidden_size, config.output_hidden_size,
                                      True, kernel_init=normal_init(config.initializer_range), **kw)
                adapter.proj_layer_norm = LayerNorm(config.output_hidden_size,
                                                    config.layer_norm_eps, **kw)
            adapter.layers = [Wav2Vec2BertAdapterLayer(config, **kw)
                              for _ in range(config.num_adapter_layers)]
            self.adapter = adapter
        else:
            self.adapter = None
        if config.use_intermediate_ffn_before_adapter:
            self.intermediate_ffn = Wav2Vec2BertFeedForward(config, act_fn="relu", **kw)
        else:
            self.intermediate_ffn = None
        self.mask_embed_size = (config.hidden_size
                                if config.mask_time_prob > 0 or config.mask_feature_prob > 0
                                else None)

    def init(self, rng):
        params = super().init(rng)
        if self.mask_embed_size:
            params["masked_spec_embed"] = jax.random.uniform(
                rng, (self.mask_embed_size,), self.param_dtype)
        return params

    def __call__(self, params, input_features, attention_mask=None,
                 output_hidden_states=False) -> BaseModelOutput:
        fp = params["feature_projection"]
        h = self.feature_projection.layer_norm(fp["layer_norm"],
                                               jnp.asarray(input_features, self.dtype))
        h = self.feature_projection.projection(fp["projection"], h)
        mask_bias = None
        conv_mask = attention_mask
        if attention_mask is not None:
            h = h * attention_mask[..., None].astype(h.dtype)
            mask_bias = ((1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
                         * jnp.finfo(jnp.float32).min)
        s = h.shape[1]
        if self.config.position_embeddings_type == "relative":
            rel = jnp.asarray(rel_positional_encoding(s, self.config.hidden_size), self.dtype)
        elif self.config.position_embeddings_type == "rotary":
            dim = self.config.hidden_size // self.config.num_attention_heads
            inv = 1.0 / (self.config.rotary_embedding_base
                         ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
            freqs = np.einsum("i,j->ij", np.arange(s, dtype=np.float64), inv)
            emb = np.concatenate([freqs, freqs], axis=-1)
            rel = jnp.asarray(np.stack([np.cos(emb), np.sin(emb)]), self.dtype)
        else:
            rel = None
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.encoder.layers):
            if output_hidden_states:
                all_hidden.append(h)
            h = layer(params["encoder"]["layers"][str(i)], h, mask_bias, rel, conv_mask)
        if self.intermediate_ffn is not None:
            h = h + 0.5 * self.intermediate_ffn(params["intermediate_ffn"], h)
        if self.adapter is not None:
            ap = params["adapter"]
            if hasattr(self.adapter, "proj"):
                h = self.adapter.proj(ap["proj"], h)
                h = self.adapter.proj_layer_norm(ap["proj_layer_norm"], h)
            for i, layer in enumerate(self.adapter.layers):
                h = layer(ap["layers"][str(i)], h)
        if output_hidden_states:
            all_hidden.append(h)
        return BaseModelOutput(
            last_hidden_state=h,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class Wav2Vec2BertPreTrainedModel(PreTrainedModel):
    config_class = Wav2Vec2BertConfig
    base_model_prefix = "wav2vec2_bert"
    main_input_name = "input_features"


class Wav2Vec2BertModelStandalone(Wav2Vec2BertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.wav2vec2_bert = Wav2Vec2BertModel(config, dtype=self.dtype,
                                               param_dtype=self.param_dtype)

    def __call__(self, params, input_features=None, **kwargs):
        return self.wav2vec2_bert(params["wav2vec2_bert"], input_features, **kwargs)


class Wav2Vec2BertForCTC(Wav2Vec2BertPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.wav2vec2_bert = Wav2Vec2BertModel(config, **kw)
        self.lm_head = Linear(config.output_hidden_size, config.vocab_size, True,
                              kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_features=None, attention_mask=None, labels=None,
                 **kwargs) -> CausalLMOutput:
        out = self.wav2vec2_bert(params["wav2vec2_bert"], input_features,
                                 attention_mask, **kwargs)
        logits = self.lm_head(params["lm_head"], out.last_hidden_state)
        loss = None
        if labels is not None:
            import optax

            b, t, _ = logits.shape
            if attention_mask is None:
                attention_mask = jnp.ones(jnp.asarray(input_features).shape[:2], jnp.int32)
            lengths = attention_mask.sum(-1)
            logit_pad = (jnp.arange(t)[None, :] >= lengths[:, None]).astype(jnp.float32)
            label_pad = (labels < 0).astype(jnp.float32)
            per_seq = optax.ctc_loss(logits.astype(jnp.float32), logit_pad,
                                     jnp.maximum(labels, 0), label_pad,
                                     blank_id=self.config.pad_token_id)
            if self.config.ctc_loss_reduction == "mean":
                loss = jnp.mean(per_seq / jnp.maximum((1 - label_pad).sum(-1), 1))
            else:
                loss = jnp.sum(per_seq)
        return CausalLMOutput(loss=loss, logits=logits, hidden_states=out.hidden_states)
