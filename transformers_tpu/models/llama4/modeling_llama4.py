"""Llama4 text decoder, TPU-native (reference
src/transformers/models/llama4/modeling_llama4.py).

Deltas from the llama skeleton:
- complex-pair rope (interleaved output layout, :199 apply_rotary_emb) on 3
  of 4 layers; NoPE layers instead get attn-temperature tuning
  (q *= log1p(floor((pos+1)/floor_scale)) * attn_scale + 1, :338);
- parameter-free L2 qk-norm AFTER rope (:97);
- CHUNKED causal attention on rope layers (attention_chunk_size), full
  attention on NoPE layers;
- MoE: top-k router whose sigmoid scores scale the expert INPUT (:138-166),
  stacked expert tensors gate_up_proj [E, H, 2I] / down_proj [E, I, H]
  (raw nn.Parameter leaves — no .weight suffix), plus a dense shared
  expert; dense layers use intermediate_size_mlp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...ops.activations import get_activation
from ..deepseek_v2.modeling_deepseek_v2 import apply_rope_complex_pairs
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaMLP,
    LlamaModel,
    LlamaModelStandalone,
)
from .configuration_llama4 import Llama4Config, Llama4TextConfig


def _l2norm(x, eps):
    f = x.astype(jnp.float32)
    return (f * jax.lax.rsqrt(jnp.mean(f * f, axis=-1, keepdims=True) + eps)).astype(x.dtype)


class Llama4TextAttention(LlamaAttention):
    apply_rope = False  # the skeleton hook is bypassed; rope happens below

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        self.use_rope = bool(config.no_rope_layers[layer_idx])
        self.use_qk_norm = config.use_qk_norm and self.use_rope
        self.attn_temperature_tuning = config.attn_temperature_tuning
        self.floor_scale = config.floor_scale
        self.attn_scale = config.attn_scale
        self.chunk = (config.attention_chunk_size
                      if config.layer_types[layer_idx] == "chunked_attention" else None)
        self.rms_eps = config.rms_norm_eps

    def extra_attn_kwargs(self, params):
        return {"chunk_size": self.chunk}

    def post_rope_qk(self, params, q, k):
        # invoked after the (bypassed) skeleton rope: apply llama4 rope here
        # using the positions stashed by the model (attn_args threading is
        # handled via self._rope set per forward by Llama4TextModel)
        cos, sin, q_positions = self._rope
        if self.use_rope:
            q = apply_rope_complex_pairs(q, cos, sin)
            k = apply_rope_complex_pairs(k, cos, sin)
        if self.use_qk_norm:
            q = _l2norm(q, self.rms_eps)
            k = _l2norm(k, self.rms_eps)
        if self.attn_temperature_tuning and not self.use_rope:
            scales = (jnp.log1p(jnp.floor((q_positions.astype(jnp.float32) + 1.0)
                                          / self.floor_scale)) * self.attn_scale + 1.0)
            q = (q * scales[:, :, None, None]).astype(q.dtype)
        return q, k

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        # stash rope inputs for post_rope_qk (cos/sin carry the complex-pair
        # tables; q_positions drive NoPE temperature tuning)
        object.__setattr__(self, "_rope", (cos, sin, attn_args["q_positions"]))
        return super().__call__(params, hidden, None, None, attn_args, cache,
                                cache_position)


class Llama4TextMLP(LlamaMLP):
    def __init__(self, config, intermediate_size=None, *, dtype, param_dtype):
        if intermediate_size is not None:
            import copy

            config = copy.copy(config)
            config.intermediate_size = intermediate_size
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)


class Llama4TextMoe(Module):
    """Router scores scale the expert INPUT; all experts run densely over
    the batch (reference :147-166; the scores of unselected experts are
    sigmoid(-inf) = 0 so only top-k contribute)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        # the checkpoint stores the router as a bare Linear named "router"
        self.router = Linear(config.hidden_size, config.num_local_experts, False,
                             kernel_init=normal_init(config.initializer_range), **kw)
        self.shared_expert = Llama4TextMLP(config, **kw)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        k1, k2 = jax.random.split(rng)
        init = normal_init(c.initializer_range)
        params["experts"] = {
            "gate_up_proj": init(k1, (c.num_local_experts, c.hidden_size,
                                      2 * c.intermediate_size), self.param_dtype),
            "down_proj": init(k2, (c.num_local_experts, c.intermediate_size,
                                   c.hidden_size), self.param_dtype),
        }
        return params

    def __call__(self, params, hidden):
        b, s, hd = hidden.shape
        c = self.config
        x = hidden.reshape(-1, hd)
        logits = self.router(params["router"], x).astype(jnp.float32)  # [T, E]
        topv, topi = jax.lax.top_k(logits, c.num_experts_per_tok)
        neg = jnp.full_like(logits, -jnp.inf)
        picked = neg.at[jnp.arange(x.shape[0])[:, None], topi].set(topv)
        scores = jax.nn.sigmoid(picked).astype(x.dtype)                # [T, E]
        gu = params["experts"]["gate_up_proj"].astype(self.dtype)      # [E, H, 2I]
        dn = params["experts"]["down_proj"].astype(self.dtype)         # [E, I, H]
        xe = x[None] * scores.T[:, :, None]                            # [E, T, H]
        gate_up = jnp.einsum("eth,ehi->eti", xe.astype(self.dtype), gu)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        act = get_activation(c.hidden_act)
        routed = jnp.einsum("eti,eih->eth", up * act(gate), dn).sum(0)  # [T, H]
        out = self.shared_expert(params["shared_expert"], x) + routed
        return out.reshape(b, s, hd)


class Llama4TextDecoderLayer(LlamaDecoderLayer):
    attention_cls = Llama4TextAttention

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        del self._children["mlp"]
        object.__delattr__(self, "mlp")
        if layer_idx in config.moe_layers:
            self.feed_forward = Llama4TextMoe(config, **kw)
        else:
            self.feed_forward = Llama4TextMLP(config, config.intermediate_size_mlp, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        h, cache = self.self_attn(params["self_attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.feed_forward(params["feed_forward"], h)
        return residual + h, cache


class Llama4TextModel(LlamaModel):
    decoder_layer_cls = Llama4TextDecoderLayer

    def compute_rope(self, position_ids):
        # complex-pair tables (attention_scaling folded into cos AND sin like
        # the reference's freqs_cis * attention_scaling)
        from ...ops.rope import compute_cos_sin

        cos, sin = compute_cos_sin(position_ids, self.inv_freq,
                                   self.attention_scaling, dtype=jnp.float32)
        return cos, sin


class Llama4ForCausalLM(LlamaForCausalLM):
    config_class = Llama4TextConfig
    model_cls = Llama4TextModel


class Llama4TextModelStandalone(LlamaModelStandalone):
    config_class = Llama4TextConfig
    model_cls = Llama4TextModel


# --------------------------------------------------------------------- vision
class Llama4VisionAttention(Module):
    """2D complex rotary over (x, y) patch coordinates (reference :762/:982)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        e = config.hidden_size
        self.q_proj = Linear(e, e, True, **kw)
        self.k_proj = Linear(e, e, True, **kw)
        self.v_proj = Linear(e, e, True, **kw)
        self.o_proj = Linear(e, e, True, **kw)

    def __call__(self, params, hidden, cos, sin):  # hidden [B, P, E]
        from ...ops.attention import eager_attention

        b, s, e = hidden.shape
        q = self.q_proj(params["q_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.k_proj(params["k_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.v_proj(params["v_proj"], hidden).reshape(b, s, self.num_heads, self.head_dim)

        def rot(x):  # complex multiply on (re, im) pairs; cos/sin [P, D/2]
            f = x.astype(jnp.float32).reshape(b, s, self.num_heads, self.head_dim // 2, 2)
            re, im = f[..., 0], f[..., 1]
            c = cos[None, :, None, :]
            s_ = sin[None, :, None, :]
            out = jnp.stack([re * c - im * s_, re * s_ + im * c], axis=-1)
            return out.reshape(b, s, self.num_heads, self.head_dim).astype(x.dtype)

        q, k = rot(q), rot(k)
        out = eager_attention(q, k, v, is_causal=False, scale=self.head_dim**-0.5)
        return self.o_proj(params["o_proj"], out.reshape(b, s, e))


class Llama4VisionEncoderLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ...core.module import LayerNorm

        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        self.self_attn = Llama4VisionAttention(config, **kw)
        mlp = Module(dtype=dtype, param_dtype=param_dtype)
        mlp.fc1 = Linear(config.hidden_size, config.intermediate_size, True, **kw2)
        mlp.fc2 = Linear(config.intermediate_size, config.hidden_size, True, **kw2)
        self.mlp = mlp
        self.input_layernorm = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.post_attention_layernorm = LayerNorm(config.hidden_size, 1e-5, **kw)

    def __call__(self, params, hidden, cos, sin):
        res = hidden
        h = self.input_layernorm(params["input_layernorm"], hidden)
        hidden = res + self.self_attn(params["self_attn"], h, cos, sin)
        res = hidden
        h = self.post_attention_layernorm(params["post_attention_layernorm"], hidden)
        h = self.mlp.fc2(params["mlp"]["fc2"],
                         jax.nn.gelu(self.mlp.fc1(params["mlp"]["fc1"], h),
                                     approximate=False))
        return res + h


class Llama4VisionModel(Module):
    """reference :1004 — unfold patch linear, CLS appended LAST, 2D rotary,
    pixel-shuffle adapter producing vision_output_dim features."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        from ...core.module import LayerNorm

        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        kw2 = dict(dtype=dtype, param_dtype=param_dtype, kernel_init=normal_init(0.02))
        patch_embedding = Module(**kw)
        patch_embedding.linear = Linear(
            config.num_channels * config.patch_size**2, config.hidden_size, False, **kw2)
        self.patch_embedding = patch_embedding
        self.layernorm_pre = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.layernorm_post = LayerNorm(config.hidden_size, 1e-5, **kw)
        model = Module(**kw)
        model.layers = [Llama4VisionEncoderLayer(config, **kw)
                        for _ in range(config.num_hidden_layers)]
        self.model = model
        adapter = Module(**kw)
        mlp2 = Module(**kw)
        mlp2.fc1 = Linear(config.intermediate_size, config.projector_input_dim, False, **kw2)
        mlp2.fc2 = Linear(config.projector_output_dim, config.projector_output_dim, False, **kw2)
        adapter.mlp = mlp2
        self.vision_adapter = adapter
        self.shuffle_ratio = config.pixel_shuffle_ratio
        # host-precomputed 2D rotary phases (reference Llama4VisionRotaryEmbedding)
        import numpy as np

        idx = config.image_size // config.patch_size
        img_idx = np.arange(idx**2).reshape(-1, 1)
        img_idx = np.concatenate([img_idx, img_idx[:1]], axis=0)
        img_idx[-1, -1] = -2
        fx = img_idx % idx
        fy = img_idx // idx
        freq_dim = config.hidden_size // config.num_attention_heads // 2
        rope_freq = 1.0 / (config.rope_theta ** (np.arange(0, freq_dim, 2)[: freq_dim // 2]
                                                 / freq_dim))
        fxs = np.repeat((fx + 1)[..., None] * rope_freq[None, None, :], 2, axis=-1)
        fys = np.repeat((fy + 1)[..., None] * rope_freq[None, None, :], 2, axis=-1)
        freqs = np.concatenate([fxs, fys], axis=-1)[..., ::2][:, 0]
        freqs = np.where(img_idx < 0, 0.0, freqs)
        self._cos = jnp.asarray(np.cos(freqs), jnp.float32)
        self._sin = jnp.asarray(np.sin(freqs), jnp.float32)

    def init(self, rng):
        params = super().init(rng)
        c = self.config
        k1, k2 = jax.random.split(rng)
        scale = c.hidden_size ** -0.5
        params["class_embedding"] = (
            scale * jax.random.normal(k1, (c.hidden_size,))).astype(self.param_dtype)
        n = (c.image_size // c.patch_size) ** 2 + 1
        params["positional_embedding_vlm"] = (
            scale * jax.random.normal(k2, (n, c.hidden_size))).astype(self.param_dtype)
        return params

    def _pixel_shuffle(self, x):
        r = self.shuffle_ratio
        b, n, c = x.shape
        side = int(n ** 0.5)
        x = x.reshape(b, side, side, c)
        x = x.reshape(b, side, int(side * r), int(c / r))
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(b, int(side * r), int(side * r), int(c / r**2))
        x = x.transpose(0, 2, 1, 3)
        return x.reshape(b, -1, int(c / r**2))

    def __call__(self, params, pixel_values):  # [N, C, H, W]
        c = self.config
        b, ch, hh, ww = pixel_values.shape
        p = c.patch_size
        x = pixel_values.reshape(b, ch, hh // p, p, ww // p, p)
        x = x.transpose(0, 2, 4, 1, 3, 5).reshape(b, -1, ch * p * p)
        hidden = self.patch_embedding.linear(
            params["patch_embedding"]["linear"], x.astype(self.dtype))
        cls = jnp.broadcast_to(params["class_embedding"].astype(self.dtype),
                               (b, 1, hidden.shape[-1]))
        hidden = jnp.concatenate([hidden, cls], axis=1)
        hidden = hidden + params["positional_embedding_vlm"].astype(self.dtype)
        hidden = self.layernorm_pre(params["layernorm_pre"], hidden)
        for i, layer in enumerate(self.model.layers):
            hidden = layer(params["model"]["layers"][str(i)], hidden,
                           self._cos, self._sin)
        hidden = self.layernorm_post(params["layernorm_post"], hidden)
        hidden = hidden[:, :-1, :]
        h = self._pixel_shuffle(hidden)
        h = jax.nn.gelu(self.vision_adapter.mlp.fc1(
            params["vision_adapter"]["mlp"]["fc1"], h), approximate=False)
        return jax.nn.gelu(self.vision_adapter.mlp.fc2(
            params["vision_adapter"]["mlp"]["fc2"], h), approximate=False)


class Llama4ForConditionalGeneration(LlamaForCausalLM):
    """reference :1133 — vision features scattered at image-token slots."""

    config_class = Llama4Config
    _prefill_input_names = ("pixel_values",)

    def __init__(self, config: Llama4Config, *, dtype=jnp.float32, param_dtype=None):
        from ...modeling_utils import PreTrainedModel

        PreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vision_model = Llama4VisionModel(config.vision_config, **kw)
        proj = Module(**kw)
        proj.linear_1 = Linear(config.vision_config.vision_output_dim,
                               config.text_config.hidden_size, False,
                               kernel_init=normal_init(0.02), **kw)
        self.multi_modal_projector = proj
        self.language_model = Llama4ForCausalLM(config.text_config, **kw)

    def get_input_embedding_path(self):
        return "language_model.model.embed_tokens.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def init_cache(self, batch_size, max_len, dtype=None, implementation="static"):
        return self.language_model.init_cache(batch_size, max_len, dtype, implementation)

    def __call__(self, params, input_ids=None, pixel_values=None, attention_mask=None,
                 position_ids=None, past_key_values=None, cache_position=0,
                 inputs_embeds=None, labels=None, logits_to_keep: int = 0,
                 output_hidden_states=False, **kwargs):
        if inputs_embeds is None:
            mask = input_ids == self.config.image_token_index
            embeds = self.language_model.model.embed_tokens(
                params["language_model"]["model"]["embed_tokens"],
                jnp.where(mask, 0, input_ids))
            if pixel_values is not None:
                feats = self.vision_model(params["vision_model"], pixel_values)
                feats = self.multi_modal_projector.linear_1(
                    params["multi_modal_projector"]["linear_1"],
                    feats.reshape(-1, feats.shape[-1]))
                order = jnp.cumsum(mask.reshape(-1).astype(jnp.int32)) - 1
                gathered = jnp.take(feats.astype(embeds.dtype),
                                    jnp.clip(order, 0, feats.shape[0] - 1), axis=0)
                embeds = jnp.where(mask[..., None], gathered.reshape(embeds.shape), embeds)
            inputs_embeds = embeds
        return self.language_model(params["language_model"], None, attention_mask,
                                   position_ids, past_key_values, cache_position,
                                   inputs_embeds, labels, logits_to_keep,
                                   output_hidden_states)
