"""GIT — GenerativeImage2Text (reference src/transformers/models/git/modeling_git.py).

CLIP-style vision encoder (post_layernorm over the FULL sequence, GIT's own
copy of the CLIP tower) → Linear+LayerNorm ``visual_projection`` → image
tokens PREFIXED to the BERT-style text decoder sequence. Attention pattern:
image tokens attend only among themselves, text tokens attend to all image
tokens plus causally to earlier text (GitModel.create_attention_mask).
Untied ``output`` head."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ..bert.modeling_bert import (
    BertIntermediate,
    BertOutput,
    BertSelfOutput,
)
from ..clip.modeling_clip import CLIPVisionTransformer
from .configuration_git import GitConfig


class _GitSelfAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.num_heads = config.num_attention_heads
        self.head_dim = config.hidden_size // config.num_attention_heads
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.query = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.key = Linear(config.hidden_size, config.hidden_size, True, **kw)
        self.value = Linear(config.hidden_size, config.hidden_size, True, **kw)

    def __call__(self, params, hidden, additive_mask):
        b, s, e = hidden.shape
        q = self.query(params["query"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        k = self.key(params["key"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        v = self.value(params["value"], hidden).reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bihd,bjhd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32)) / (self.head_dim**0.5)
        scores = scores + additive_mask
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", probs, v.astype(jnp.float32))
        return out.reshape(b, s, e).astype(hidden.dtype)


class GitLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.attention = _GitAttention(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden, additive_mask):
        hidden = self.attention(params["attention"], hidden, additive_mask)
        inner = self.intermediate(params["intermediate"], hidden)
        return self.output(params["output"], inner, hidden)


class _GitAttention(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.self = _GitSelfAttention(config, dtype=dtype, param_dtype=param_dtype)
        self.output = BertSelfOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, additive_mask):
        out = self.self(params["self"], hidden, additive_mask)
        return self.output(params["output"], out, hidden)


class GitEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings,
                                             config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids):
        s = input_ids.shape[1]
        emb = self.word_embeddings(params["word_embeddings"], input_ids)
        pos = self.position_embeddings(params["position_embeddings"],
                                       jnp.arange(s, dtype=jnp.int32)[None, :])
        return self.LayerNorm(params["LayerNorm"], emb + pos)


class _GitProjection(Module):
    """Sequential(Linear, LayerNorm) at indices 0/1 under visual_projection."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        setattr(self, "0", Linear(config.vision_config.hidden_size, config.hidden_size,
                                  True, dtype=dtype, param_dtype=param_dtype,
                                  kernel_init=normal_init(config.initializer_range)))
        setattr(self, "1", LayerNorm(config.hidden_size,
                                     config.vision_config.layer_norm_eps,
                                     dtype=dtype, param_dtype=param_dtype))

    def __call__(self, params, x):
        h = getattr(self, "0")(params["0"], x)
        return getattr(self, "1")(params["1"], h)


class GitProjection(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.visual_projection = _GitProjection(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, x):
        return self.visual_projection(params["visual_projection"], x)


class GitModel(Module):
    def __init__(self, config: GitConfig, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = GitEmbeddings(config, **kw)
        self.image_encoder = _GitImageEncoder(config.vision_config, **kw)
        self.encoder = _GitEncoder(config, **kw)
        self.visual_projection = GitProjection(config, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, pixel_values=None,
                 output_hidden_states=False):
        text = self.embeddings(params["embeddings"], input_ids)
        b, s_t, _ = text.shape
        if pixel_values is not None:
            vis = self.image_encoder(params["image_encoder"], pixel_values)
            vis = self.visual_projection(params["visual_projection"], vis)
            vis = jnp.broadcast_to(vis, (b,) + vis.shape[1:]) if vis.shape[0] != b else vis
            s_i = vis.shape[1]
            hidden = jnp.concatenate([vis.astype(text.dtype), text], axis=1)
        else:
            s_i = 0
            hidden = text
        s = s_i + s_t
        # mask: image rows see image cols only; text rows see image + causal text
        neg = jnp.finfo(jnp.float32).min
        m = jnp.zeros((s, s), jnp.float32)
        if s_i:
            m = m.at[:s_i, s_i:].set(neg)
        tri = jnp.triu(jnp.full((s_t, s_t), neg, jnp.float32), k=1)
        m = m.at[s_i:, s_i:].set(tri)
        m = jnp.broadcast_to(m[None, None], (b, 1, s, s))
        if attention_mask is not None:
            pad = jnp.where(attention_mask.astype(bool), 0.0, neg)[:, None, None, :]
            pad = jnp.concatenate(
                [jnp.zeros((b, 1, 1, s_i), jnp.float32), pad], axis=-1)
            m = m + pad
        for i, layer in enumerate(self.encoder.layer):
            hidden = layer(params["encoder"]["layer"][str(i)], hidden, m)
        return hidden


class _GitEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [GitLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]


class _GitImageEncoder(Module):
    """CLIPVisionModel wrapper with post_layernorm over the full sequence."""

    def __init__(self, vision_config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.vision_model = CLIPVisionTransformer(vision_config, dtype=dtype,
                                                  param_dtype=param_dtype)

    def __call__(self, params, pixel_values):
        p = params["vision_model"]
        vm = self.vision_model
        hidden = vm.embeddings(p["embeddings"], jnp.asarray(pixel_values, self.dtype))
        hidden = vm.pre_layrnorm(p["pre_layrnorm"], hidden)
        hidden, _ = vm.encoder(p["encoder"], hidden, {"is_causal": False}, False)
        return vm.post_layernorm(p["post_layernorm"], hidden)


class GitPreTrainedModel(PreTrainedModel):
    config_class = GitConfig
    base_model_prefix = "git"


class GitForCausalLM(GitPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.git = GitModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.output = Linear(config.hidden_size, config.vocab_size, True,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "git.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None, pixel_values=None,
                 labels=None, **kwargs) -> CausalLMOutputWithPast:
        hidden = self.git(params["git"], input_ids, attention_mask, pixel_values)
        logits = self.output(params["output"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            # loss over the TEXT region only
            s_t = input_ids.shape[1]
            loss = for_causal_lm_loss(logits[:, -s_t:], labels, self.config.vocab_size)
        return CausalLMOutputWithPast(loss=loss, logits=logits)
