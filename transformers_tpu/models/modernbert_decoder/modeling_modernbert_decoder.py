"""ModernBERT-decoder (reference models/modernbert_decoder/modeling_modernbert_decoder.py).

Causal ModernBERT: LayerNorm (optional bias) everywhere, layer-0 identity
attention norm (:301-312), packed GLU MLP ``Wi``/``Wo`` with act(input)*gate
(:71-88), q/k/v + ``Wo`` attention names (:226-257), alternating
sliding/full layers with per-type rope thetas (:91-143), embeddings passed
through a LayerNorm (:49-68), and a ``dense->act->norm`` prediction head
feeding a tied ``decoder`` linear with its own bias (:347-357, :523-531).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ...ops.rope import compute_cos_sin
from ..llama.modeling_llama import (
    LlamaAttention,
    LlamaDecoderLayer,
    LlamaForCausalLM,
    LlamaModel,
    LlamaModelStandalone,
)


class ModernBertDecoderConfig(PretrainedConfig):
    model_type = "modernbert-decoder"

    def __init__(self, vocab_size=50368, hidden_size=768, intermediate_size=1152,
                 num_hidden_layers=22, num_attention_heads=12, hidden_activation="gelu",
                 max_position_embeddings=8192, initializer_range=0.02,
                 initializer_cutoff_factor=2.0, norm_eps=1e-5, norm_bias=False,
                 pad_token_id=50283, eos_token_id=50282, bos_token_id=50281,
                 cls_token_id=50281, sep_token_id=50282, global_rope_theta=160000.0,
                 attention_bias=False, attention_dropout=0.0, embedding_dropout=0.0,
                 mlp_bias=False, mlp_dropout=0.0, decoder_bias=True,
                 classifier_dropout=0.0, classifier_bias=False,
                 classifier_activation="gelu", use_cache=True, local_attention=128,
                 global_attn_every_n_layers=3, local_rope_theta=160000.0,
                 layer_types=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = num_attention_heads
        self.hidden_activation = hidden_activation
        self.hidden_act = hidden_activation
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.initializer_cutoff_factor = initializer_cutoff_factor
        self.norm_eps = norm_eps
        self.norm_bias = norm_bias
        self.global_rope_theta = global_rope_theta
        self.rope_theta = global_rope_theta
        self.attention_bias = attention_bias
        self.attention_dropout = attention_dropout
        self.embedding_dropout = embedding_dropout
        self.mlp_bias = mlp_bias
        self.mlp_dropout = mlp_dropout
        self.decoder_bias = decoder_bias
        self.classifier_dropout = classifier_dropout
        self.classifier_bias = classifier_bias
        self.classifier_activation = classifier_activation
        self.use_cache = use_cache
        self.local_attention = local_attention
        self.sliding_window = local_attention // 2
        self.global_attn_every_n_layers = global_attn_every_n_layers
        self.local_rope_theta = local_rope_theta
        if layer_types is None:
            layer_types = ["full_attention" if i % global_attn_every_n_layers == 0
                           else "sliding_attention" for i in range(num_hidden_layers)]
        self.layer_types = layer_types
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id, cls_token_id=cls_token_id,
                         sep_token_id=sep_token_id, **kwargs)


class ModernBertDecoderAttention(LlamaAttention):
    def build_projections(self, config, qkv_bias, o_bias, kw):
        h = config.hidden_size
        self.q_proj = Linear(h, self.num_heads * self.head_dim, qkv_bias, **kw)
        self.k_proj = Linear(h, self.num_kv_heads * self.head_dim, qkv_bias, **kw)
        self.v_proj = Linear(h, self.num_kv_heads * self.head_dim, qkv_bias, **kw)
        self.Wo = Linear(self.num_heads * self.head_dim, h, o_bias, **kw)

    def project_out(self, params, out):
        return self.Wo(params["Wo"], out)


class ModernBertDecoderMLP(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.inter = config.intermediate_size
        self.Wi = Linear(config.hidden_size, 2 * self.inter, config.mlp_bias, **kw)
        self.Wo = Linear(self.inter, config.hidden_size, config.mlp_bias, **kw)
        self.act = get_activation(config.hidden_activation)

    def __call__(self, params, x):
        wi = self.Wi(params["Wi"], x)
        inp, gate = wi[..., : self.inter], wi[..., self.inter:]
        return self.Wo(params["Wo"], self.act(inp) * gate)


class _Identity(Module):
    def init(self, rng):
        return {}

    def __call__(self, params, x):
        return x


class ModernBertDecoderLayer(LlamaDecoderLayer):
    attention_cls = ModernBertDecoderAttention
    mlp_cls = ModernBertDecoderMLP

    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        # rename: attn_norm (identity at layer 0) / attn / mlp_norm / mlp
        for name in ("input_layernorm", "self_attn", "post_attention_layernorm", "mlp"):
            del self._children[name]
            object.__delattr__(self, name)
        self.attn_norm = (_Identity(**kw) if layer_idx == 0
                          else self.make_norm(config, **kw))
        self.attn = self.attention_cls(config, layer_idx, **kw)
        self.mlp_norm = self.make_norm(config, **kw)
        self.mlp = self.mlp_cls(config, **kw)

    @staticmethod
    def make_norm(config, **kw):
        return LayerNorm(config.hidden_size, config.norm_eps,
                         use_bias=config.norm_bias, **kw)

    def __call__(self, params, hidden, cos, sin, attn_args, cache, cache_position):
        residual = hidden
        h = self.attn_norm(params.get("attn_norm", {}), hidden)
        h, cache = self.attn(params["attn"], h, cos, sin, attn_args, cache, cache_position)
        hidden = residual + h
        residual = hidden
        h = self.mlp_norm(params["mlp_norm"], hidden)
        return residual + self.mlp(params["mlp"], h), cache


class ModernBertDecoderModel(LlamaModel):
    decoder_layer_cls = ModernBertDecoderLayer
    norm_name = "final_norm"

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        del self._children["embed_tokens"]
        object.__delattr__(self, "embed_tokens")
        embeddings = Module(**kw)
        embeddings.tok_embeddings = Embedding(
            config.vocab_size, config.hidden_size,
            embedding_init=normal_init(config.initializer_range), **kw)
        embeddings.norm = LayerNorm(config.hidden_size, config.norm_eps,
                                    use_bias=config.norm_bias, **kw)
        self.embeddings = embeddings
        # dual rope tables by layer type
        dim = config.hidden_size // config.num_attention_heads
        self.global_inv_freq = 1.0 / (config.global_rope_theta ** (
            np.arange(0, dim, 2, dtype=np.float64) / dim))
        self.local_inv_freq = 1.0 / (config.local_rope_theta ** (
            np.arange(0, dim, 2, dtype=np.float64) / dim))

    def embed(self, params, input_ids):
        h = self.embeddings.tok_embeddings(params["embeddings"]["tok_embeddings"], input_ids)
        return self.embeddings.norm(params["embeddings"]["norm"], h)

    def compute_rope(self, position_ids):
        g = compute_cos_sin(position_ids, self.global_inv_freq, 1.0, dtype=self.dtype)
        l = compute_cos_sin(position_ids, self.local_inv_freq, 1.0, dtype=self.dtype)
        return {"full_attention": g, "sliding_attention": l}

    def rope_for_layer(self, rope, layer_idx):
        return rope[self.config.layer_types[layer_idx]]


class ModernBertDecoderForCausalLM(LlamaForCausalLM):
    config_class = ModernBertDecoderConfig
    model_cls = ModernBertDecoderModel
    _keys_to_ignore_on_load_unexpected = (r"^decoder\.weight$",)

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        PreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.model = self.model_cls(config, **kw)
        head = Module(**kw)
        head.dense = Linear(config.hidden_size, config.hidden_size,
                            config.classifier_bias,
                            kernel_init=normal_init(config.initializer_range), **kw)
        head.norm = LayerNorm(config.hidden_size, config.norm_eps,
                              use_bias=config.norm_bias, **kw)
        self.lm_head = head
        self.head_act = get_activation(config.classifier_activation)
        if config.decoder_bias:
            self.decoder = _DecoderBias(config.vocab_size, **kw)

    def get_input_embedding_path(self):
        return "model.embeddings.tok_embeddings.weight"

    def compute_logits(self, params, hidden):
        h = self.head_act(self.lm_head.dense(params["lm_head"]["dense"], hidden))
        h = self.lm_head.norm(params["lm_head"]["norm"], h)
        table = params["model"]["embeddings"]["tok_embeddings"]["weight"]
        logits = jnp.dot(h.astype(self.dtype), table.astype(self.dtype).T)
        if self.config.decoder_bias:
            logits = logits + params["decoder"]["bias"].astype(self.dtype)
        return logits


class _DecoderBias(Module):
    """Holds only the tied decoder's bias (weight reads the embedding table)."""

    def __init__(self, vocab_size, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.vocab_size = vocab_size

    def init(self, rng):
        return {"bias": jnp.zeros((self.vocab_size,), self.param_dtype)}


class ModernBertDecoderModelStandalone(LlamaModelStandalone):
    config_class = ModernBertDecoderConfig
    model_cls = ModernBertDecoderModel
