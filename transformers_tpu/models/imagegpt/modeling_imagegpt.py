"""ImageGPT (reference models/imagegpt/modeling_imagegpt.py).

GPT-2 skeleton over 9-bit color-cluster tokens with ImageGPT's LayerNorm —
no mean centering and no bias (:48-58, an RMS norm) — untied ``lm_head``
over vocab 513 (512 clusters + SOS) and a mean-pooled classification head
(:722-780).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import CausalLMOutputWithPast, SequenceClassifierOutput
from ...modeling_utils import PreTrainedModel
from ..gpt2.configuration_gpt2 import GPT2Config
from ..gpt2.modeling_gpt2 import GPT2Block, GPT2LMHeadModel, GPT2Model


class ImageGPTConfig(GPT2Config):
    model_type = "imagegpt"

    def __init__(self, vocab_size=513, n_positions=1024, n_embd=512, n_layer=24,
                 n_head=8, activation_function="quick_gelu",
                 tie_word_embeddings=False, **kwargs):
        super().__init__(vocab_size=vocab_size, n_positions=n_positions,
                         n_embd=n_embd, n_layer=n_layer, n_head=n_head,
                         activation_function=activation_function,
                         tie_word_embeddings=tie_word_embeddings, **kwargs)


class ImageGPTLayerNorm(Module):
    """x / sqrt(mean(x^2) + eps) * weight — no centering, no bias (:48)."""

    def __init__(self, dim, eps=1e-5, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.dim, self.eps = dim, eps

    def init(self, rng):
        return {"weight": jnp.ones((self.dim,), self.param_dtype)}

    def __call__(self, params, x):
        h = x.astype(jnp.float32)
        h = h * jax.lax.rsqrt(jnp.mean(jnp.square(h), axis=-1, keepdims=True) + self.eps)
        return (h * params["weight"].astype(jnp.float32)).astype(self.dtype)


class ImageGPTBlock(GPT2Block):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(config, layer_idx, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        for name in ("ln_1", "ln_2"):
            del self._children[name]
            object.__delattr__(self, name)
        self.ln_1 = ImageGPTLayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)
        self.ln_2 = ImageGPTLayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)


class ImageGPTModel(GPT2Model):
    block_cls = ImageGPTBlock

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        del self._children["ln_f"]
        object.__delattr__(self, "ln_f")
        self.ln_f = ImageGPTLayerNorm(config.n_embd, config.layer_norm_epsilon, **kw)


class ImageGPTPreTrainedModel(PreTrainedModel):
    config_class = ImageGPTConfig
    base_model_prefix = "transformer"


class ImageGPTForCausalImageModeling(GPT2LMHeadModel):
    config_class = ImageGPTConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        PreTrainedModel.__init__(self, config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.transformer = ImageGPTModel(config, **kw)
        # untied lm head over the 512 clusters only — the SOS token is
        # never predicted (reference :593-600: vocab_size - 1)
        self.lm_head = Linear(config.n_embd, config.vocab_size - 1, False,
                              kernel_init=normal_init(config.initializer_range), **kw)

    def compute_logits(self, params, hidden):
        return self.lm_head(params["lm_head"], hidden)


class ImageGPTModelStandalone(ImageGPTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.transformer = ImageGPTModel(config, dtype=self.dtype,
                                         param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.transformer(params["transformer"], *args, **kwargs)


class ImageGPTForImageClassification(ImageGPTPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.num_labels = config.num_labels
        self.transformer = ImageGPTModel(config, **kw)
        self.score = Linear(config.n_embd, config.num_labels, False,
                            kernel_init=normal_init(config.initializer_range), **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, labels=None,
                 **kwargs) -> SequenceClassifierOutput:
        out = self.transformer(params["transformer"], input_ids, attention_mask)
        pooled = out.last_hidden_state.mean(axis=1)
        logits = self.score(params["score"], pooled)
        loss = None
        if labels is not None:
            from ...loss import for_sequence_classification_loss

            loss = for_sequence_classification_loss(logits, labels, self.config)
        return SequenceClassifierOutput(loss=loss, logits=logits)
