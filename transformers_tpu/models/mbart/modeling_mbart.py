"""mBART (reference src/transformers/models/mbart/modeling_mbart.py).

BART skeleton with pre-LN layers (norm before each sublayer) and a final
``layer_norm`` on both encoder and decoder (reference :284-315 encoder layer,
:510-511 layernorm_embedding + layer_norm), learned offset-2 positions and
``final_logits_bias`` as in BART.
"""

from __future__ import annotations

from ..bart.modeling_bart import (
    BartDecoder,
    BartDecoderLayer,
    BartEncoder,
    BartEncoderLayer,
    BartForConditionalGeneration,
    BartModel,
    BartPreTrainedModel,
)
from .configuration_mbart import MBartConfig


class MBartEncoderLayer(BartEncoderLayer):
    pre_norm = True


class MBartDecoderLayer(BartDecoderLayer):
    pre_norm = True


class MBartEncoder(BartEncoder):
    layer_cls = MBartEncoderLayer
    use_final_norm = True


class MBartDecoder(BartDecoder):
    layer_cls = MBartDecoderLayer
    use_final_norm = True


class MBartModel(BartModel):
    encoder_cls = MBartEncoder
    decoder_cls = MBartDecoder


class MBartForConditionalGeneration(BartForConditionalGeneration):
    config_class = MBartConfig
    model_cls = MBartModel


class _MBartCausalDecoder(MBartDecoder):
    """MBartDecoder + owned ``embed_tokens`` (MBartForCausalLM layout:
    model.decoder.embed_tokens; reference modeling_mbart.py MBartForCausalLM)."""

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        from ...core.module import Embedding, normal_init

        self.embed_tokens = Embedding(config.vocab_size, config.d_model,
                                      embedding_init=normal_init(config.init_std),
                                      dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, input_ids, cross_kv, cache=None, cache_position=0,
                 attention_mask=None, encoder_mask=None):
        embeds = self.embed_tokens(params["embed_tokens"], input_ids)
        return super().__call__(params, embeds, cross_kv, cache, cache_position,
                                attention_mask, encoder_mask)


class MBartForCausalLM(BartPreTrainedModel):
    """Decoder-only wrapper with cross-attention, used as the Donut text
    decoder inside VisionEncoderDecoder (reference MBartForCausalLM)."""

    config_class = MBartConfig

    def __init__(self, config, *, dtype=None, param_dtype=None):
        import jax.numpy as jnp

        super().__init__(config, dtype=dtype or jnp.float32, param_dtype=param_dtype)
        from ...core.module import Linear, Module, normal_init

        wrapper = Module(dtype=self.dtype, param_dtype=self.param_dtype)
        wrapper.decoder = _MBartCausalDecoder(config, dtype=self.dtype,
                                              param_dtype=self.param_dtype)
        self.model = wrapper
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.d_model, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.init_std))

    @property
    def decoder(self):
        return self.model.decoder

    def get_input_embedding_path(self):
        return "model.decoder.embed_tokens.weight"

    def compute_logits(self, params, hidden):
        if self.config.tie_word_embeddings:
            return self.model.decoder.embed_tokens.attend(
                params["model"]["decoder"]["embed_tokens"], hidden)
        return self.lm_head(params["lm_head"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None):
        from ...cache_utils import init_static_cache

        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len,
                                 num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)
