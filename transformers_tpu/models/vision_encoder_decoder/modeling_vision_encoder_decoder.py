"""VisionEncoderDecoder (reference
src/transformers/models/vision_encoder_decoder/modeling_vision_encoder_decoder.py).

Generic composition: an AutoModel vision encoder (ViT/DeiT/Swin/...) feeding
a cross-attending text decoder (TrOCR), with an ``enc_to_dec_proj`` when the
hidden sizes differ (:137). Drives OCR checkpoints (microsoft/trocr-*) and
the image-to-text pipeline through the shared seq2seq generation mixin.
"""

from __future__ import annotations

import importlib

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from .configuration_vision_encoder_decoder import VisionEncoderDecoderConfig


def _encoder_model(config, **kw):
    from ..auto.modeling_auto import MODEL_MAPPING_NAMES

    module_name, class_name = MODEL_MAPPING_NAMES[config.model_type]
    module = importlib.import_module(f"transformers_tpu.models.{module_name}")
    cls = getattr(module, class_name)
    standalone = cls(config, **kw)
    # unwrap to the bare module (the Standalone wrapper prefixes a child)
    children = standalone.children
    return next(iter(children.values())), cls


def _decoder_model(config, **kw):
    if config.model_type == "trocr":
        from ..trocr.modeling_trocr import TrOCRForCausalLM

        return TrOCRForCausalLM(config, **kw)
    if config.model_type == "mbart":
        # Donut checkpoints (naver-clova-ix/donut-*) decode with MBartForCausalLM
        from ..mbart.modeling_mbart import MBartForCausalLM

        return MBartForCausalLM(config, **kw)
    raise NotImplementedError(
        f"VisionEncoderDecoder decoder {config.model_type!r} not supported yet "
        "(trocr, mbart)")


class VisionEncoderDecoderModel(PreTrainedModel, EncoderDecoderGenerationMixin):
    config_class = VisionEncoderDecoderConfig
    base_model_prefix = ""
    main_input_name = "pixel_values"
    encoder_input_name = "pixel_values"

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder, enc_cls = _encoder_model(config.encoder, **kw)
        self.decoder = _decoder_model(config.decoder, **kw)
        # inherit the encoder family's checkpoint-name rules, re-scoped under
        # the ``encoder.`` prefix (rules are unanchored regexes, so they apply
        # as-is; ignores are substring patterns)
        self._weight_rules = (tuple(getattr(enc_cls, "_weight_rules", ()))
                              + tuple(type(self)._weight_rules
                                      if isinstance(type(self)._weight_rules, tuple)
                                      else ()))
        self._keys_to_ignore_on_load_unexpected = (
            tuple(getattr(enc_cls, "_keys_to_ignore_on_load_unexpected", ()))
            + tuple(type(self)._keys_to_ignore_on_load_unexpected))
        if (config.encoder.hidden_size != config.decoder.hidden_size
                and config.decoder.cross_attention_hidden_size is None):
            self.enc_to_dec_proj = Linear(config.encoder.hidden_size,
                                          config.decoder.hidden_size, True,
                                          kernel_init=normal_init(0.02), **kw)
        else:
            self.enc_to_dec_proj = None

    # ------------------------------------------------- seq2seq mixin contract
    def encode(self, params, pixel_values, attention_mask=None) -> BaseModelOutput:
        out = self.encoder(params["encoder"], pixel_values)
        hidden = out.last_hidden_state
        if self.enc_to_dec_proj is not None:
            hidden = self.enc_to_dec_proj(params["enc_to_dec_proj"], hidden)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        dec = self.decoder.model.decoder
        for i, layer in enumerate(dec.layers):
            out.append(layer.encoder_attn.kv(
                params["decoder"]["model"]["decoder"]["layers"][str(i)]["encoder_attn"],
                encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        dec = self.decoder.model.decoder
        return dec(params["decoder"]["model"]["decoder"], input_ids, cross_kv, cache,
                   cache_position, decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        return self.decoder.compute_logits(params["decoder"], hidden)

    def init_decoder_cache(self, batch_size, max_len, dtype=None):
        return self.decoder.init_decoder_cache(batch_size, max_len, dtype)

    def __call__(self, params, pixel_values=None, decoder_input_ids=None,
                 decoder_attention_mask=None, encoder_outputs=None, past_key_values=None,
                 cache_position=0, labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, pixel_values)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            if start is None:
                start = self.config.decoder.decoder_start_token_id
            pad = self.config.pad_token_id
            if pad is None:
                pad = self.config.decoder.pad_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]], axis=1)
            decoder_input_ids = jnp.where(decoder_input_ids == -100, pad, decoder_input_ids)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, None)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.decoder.vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)

    def generate(self, params=None, **kwargs):
        # decoder generation knobs live on the nested decoder config
        gen = kwargs
        if gen.get("decoder_start_token_id") is None and self.config.decoder_start_token_id is None:
            kwargs["decoder_start_token_id"] = self.config.decoder.decoder_start_token_id
        if self.config.eos_token_id is None and kwargs.get("eos_token_id") is None:
            kwargs["eos_token_id"] = self.config.decoder.eos_token_id
        if self.config.pad_token_id is None and kwargs.get("pad_token_id") is None:
            kwargs["pad_token_id"] = self.config.decoder.pad_token_id
        return super().generate(params, **kwargs)
