"""FSMT — FairSeq MT (reference models/fsmt/modeling_fsmt.py).

BART-style post-LN encoder-decoder with fairseq conventions: SEPARATE
src/tgt vocabularies and embeddings (:336, :528), fairseq sinusoidal
positions sized ``max_pos + pad + 1`` with the zeroed padding row and
pad-aware position ids, sqrt(d) embedding scaling, and logits through
``decoder.output_projection`` tied to the target embeddings (:534, :804).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ...cache_utils import StaticKVCache, init_static_cache
from ...configuration_utils import PretrainedConfig
from ...core.loading import WeightRule
from ...core.module import Embedding, Module, normal_init
from ...generation.seq2seq import EncoderDecoderGenerationMixin
from ...modeling_outputs import BaseModelOutput, Seq2SeqLMOutput
from ...modeling_utils import PreTrainedModel
from ..bart.modeling_bart import BartDecoder, BartEncoder
from ..m2m_100.modeling_m2m_100 import fairseq_sinusoid_table


class FSMTConfig(PretrainedConfig):
    model_type = "fsmt"

    def __init__(self, langs=("en", "de"), src_vocab_size=42024, tgt_vocab_size=42024,
                 activation_function="relu", d_model=1024, max_length=200,
                 max_position_embeddings=1024, encoder_ffn_dim=4096, encoder_layers=12,
                 encoder_attention_heads=16, encoder_layerdrop=0.0,
                 decoder_ffn_dim=4096, decoder_layers=12, decoder_attention_heads=16,
                 decoder_layerdrop=0.0, attention_dropout=0.0, dropout=0.1,
                 activation_dropout=0.0, init_std=0.02, decoder_start_token_id=2,
                 is_encoder_decoder=True, scale_embedding=True,
                 tie_word_embeddings=False, num_beams=5, length_penalty=1.0,
                 early_stopping=False, use_cache=True, pad_token_id=1,
                 bos_token_id=0, eos_token_id=2, forced_eos_token_id=2, **kwargs):
        self.langs = list(langs)
        self.src_vocab_size = src_vocab_size
        self.tgt_vocab_size = tgt_vocab_size
        self.vocab_size = tgt_vocab_size
        self.activation_function = activation_function
        self.d_model = d_model
        self.max_position_embeddings = max_position_embeddings
        self.encoder_ffn_dim = encoder_ffn_dim
        self.encoder_layers = encoder_layers
        self.encoder_attention_heads = encoder_attention_heads
        self.encoder_layerdrop = encoder_layerdrop
        self.decoder_ffn_dim = decoder_ffn_dim
        self.decoder_layers = decoder_layers
        self.decoder_attention_heads = decoder_attention_heads
        self.decoder_layerdrop = decoder_layerdrop
        self.attention_dropout = attention_dropout
        self.dropout = dropout
        self.activation_dropout = activation_dropout
        self.init_std = init_std
        self.scale_embedding = scale_embedding
        super().__init__(pad_token_id=pad_token_id, bos_token_id=bos_token_id,
                         eos_token_id=eos_token_id,
                         decoder_start_token_id=decoder_start_token_id,
                         is_encoder_decoder=is_encoder_decoder,
                         tie_word_embeddings=tie_word_embeddings,
                         forced_eos_token_id=forced_eos_token_id,
                         max_length=max_length, num_beams=num_beams,
                         length_penalty=length_penalty, early_stopping=early_stopping,
                         **kwargs)


class FSMTSinusoidalPositions(Module):
    """fairseq table of size max_pos + pad + 1, zero row at pad (:79-217)."""

    def __init__(self, num_positions, dim, padding_idx, **kw):
        kw.pop("embedding_init", None)
        super().__init__(**kw)
        self.table = fairseq_sinusoid_table(num_positions, dim, padding_idx)

    def init(self, rng):
        return {}

    def __call__(self, params, positions):
        return jnp.take(jnp.asarray(self.table, self.dtype), positions, axis=0)


class FSMTEncoder(BartEncoder):
    use_layernorm_embedding = False
    use_final_norm = False

    def make_positions(self, config, **kw):
        return FSMTSinusoidalPositions(
            config.max_position_embeddings + config.pad_token_id + 1, config.d_model,
            config.pad_token_id, **kw)

    def encoder_positions(self, b, s, attention_mask):
        pad = self.config.pad_token_id
        if attention_mask is None:
            return jnp.arange(1, s + 1, dtype=jnp.int32)[None, :] + pad
        mask = attention_mask.astype(jnp.int32)
        return jnp.cumsum(mask, axis=-1) * mask + pad


class FSMTDecoder(BartDecoder):
    use_layernorm_embedding = False
    use_final_norm = False

    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.pos_start = config.pad_token_id + 1

    def make_positions(self, config, **kw):
        return FSMTSinusoidalPositions(
            config.max_position_embeddings + config.pad_token_id + 1, config.d_model,
            config.pad_token_id, **kw)


class FSMTPreTrainedModel(PreTrainedModel):
    config_class = FSMTConfig
    base_model_prefix = "model"
    _keys_to_ignore_on_load_unexpected = (r"\.embed_positions\.",)


class FSMTForConditionalGeneration(FSMTPreTrainedModel, EncoderDecoderGenerationMixin):
    # safetensors keeps only the tie-group canonical ``output_projection``;
    # restore it to the embedding slot (reference _tied_weights_keys :802-806)
    _weight_rules = (
        WeightRule(pattern=r"^model\.decoder\.output_projection\.weight$",
                   rename="model.decoder.embed_tokens.weight"),
    )

    def __init__(self, config: FSMTConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        model = Module(**kw)
        model.encoder = FSMTEncoder(config, **kw)
        model.encoder.embed_tokens = Embedding(
            config.src_vocab_size, config.d_model,
            embedding_init=normal_init(config.init_std), **kw)
        model.decoder = FSMTDecoder(config, **kw)
        model.decoder.embed_tokens = Embedding(
            config.tgt_vocab_size, config.d_model,
            embedding_init=normal_init(config.init_std), **kw)
        self.model = model

    def get_input_embedding_path(self):
        return "model.encoder.embed_tokens.weight"

    def encode(self, params, input_ids, attention_mask=None) -> BaseModelOutput:
        enc = params["model"]["encoder"]
        embeds = self.model.encoder.embed_tokens(enc["embed_tokens"], input_ids)
        hidden = self.model.encoder(enc, embeds, attention_mask)
        return BaseModelOutput(last_hidden_state=hidden)

    def precompute_cross_kv(self, params, encoder_hidden):
        out = []
        for i, layer in enumerate(self.model.decoder.layers):
            out.append(layer.encoder_attn.kv(
                params["model"]["decoder"]["layers"][str(i)]["encoder_attn"],
                encoder_hidden))
        return tuple(out)

    def decode_step(self, params, input_ids, cross_kv, cache, cache_position,
                    decoder_mask, encoder_mask):
        dec = params["model"]["decoder"]
        embeds = self.model.decoder.embed_tokens(dec["embed_tokens"], input_ids)
        return self.model.decoder(dec, embeds, cross_kv, cache, cache_position,
                                  decoder_mask, encoder_mask)

    def compute_logits(self, params, hidden):
        table = params["model"]["decoder"]["embed_tokens"]["weight"]
        return jnp.dot(hidden.astype(self.dtype), table.astype(self.dtype).T)

    def init_decoder_cache(self, batch_size, max_len, dtype=None) -> StaticKVCache:
        c = self.config
        return init_static_cache(num_layers=c.decoder_layers, batch_size=batch_size,
                                 max_len=max_len, num_kv_heads=c.decoder_attention_heads,
                                 head_dim=c.d_model // c.decoder_attention_heads,
                                 dtype=dtype or self.dtype)

    def __call__(self, params, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 encoder_outputs=None, past_key_values=None, cache_position=0,
                 labels=None, **kwargs) -> Seq2SeqLMOutput:
        if encoder_outputs is None:
            encoder_outputs = self.encode(params, input_ids, attention_mask)
        if decoder_input_ids is None and labels is not None:
            start = self.config.decoder_start_token_id
            decoder_input_ids = jnp.concatenate(
                [jnp.full((labels.shape[0], 1), start, labels.dtype), labels[:, :-1]],
                axis=1)
        cross_kv = self.precompute_cross_kv(params, encoder_outputs.last_hidden_state)
        hidden, cache = self.decode_step(params, decoder_input_ids, cross_kv,
                                         past_key_values, cache_position,
                                         decoder_attention_mask, attention_mask)
        logits = self.compute_logits(params, hidden)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.tgt_vocab_size)
        return Seq2SeqLMOutput(loss=loss, logits=logits, past_key_values=cache,
                               encoder_last_hidden_state=encoder_outputs.last_hidden_state)


class FSMTModelStandalone(FSMTForConditionalGeneration):
    pass
