"""FNet (reference src/transformers/models/fnet/modeling_fnet.py).

Attention-free encoder: token mixing is the REAL part of a 2-D Fourier
transform over (sequence, hidden) — ``torch.fft.fftn(x, dim=(1, 2)).real`` —
followed by the BERT post-LN FF block. Embeddings add a projection after the
LayerNorm. FNet ignores the attention mask entirely (the reference does
too — the FFT mixes every position including pads). Irony appreciated:
FNet was designed FOR TPUs; here it runs on one again."""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_outputs import BaseModelOutputWithPooling, MaskedLMOutput
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..bert.modeling_bert import BertIntermediate, BertOutput, BertPooler, _BertOnlyMLMHead
from .configuration_fnet import FNetConfig


class FNetEmbeddings(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  embedding_init=normal_init(config.initializer_range))
        self.word_embeddings = Embedding(config.vocab_size, config.hidden_size, **kw)
        self.position_embeddings = Embedding(config.max_position_embeddings, config.hidden_size, **kw)
        self.token_type_embeddings = Embedding(config.type_vocab_size, config.hidden_size, **kw)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)
        self.projection = Linear(config.hidden_size, config.hidden_size, True, dtype=dtype,
                                 param_dtype=param_dtype,
                                 kernel_init=normal_init(config.initializer_range))

    def __call__(self, params, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None):
        if inputs_embeds is None:
            inputs_embeds = self.word_embeddings(params["word_embeddings"], input_ids)
        s = inputs_embeds.shape[1]
        if position_ids is None:
            position_ids = jnp.arange(s, dtype=jnp.int32)[None, :]
        if token_type_ids is None:
            token_type_ids = jnp.zeros(inputs_embeds.shape[:2], jnp.int32)
        h = (inputs_embeds
             + self.position_embeddings(params["position_embeddings"], position_ids)
             + self.token_type_embeddings(params["token_type_embeddings"], token_type_ids))
        h = self.LayerNorm(params["LayerNorm"], h)
        return self.projection(params["projection"], h)


class FNetFourierOutput(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.LayerNorm = LayerNorm(config.hidden_size, config.layer_norm_eps,
                                   dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, residual):
        return self.LayerNorm(params["LayerNorm"], hidden + residual)


class FNetFourierTransform(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.output = FNetFourierOutput(config, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden):
        mixed = jnp.fft.fft2(hidden.astype(jnp.complex64), axes=(1, 2)).real
        return self.output(params["output"], mixed.astype(hidden.dtype), hidden)


class FNetLayer(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.fourier = FNetFourierTransform(config, **kw)
        self.intermediate = BertIntermediate(config, **kw)
        self.output = BertOutput(config, **kw)

    def __call__(self, params, hidden):
        hidden = self.fourier(params["fourier"], hidden)
        inner = self.intermediate(params["intermediate"], hidden)
        return self.output(params["output"], inner, hidden)


class FNetModel(Module):
    def __init__(self, config, *, dtype, param_dtype, add_pooling_layer=True):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = FNetEmbeddings(config, **kw)
        self.encoder = _FNetEncoder(config, **kw)
        self.pooler = BertPooler(config, **kw) if add_pooling_layer else None

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, output_hidden_states=False,
                 **kwargs) -> BaseModelOutputWithPooling:
        hidden = self.embeddings(params["embeddings"], input_ids, token_type_ids,
                                 position_ids, inputs_embeds)
        hidden, all_hidden = self.encoder(params["encoder"], hidden, output_hidden_states)
        pooled = None
        if self.pooler is not None and "pooler" in params:
            pooled = self.pooler(params["pooler"], hidden)
        return BaseModelOutputWithPooling(
            last_hidden_state=hidden, pooler_output=pooled,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None)


class _FNetEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.layer = [FNetLayer(config, dtype=dtype, param_dtype=param_dtype)
                      for _ in range(config.num_hidden_layers)]

    def __call__(self, params, hidden, output_hidden_states=False):
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layer):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden = layer(params["layer"][str(i)], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        return hidden, all_hidden


class FNetPreTrainedModel(PreTrainedModel):
    config_class = FNetConfig
    base_model_prefix = "fnet"


class FNetModelStandalone(FNetPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.fnet = FNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.fnet(params["fnet"], *args, **kwargs)


class FNetForMaskedLM(FNetPreTrainedModel):
    _keys_to_ignore_on_load_unexpected = (r"cls\.predictions\.decoder\.", r"\.position_ids$")

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        # reference FNetForMaskedLM keeps the pooler
        self.fnet = FNetModel(config, dtype=self.dtype, param_dtype=self.param_dtype)
        self.cls = _BertOnlyMLMHead(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def get_input_embedding_path(self):
        return "fnet.embeddings.word_embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def __call__(self, params, input_ids=None, attention_mask=None, token_type_ids=None,
                 position_ids=None, inputs_embeds=None, labels=None,
                 output_hidden_states=False, **kwargs) -> MaskedLMOutput:
        outputs = self.fnet(params["fnet"], input_ids, attention_mask, token_type_ids,
                            position_ids, inputs_embeds, output_hidden_states)
        table = params["fnet"]["embeddings"]["word_embeddings"]["weight"]
        logits = self.cls(params["cls"], outputs.last_hidden_state, table)
        loss = None
        if labels is not None:
            from ...loss import for_masked_lm_loss

            loss = for_masked_lm_loss(logits, labels, self.config.vocab_size)
        return MaskedLMOutput(loss=loss, logits=logits, hidden_states=outputs.hidden_states)
