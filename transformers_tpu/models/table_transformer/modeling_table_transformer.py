"""Table Transformer, TPU-native (reference
src/transformers/models/table_transformer/modeling_table_transformer.py).

DETR re-trained for table detection / structure recognition; the only
architectural delta vs our DETR is PRE-norm encoder/decoder layers plus a
final encoder layernorm (the decoder final layernorm already exists in
DETR).  Everything else — ResNet conv encoder, sine positions, learned
object queries, detection heads — is reused.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...core.module import LayerNorm, Module
from ..detr.configuration_detr import DetrConfig
from ..detr.modeling_detr import (DetrDecoder, DetrDecoderLayer, DetrEncoder,
                                  DetrEncoderLayer, DetrForObjectDetection,
                                  DetrModel, DetrModelStandalone,
                                  DetrPreTrainedModel)


class TableTransformerConfig(DetrConfig):
    model_type = "table-transformer"


class TableTransformerEncoderLayer(DetrEncoderLayer):
    """Pre-norm (reference TableTransformerEncoderLayer)."""

    def __call__(self, params, hidden, pos, kv_valid):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h = self.self_attn(params["self_attn"], h, q_pos=pos, k_pos=pos,
                           kv_valid=kv_valid)
        hidden = hidden + h
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return hidden + h


class TableTransformerDecoderLayer(DetrDecoderLayer):
    """Pre-norm (reference TableTransformerDecoderLayer)."""

    def __call__(self, params, hidden, query_pos, enc_hidden, enc_pos, enc_valid):
        h = self.self_attn_layer_norm(params["self_attn_layer_norm"], hidden)
        h = self.self_attn(params["self_attn"], h, q_pos=query_pos, k_pos=query_pos)
        hidden = hidden + h
        h = self.encoder_attn_layer_norm(params["encoder_attn_layer_norm"], hidden)
        h = self.encoder_attn(params["encoder_attn"], h, kv=enc_hidden,
                              q_pos=query_pos, k_pos=enc_pos, kv_valid=enc_valid)
        hidden = hidden + h
        h = self.final_layer_norm(params["final_layer_norm"], hidden)
        h = self.fc2(params["fc2"], self.act(self.fc1(params["fc1"], h)))
        return hidden + h


class TableTransformerEncoder(Module):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.layers = [TableTransformerEncoderLayer(config, **kw)
                       for _ in range(config.encoder_layers)]
        self.layernorm = LayerNorm(config.d_model, **kw)

    def __call__(self, params, hidden, pos, kv_valid):
        for i, layer in enumerate(self.layers):
            hidden = layer(params["layers"][str(i)], hidden, pos, kv_valid)
        return self.layernorm(params["layernorm"], hidden)


class TableTransformerDecoder(DetrDecoder):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.layers = [TableTransformerDecoderLayer(config, dtype=dtype,
                                                    param_dtype=param_dtype)
                       for _ in range(config.decoder_layers)]


class TableTransformerModel(DetrModel):
    def __init__(self, config, *, dtype, param_dtype):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.encoder = TableTransformerEncoder(config, **kw)
        self.decoder = TableTransformerDecoder(config, **kw)


class TableTransformerPreTrainedModel(DetrPreTrainedModel):
    config_class = TableTransformerConfig


class TableTransformerModelStandalone(TableTransformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = TableTransformerModel(config, dtype=self.dtype,
                                           param_dtype=self.param_dtype)

    def __call__(self, params, pixel_values=None, pixel_mask=None, **kwargs):
        return self.model(params["model"], pixel_values, pixel_mask)


class TableTransformerForObjectDetection(DetrForObjectDetection):
    config_class = TableTransformerConfig

    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.model = TableTransformerModel(config, dtype=self.dtype,
                                           param_dtype=self.param_dtype)
