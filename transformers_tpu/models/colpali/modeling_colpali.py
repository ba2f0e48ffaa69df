"""ColPali, TPU-native (reference
src/transformers/models/colpali/modeling_colpali.py).

Late-interaction document retriever: a PaliGemma backbone's last hidden
states are projected to ``embedding_dim`` multi-vectors, L2-normalized, and
masked by the attention mask (:109-147). MaxSim scoring happens outside the
model.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...core.module import Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..paligemma.modeling_paligemma import PaliGemmaModel
from .configuration_colpali import ColPaliConfig


@dataclass
class ColPaliForRetrievalOutput(ModelOutput):
    embeddings: Any = None
    hidden_states: Any = None


class ColPaliForRetrieval(PreTrainedModel):
    config_class = ColPaliConfig
    base_model_prefix = "vlm"
    main_input_name = "input_ids"

    def __init__(self, config: ColPaliConfig, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vlm = PaliGemmaModel(config.vlm_config, **kw)
        self.embedding_proj_layer = Linear(
            config.vlm_config.text_config.hidden_size, config.embedding_dim,
            True, kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 attention_mask=None, output_hidden_states=False,
                 **kwargs) -> ColPaliForRetrievalOutput:
        out = self.vlm(params["vlm"], input_ids, pixel_values, attention_mask,
                       output_hidden_states=output_hidden_states)
        emb = self.embedding_proj_layer(params["embedding_proj_layer"],
                                        out.last_hidden_state)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        if attention_mask is not None:
            emb = emb * attention_mask[..., None].astype(emb.dtype)
        return ColPaliForRetrievalOutput(embeddings=emb,
                                         hidden_states=out.hidden_states)
