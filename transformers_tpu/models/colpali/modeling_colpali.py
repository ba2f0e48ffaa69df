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
    # hub checkpoints nest the backbone as vlm.model.* (the full PaliGemma
    # ForConditionalGeneration); our vlm IS the bare model
    from ...core.loading import WeightRule as _WR

    _weight_rules = (
        # hub layout (legacy): vlm.language_model is the full ForCausalLM
        _WR(pattern=r"^vlm\.language_model\.model\.",
            rename="vlm.language_model.",
            save_pattern=r"^vlm\.language_model\.",
            save_rename="vlm.language_model.model."),
        # composed layout: vlm.model.{language_model,vision_tower,...}
        _WR(pattern=r"^vlm\.model\.", rename="vlm."),
    )
    _keys_to_ignore_on_load_unexpected = (r"^vlm\.(language_model\.)?lm_head\.",)

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
