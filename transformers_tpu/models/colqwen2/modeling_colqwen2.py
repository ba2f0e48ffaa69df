"""ColQwen2, TPU-native (reference
src/transformers/models/colqwen2/modeling_colqwen2.py).

Late-interaction retriever over a Qwen2-VL backbone. The processor pads
per-image patch sequences to a rectangle; the model unpads via
``grid[:, 1] * grid[:, 2]`` offsets (:129-135, host-side since grids are
static), scatters visual features at image tokens, and projects the last
hidden states to L2-normalized ``embedding_dim`` multi-vectors.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp
import numpy as np

from ...core.module import Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..qwen2_vl.modeling_qwen2_vl import Qwen2VLModel, get_rope_index
from .configuration_colqwen2 import ColQwen2Config


@dataclass
class ColQwen2ForRetrievalOutput(ModelOutput):
    embeddings: Any = None
    hidden_states: Any = None


class ColQwen2ForRetrieval(PreTrainedModel):
    config_class = ColQwen2Config
    base_model_prefix = "vlm"
    main_input_name = "input_ids"
    # hub layout nests the backbone as vlm.model.*; our vlm IS the bare model
    from ...core.loading import WeightRule as _WR

    _weight_rules = (
        _WR(pattern=r"^vlm\.model\.", rename="vlm.",
            save_pattern=r"^vlm\.(?=language_model|visual)",
            save_rename="vlm.model."),
    )
    _keys_to_ignore_on_load_unexpected = (r"^vlm\.lm_head\.",)

    def __init__(self, config: ColQwen2Config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.vlm = Qwen2VLModel(config.vlm_config, **kw)
        self.embedding_proj_layer = Linear(
            config.vlm_config.text_config.hidden_size, config.embedding_dim,
            True, kernel_init=normal_init(0.02), **kw)

    def __call__(self, params, input_ids=None, pixel_values=None,
                 image_grid_thw=None, attention_mask=None,
                 output_hidden_states=False, **kwargs) -> ColQwen2ForRetrievalOutput:
        if pixel_values is not None and image_grid_thw is not None and pixel_values.ndim == 3:
            # unpad the per-image rectangles (reference :129-135); grids are
            # host ints so the gather is static-shape
            grid = np.asarray(image_grid_thw)
            offsets = grid[:, 1] * grid[:, 2]
            rows = []
            for i, n in enumerate(offsets):
                rows.append(pixel_values[i, :int(n)])
            pixel_values = jnp.concatenate(rows, axis=0)
        inputs_embeds = self.vlm.embed_with_images(params["vlm"], input_ids,
                                                   pixel_values, image_grid_thw)
        position_ids = None
        if input_ids is not None:
            grid = None if image_grid_thw is None else np.asarray(image_grid_thw)
            mask = None if attention_mask is None else np.asarray(attention_mask)
            pos, _ = get_rope_index(self.config.vlm_config, np.asarray(input_ids),
                                    grid, None, mask)
            position_ids = jnp.asarray(pos)
        out = self.vlm.language_model(
            params["vlm"]["language_model"], None, attention_mask, position_ids,
            None, 0, inputs_embeds, output_hidden_states)
        emb = self.embedding_proj_layer(params["embedding_proj_layer"],
                                        out.last_hidden_state)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        if attention_mask is not None:
            emb = emb * attention_mask[..., None].astype(emb.dtype)
        return ColQwen2ForRetrievalOutput(embeddings=emb,
                                          hidden_states=out.hidden_states)
