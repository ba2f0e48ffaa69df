"""ColQwen2 config (reference
src/transformers/models/colqwen2/configuration_colqwen2.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ColQwen2Config(PretrainedConfig):
    model_type = "colqwen2"
    sub_configs = {"vlm_config": "auto"}

    def __init__(self, vlm_config=None, embedding_dim=128, **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(vlm_config, dict):
            vlm_config = AutoConfig.for_model_type(
                vlm_config.get("model_type", "qwen2_vl"),
                **{k: v for k, v in vlm_config.items() if k != "model_type"})
        elif vlm_config is None:
            vlm_config = AutoConfig.for_model_type("qwen2_vl")
        self.vlm_config = vlm_config
        self.embedding_dim = embedding_dim
        super().__init__(**kwargs)
