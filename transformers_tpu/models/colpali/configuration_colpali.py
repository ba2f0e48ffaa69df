"""ColPali config (reference
src/transformers/models/colpali/configuration_colpali.py)."""

from __future__ import annotations

from ...configuration_utils import PretrainedConfig


class ColPaliConfig(PretrainedConfig):
    model_type = "colpali"
    sub_configs = {"vlm_config": "auto"}

    def __init__(self, vlm_config=None, text_config=None, embedding_dim=128,
                 **kwargs):
        from ..auto.configuration_auto import AutoConfig

        if isinstance(vlm_config, dict):
            vlm_config = AutoConfig.for_model_type(
                vlm_config.get("model_type", "paligemma"),
                **{k: v for k, v in vlm_config.items() if k != "model_type"})
        elif vlm_config is None:
            vlm_config = AutoConfig.for_model_type("paligemma")
        self.vlm_config = vlm_config
        self.text_config = getattr(vlm_config, "text_config", text_config)
        self.embedding_dim = embedding_dim
        super().__init__(**kwargs)
