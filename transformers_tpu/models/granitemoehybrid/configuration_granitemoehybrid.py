"""GraniteMoeHybrid config (reference
src/transformers/models/granitemoehybrid/configuration_granitemoehybrid.py)."""

from __future__ import annotations

from ..granitemoe.configuration_granitemoe import GraniteMoeConfig


class GraniteMoeHybridConfig(GraniteMoeConfig):
    model_type = "granitemoehybrid"

    def __init__(self, shared_intermediate_size=1024, position_embedding_type=None,
                 layer_types=None, mamba_n_heads=128, mamba_d_head=64, mamba_n_groups=1,
                 mamba_d_state=256, mamba_d_conv=4, mamba_expand=2, mamba_chunk_size=256,
                 mamba_conv_bias=True, mamba_proj_bias=False, **kwargs):
        super().__init__(**kwargs)
        self.shared_intermediate_size = shared_intermediate_size
        self.position_embedding_type = position_embedding_type
        self.layer_types = layer_types
        self.mamba_n_heads = mamba_n_heads
        inter = int(mamba_expand * self.hidden_size)
        self.mamba_d_head = inter // mamba_n_heads if mamba_d_head == "auto" else mamba_d_head
        self.mamba_n_groups = mamba_n_groups
        self.mamba_d_state = mamba_d_state
        self.mamba_d_conv = mamba_d_conv
        self.mamba_expand = mamba_expand
        self.mamba_chunk_size = mamba_chunk_size
        self.mamba_conv_bias = mamba_conv_bias
        self.mamba_proj_bias = mamba_proj_bias

    @property
    def layers_block_type(self):
        return self.layer_types or ["mamba"] * self.num_hidden_layers
