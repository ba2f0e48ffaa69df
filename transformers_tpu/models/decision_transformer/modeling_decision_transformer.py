"""Decision Transformer (reference models/decision_transformer/modeling_decision_transformer.py).

Offline-RL GPT-2: per-modality embeddings (return, state, action) each
offset by a learned timestep embedding, interleaved as (R_t, s_t, a_t)
triples into one causal sequence (:536-640), run through a GPT-2 core
(``encoder``), and un-interleaved into prediction heads — action from the
state stream, state/return from the action stream.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from ...configuration_utils import PretrainedConfig
from ...core.module import Embedding, LayerNorm, Linear, Module, normal_init
from ...modeling_utils import PreTrainedModel
from ...utils.generic import ModelOutput
from ..gpt2.configuration_gpt2 import GPT2Config
from ..gpt2.modeling_gpt2 import GPT2Model


class DecisionTransformerConfig(PretrainedConfig):
    model_type = "decision_transformer"

    def __init__(self, state_dim=17, act_dim=4, hidden_size=128, max_ep_len=4096,
                 action_tanh=True, vocab_size=1, n_positions=1024, n_layer=3,
                 n_head=1, n_inner=None, activation_function="relu",
                 resid_pdrop=0.1, embd_pdrop=0.1, attn_pdrop=0.1,
                 layer_norm_epsilon=1e-5, initializer_range=0.02,
                 scale_attn_weights=True, use_cache=True,
                 scale_attn_by_inverse_layer_idx=False, reorder_and_upcast_attn=False,
                 bos_token_id=50256, eos_token_id=50256, **kwargs):
        self.state_dim = state_dim
        self.act_dim = act_dim
        self.hidden_size = hidden_size
        self.max_ep_len = max_ep_len
        self.action_tanh = action_tanh
        self.vocab_size = vocab_size
        self.n_positions = n_positions
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_inner = n_inner
        self.n_embd = hidden_size
        self.activation_function = activation_function
        self.resid_pdrop = resid_pdrop
        self.embd_pdrop = embd_pdrop
        self.attn_pdrop = attn_pdrop
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        self.scale_attn_weights = scale_attn_weights
        self.use_cache = use_cache
        self.scale_attn_by_inverse_layer_idx = scale_attn_by_inverse_layer_idx
        self.reorder_and_upcast_attn = reorder_and_upcast_attn
        super().__init__(bos_token_id=bos_token_id, eos_token_id=eos_token_id, **kwargs)


@dataclass
class DecisionTransformerOutput(ModelOutput):
    state_preds: Any = None
    action_preds: Any = None
    return_preds: Any = None
    last_hidden_state: Any = None


class DecisionTransformerPreTrainedModel(PreTrainedModel):
    config_class = DecisionTransformerConfig
    base_model_prefix = "decision_transformer"


class DecisionTransformerModel(DecisionTransformerPreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        lkw = dict(**kw, kernel_init=normal_init(config.initializer_range))
        self.encoder = GPT2Model(config, **kw)
        self.embed_timestep = Embedding(config.max_ep_len, config.hidden_size,
                                        embedding_init=normal_init(config.initializer_range), **kw)
        self.embed_return = Linear(1, config.hidden_size, True, **lkw)
        self.embed_state = Linear(config.state_dim, config.hidden_size, True, **lkw)
        self.embed_action = Linear(config.act_dim, config.hidden_size, True, **lkw)
        self.embed_ln = LayerNorm(config.hidden_size, 1e-5, **kw)
        self.predict_state = Linear(config.hidden_size, config.state_dim, True, **lkw)
        predict_action = Module(**kw)
        setattr(predict_action, "0", Linear(config.hidden_size, config.act_dim, True, **lkw))
        self.predict_action = predict_action
        self.predict_return = Linear(config.hidden_size, 1, True, **lkw)

    def __call__(self, params, states=None, actions=None, rewards=None,
                 returns_to_go=None, timesteps=None, attention_mask=None, **kwargs):
        b, s = states.shape[:2]
        if attention_mask is None:
            attention_mask = jnp.ones((b, s), jnp.int32)
        time_emb = self.embed_timestep(params["embed_timestep"], timesteps)
        state_emb = self.embed_state(params["embed_state"], states) + time_emb
        action_emb = self.embed_action(params["embed_action"], actions) + time_emb
        return_emb = self.embed_return(params["embed_return"], returns_to_go) + time_emb
        stacked = jnp.stack([return_emb, state_emb, action_emb], axis=1)  # [B,3,T,H]
        stacked = stacked.transpose(0, 2, 1, 3).reshape(b, 3 * s, -1)
        stacked = self.embed_ln(params["embed_ln"], stacked)
        stacked_mask = jnp.stack([attention_mask] * 3, axis=1).transpose(0, 2, 1).reshape(b, 3 * s)
        # reference passes all-zero position ids — wpe contributes only its
        # row 0 (time embeddings carry the real positions)
        out = self.encoder(params["encoder"], inputs_embeds=stacked,
                           attention_mask=stacked_mask,
                           position_ids=jnp.zeros((b, 3 * s), jnp.int32))
        x = out.last_hidden_state.reshape(b, s, 3, -1).transpose(0, 2, 1, 3)
        return_preds = self.predict_return(params["predict_return"], x[:, 2])
        state_preds = self.predict_state(params["predict_state"], x[:, 2])
        action_preds = getattr(self.predict_action, "0")(
            params["predict_action"]["0"], x[:, 1])
        if self.config.action_tanh:
            action_preds = jnp.tanh(action_preds)
        return DecisionTransformerOutput(
            state_preds=state_preds, action_preds=action_preds,
            return_preds=return_preds, last_hidden_state=out.last_hidden_state)
