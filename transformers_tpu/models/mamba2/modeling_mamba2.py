"""Mamba2 (state space duality) decoder, TPU-native.

Semantics match reference src/transformers/models/mamba2/modeling_mamba2.py:
one in_proj producing [gate | x·B·C | dt] (:403,:515), depthwise causal conv
over the packed x·B·C channels (:392-401), per-head scalar decay
A = -exp(A_log) (:459) with dt = softplus(dt + dt_bias) clamped to
time_step_limit (:271-276), grouped B/C broadcast to heads (:279-280),
SSD recurrence  h_t = exp(dt_t·A_h)·h_{t-1} + dt_t·(B_t ⊗ x_t),
y_t = C_t·h_t + D_h·x_t  (:254-345 `mamba2_chunk_scan`), gated RMSNorm
before out_proj (:106-121), residual blocks (:611-637), tied lm_head (:823).
Checkpoint layout ``backbone.{embeddings,layers.N.{norm,mixer.{in_proj,
conv1d,dt_bias,A_log,D,norm,out_proj}},norm_f}``.

TPU-native choices (vs the reference's CUDA mamba_ssm/causal_conv1d kernels):
- the sequence scan is the **chunked SSD algorithm** (the same factorization
  the Triton kernel uses, but expressed as dense einsums): intra-chunk work
  is attention-shaped matmuls C·Bᵀ∘L that run on the MXU, and only the tiny
  inter-chunk state recurrence (num_chunks steps over [B,H,P,N]) is a
  `lax.scan`. Memory is O(B·L·c·H) + O(B·(L/c)·H·P·N) instead of the naive
  O(B·L·H·P·N) materialized scan;
- the depthwise conv is one `lax.conv_general_dilated` with
  feature_group_count = conv channels;
- decode is a single recurrent step over a (conv window, ssm state) cache —
  O(H·P·N) work per token, no sequence dimension.
"""

from __future__ import annotations

import math
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp

from ...core.module import Embedding, Linear, Module, RMSNorm, normal_init
from ...generation.utils import GenerationMixin
from ...modeling_outputs import BaseModelOutputWithPast, CausalLMOutputWithPast
from ...modeling_utils import PreTrainedModel
from ...ops.activations import get_activation
from ..mamba.modeling_mamba import MambaCache
from .configuration_mamba2 import Mamba2Config


def ssd_chunk_scan(x, dt, A, B, C, D, chunk_size, initial_state=None):
    """Chunked state-space-duality scan (reference mamba2_chunk_scan :254).

    x [B,L,H,P]; dt [B,L,H] (already softplus'd + clamped); A [H];
    B/C [B,L,H,N] (group-broadcast to heads); D [H]. All float32.
    Returns (y [B,L,H,P], final_state [B,H,P,N]). Zero right-padding to a
    chunk multiple is exact: padded dt=0 ⇒ decay 1 and contribution 0.
    """
    b, L, H, P = x.shape
    N = B.shape[-1]
    c = min(chunk_size, max(L, 1))
    pad = (-L) % c
    nc = (L + pad) // c

    def chunked(t):
        t = jnp.pad(t, [(0, 0), (0, pad)] + [(0, 0)] * (t.ndim - 2))
        return t.reshape(b, nc, c, *t.shape[2:])

    xd = chunked(x * dt[..., None])                       # [b,nc,c,H,P] discretized x
    dA = chunked(dt) * A[None, None, None]                # [b,nc,c,H]
    Bc, Cc = chunked(B), chunked(C)                       # [b,nc,c,H,N]
    acs = jnp.moveaxis(jnp.cumsum(dA, axis=2), 3, 2)      # [b,nc,H,c]

    # intra-chunk (diagonal blocks): attention-shaped C·Bᵀ masked by the
    # decay matrix L[i,j] = exp(sum_{j<k<=i} dA_k), lower-triangular
    seg = acs[..., :, None] - acs[..., None, :]           # [b,nc,H,c,c]
    lmat = jnp.where(jnp.tril(jnp.ones((c, c), bool)), jnp.exp(seg), 0.0)
    gmat = jnp.einsum("bkihn,bkjhn->bkhij", Cc, Bc)
    y_diag = jnp.einsum("bkhij,bkjhp->bkihp", gmat * lmat, xd)

    # per-chunk final states: sum_j exp(acs_last - acs_j) · B_j ⊗ xd_j
    decay_states = jnp.exp(acs[..., -1:] - acs)           # [b,nc,H,c]
    states = jnp.einsum("bkjhn,bkhj,bkjhp->bkhpn", Bc, decay_states, xd)

    # inter-chunk recurrence (the only sequential part: nc steps)
    chunk_decay = jnp.exp(acs[..., -1])                   # [b,nc,H]
    s0 = (initial_state.astype(x.dtype) if initial_state is not None
          else jnp.zeros((b, H, P, N), x.dtype))

    def step(s_prev, inp):
        dec, st = inp
        return dec[..., None, None] * s_prev + st, s_prev

    final_state, prevs = jax.lax.scan(
        step, s0, (jnp.moveaxis(chunk_decay, 1, 0), jnp.moveaxis(states, 1, 0)))
    prevs = jnp.moveaxis(prevs, 0, 1)                     # state entering each chunk

    # off-diagonal contribution: C_i · (decayed inter-chunk state)
    y_off = jnp.einsum("bkihn,bkhpn,bkhi->bkihp", Cc, prevs, jnp.exp(acs))
    y = (y_diag + y_off).reshape(b, L + pad, H, P)[:, :L] + D[None, None, :, None] * x
    return y, final_state


def mamba2_view_from_hybrid(config):
    """Adapter mapping Bamba-style ``mamba_*`` config fields (reference
    configuration_bamba.py, also GraniteMoeHybrid/NemotronH) onto the
    Mamba2Config attribute names `Mamba2Mixer` reads, so hybrid decoders can
    instantiate the mixer directly."""
    from types import SimpleNamespace

    inter = int(config.mamba_expand * config.hidden_size)
    head_dim = config.mamba_d_head
    if head_dim == "auto":
        head_dim = inter // config.mamba_n_heads
    limit = getattr(config, "time_step_limit", None)
    return SimpleNamespace(
        hidden_size=config.hidden_size,
        num_heads=config.mamba_n_heads,
        head_dim=head_dim,
        n_groups=config.mamba_n_groups,
        state_size=config.mamba_d_state,
        conv_kernel=config.mamba_d_conv,
        intermediate_size=inter,
        chunk_size=config.mamba_chunk_size,
        time_step_limit=tuple(limit) if limit else (0.0, float("inf")),
        layer_norm_epsilon=config.rms_norm_eps,
        use_bias=getattr(config, "mamba_proj_bias", False),
        use_conv_bias=getattr(config, "mamba_conv_bias", True),
        hidden_act=config.hidden_act,
        initializer_range=config.initializer_range,
        time_step_min=getattr(config, "time_step_min", 0.001),
        time_step_max=getattr(config, "time_step_max", 0.1),
        time_step_floor=getattr(config, "time_step_floor", 1e-4),
    )


class Mamba2Mixer(Module):
    def __init__(self, config: Mamba2Config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        self.layer_idx = layer_idx
        self.num_heads = config.num_heads
        self.head_dim = config.head_dim
        self.n_groups = config.n_groups
        self.state_size = config.state_size
        self.conv_kernel = config.conv_kernel
        self.intermediate = config.intermediate_size
        self.conv_dim = self.intermediate + 2 * self.n_groups * self.state_size
        self.chunk_size = config.chunk_size
        self.time_step_limit = config.time_step_limit
        self.eps = config.layer_norm_epsilon
        # gated-norm variants (FalconH1: optional, grouped, norm-before-gate)
        self.use_gated_norm = getattr(config, "use_gated_rms_norm", True)
        self.norm_before_gate = getattr(config, "norm_before_gate", False)
        self.norm_groups = getattr(config, "gated_norm_groups", 1)
        out_bias = getattr(config, "out_proj_bias", None)
        kw = dict(dtype=dtype, param_dtype=param_dtype,
                  kernel_init=normal_init(config.initializer_range))
        self.in_proj = Linear(config.hidden_size,
                              self.intermediate + self.conv_dim + self.num_heads,
                              config.use_bias, **kw)
        self.out_proj = Linear(self.intermediate, config.hidden_size,
                               config.use_bias if out_bias is None else out_bias, **kw)
        self.act = get_activation(config.hidden_act)
        self.use_conv_bias = config.use_conv_bias

    def init(self, rng):
        params = super().init(rng)
        k1, k2 = jax.random.split(rng)
        params["conv1d"] = {"weight": normal_init(0.02)(
            k1, (self.conv_dim, 1, self.conv_kernel), self.param_dtype)}
        if self.use_conv_bias:
            params["conv1d"]["bias"] = jnp.zeros((self.conv_dim,), self.param_dtype)
        # S4D-real: A_log = log(1..H); dt_bias = softplus⁻¹ of log-uniform dt
        # (reference init_mamba2_weights :428-441)
        params["A_log"] = jnp.log(jnp.arange(1, self.num_heads + 1, dtype=jnp.float32)
                                  ).astype(self.param_dtype)
        params["D"] = jnp.ones((self.num_heads,), self.param_dtype)
        cfg = self.config
        dt = jnp.exp(jax.random.uniform(k2, (self.num_heads,), jnp.float32)
                     * (math.log(cfg.time_step_max) - math.log(cfg.time_step_min))
                     + math.log(cfg.time_step_min))
        dt = jnp.clip(dt, cfg.time_step_floor, None)
        params["dt_bias"] = (dt + jnp.log(-jnp.expm1(-dt))).astype(self.param_dtype)
        if self.use_gated_norm:
            params["norm"] = {"weight": jnp.ones((self.intermediate,), self.param_dtype)}
        return params

    def project_in(self, params, hidden):
        """Input projection hook (FalconH1 adds μP section multipliers)."""
        return self.in_proj(params["in_proj"], hidden)

    def _gated_norm(self, params, y, gate):
        """RMSNorm(y * silu(gate)) in fp32 (reference MambaRMSNormGated :106);
        FalconH1 variants: no norm (plain silu gating), grouped norm,
        norm-before-gate ordering (falcon_h1 FalconH1RMSNormGated :248)."""
        gate32 = jax.nn.silu(gate.astype(jnp.float32))
        if not self.use_gated_norm:
            return y.astype(jnp.float32) * gate32
        h = y.astype(jnp.float32)
        if not self.norm_before_gate:
            h = h * gate32
        b, s, d = h.shape
        g = self.norm_groups
        hg = h.reshape(b, s, g, d // g)
        var = jnp.mean(jnp.square(hg), axis=-1, keepdims=True)
        hg = hg * jax.lax.rsqrt(var + self.eps)
        h = (params["norm"]["weight"].astype(jnp.float32).reshape(g, d // g) * hg
             ).reshape(b, s, d)
        if self.norm_before_gate:
            h = h * gate32
        return h

    def _conv_full(self, params, x):
        """Causal depthwise conv over [B, L, conv_dim]."""
        w = params["conv1d"]["weight"].astype(jnp.float32)  # [conv_dim, 1, K]
        y = jax.lax.conv_general_dilated(
            jnp.swapaxes(x, 1, 2).astype(jnp.float32), w, window_strides=(1,),
            padding=[(self.conv_kernel - 1, 0)],
            dimension_numbers=("NCW", "OIW", "NCW"),
            feature_group_count=self.conv_dim)
        if self.use_conv_bias:
            y = y + params["conv1d"]["bias"].astype(jnp.float32)[None, :, None]
        return jnp.swapaxes(y, 1, 2)

    def _expand_groups(self, t):
        """[..., G, N] -> [..., H, N] by repeating each group H//G times."""
        return jnp.repeat(t, self.num_heads // self.n_groups, axis=-2)

    def __call__(self, params, hidden, cache: Optional[MambaCache], attention_mask=None):
        b, s, _ = hidden.shape
        if attention_mask is not None:
            hidden = hidden * attention_mask[..., None].astype(hidden.dtype)
        proj = self.project_in(params, hidden)
        gate, x_b_c, dt = jnp.split(
            proj, [self.intermediate, self.intermediate + self.conv_dim], axis=-1)
        A = -jnp.exp(params["A_log"].astype(jnp.float32))   # [H]
        D = params["D"].astype(jnp.float32)

        has_state = cache is not None and cache.initialized
        decode = has_state and s == 1
        conv_state = cache.conv_states[self.layer_idx] if cache is not None else None
        if decode:
            conv_state = jnp.concatenate(
                [conv_state[:, :, 1:],
                 jnp.swapaxes(x_b_c, 1, 2).astype(conv_state.dtype)], axis=2)
            w = params["conv1d"]["weight"].astype(jnp.float32)[:, 0, :]  # [conv_dim, K]
            cx = jnp.sum(conv_state.astype(jnp.float32) * w[None], axis=-1)
            if self.use_conv_bias:
                cx = cx + params["conv1d"]["bias"].astype(jnp.float32)[None]
            cx = self.act(cx)[:, None, :]                   # [B, 1, conv_dim]
        else:
            raw = jnp.swapaxes(x_b_c.astype(jnp.float32), 1, 2)  # [B, conv_dim, s]
            if has_state:
                # chunked prefill: prepend the cached window, conv, keep last s
                raw = jnp.concatenate([conv_state.astype(jnp.float32), raw], axis=2)
                cx = self.act(self._conv_full(params, jnp.swapaxes(raw, 1, 2))[:, -s:])
            else:
                cx = self.act(self._conv_full(params, x_b_c))
            if cache is not None:
                pad = jnp.zeros((b, self.conv_dim, max(self.conv_kernel - raw.shape[2], 0)),
                                jnp.float32)
                conv_state = jnp.concatenate([pad, raw], axis=2)[:, :, -self.conv_kernel:]

        if attention_mask is not None and not decode:
            cx = cx * attention_mask[..., None].astype(cx.dtype)
        x, B, C = jnp.split(
            cx, [self.intermediate, self.intermediate + self.n_groups * self.state_size],
            axis=-1)
        xf = x.astype(jnp.float32).reshape(b, -1, self.num_heads, self.head_dim)
        Bh = self._expand_groups(B.astype(jnp.float32).reshape(b, -1, self.n_groups, self.state_size))
        Ch = self._expand_groups(C.astype(jnp.float32).reshape(b, -1, self.n_groups, self.state_size))
        dtf = jax.nn.softplus(dt.astype(jnp.float32)
                              + params["dt_bias"].astype(jnp.float32)[None, None])

        if decode:
            ssm = cache.ssm_states[self.layer_idx].astype(jnp.float32)  # [B,H,P,N]
            d = dtf[:, 0]                                  # [B,H]
            dA = jnp.exp(d * A[None])                      # [B,H]
            dBx = (d[..., None, None] * Bh[:, 0, :, None, :]) * xf[:, 0, ..., None]
            ssm = dA[..., None, None] * ssm + dBx
            y = (jnp.einsum("bhpn,bhn->bhp", ssm, Ch[:, 0])
                 + D[None, :, None] * xf[:, 0])[:, None]
            final_state = ssm
        else:
            dtf = jnp.clip(dtf, self.time_step_limit[0], self.time_step_limit[1])
            init = (cache.ssm_states[self.layer_idx].astype(jnp.float32)
                    if has_state else None)
            y, final_state = ssd_chunk_scan(xf, dtf, A, Bh, Ch, D, self.chunk_size, init)

        y = self._gated_norm(params, y.reshape(b, -1, self.intermediate), gate)
        out = self.out_proj(params["out_proj"], y.astype(self.dtype))
        if cache is not None:
            cache = replace(
                cache,
                conv_states=cache.conv_states[: self.layer_idx]
                + (conv_state.astype(cache.conv_states[self.layer_idx].dtype),)
                + cache.conv_states[self.layer_idx + 1:],
                ssm_states=cache.ssm_states[: self.layer_idx]
                + (final_state.astype(cache.ssm_states[self.layer_idx].dtype),)
                + cache.ssm_states[self.layer_idx + 1:],
            )
        return out, cache


class Mamba2Block(Module):
    def __init__(self, config, layer_idx, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.residual_in_fp32 = config.residual_in_fp32
        self.norm = RMSNorm(config.hidden_size, config.layer_norm_epsilon,
                            dtype=dtype, param_dtype=param_dtype)
        self.mixer = Mamba2Mixer(config, layer_idx, dtype=dtype, param_dtype=param_dtype)

    def __call__(self, params, hidden, cache, attention_mask):
        residual = hidden.astype(jnp.float32) if self.residual_in_fp32 else hidden
        h = self.norm(params["norm"], hidden)
        h, cache = self.mixer(params["mixer"], h, cache, attention_mask)
        return (residual + h.astype(residual.dtype)).astype(hidden.dtype), cache


class Mamba2Model(Module):
    def __init__(self, config: Mamba2Config, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.config = config
        kw = dict(dtype=dtype, param_dtype=param_dtype)
        self.embeddings = Embedding(config.vocab_size, config.hidden_size,
                                    embedding_init=normal_init(config.initializer_range), **kw)
        self.layers = [Mamba2Block(config, i, **kw) for i in range(config.num_hidden_layers)]
        self.norm_f = RMSNorm(config.hidden_size, config.layer_norm_epsilon, **kw)

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values: Optional[MambaCache] = None, cache_position=0,
                 inputs_embeds=None, output_hidden_states=False) -> BaseModelOutputWithPast:
        if inputs_embeds is None:
            inputs_embeds = self.embeddings(params["embeddings"], input_ids)
        hidden = inputs_embeds
        s = hidden.shape[1]
        if attention_mask is not None and attention_mask.shape[1] != s:
            attention_mask = attention_mask[:, :s] if not (
                past_key_values is not None and past_key_values.initialized) else None
        cache = past_key_values
        all_hidden = [] if output_hidden_states else None
        for i, layer in enumerate(self.layers):
            if output_hidden_states:
                all_hidden.append(hidden)
            hidden, cache = layer(params["layers"][str(i)], hidden, cache, attention_mask)
        hidden = self.norm_f(params["norm_f"], hidden)
        if output_hidden_states:
            all_hidden.append(hidden)
        if cache is not None and not cache.initialized:
            cache = replace(cache, initialized=True)
        return BaseModelOutputWithPast(
            last_hidden_state=hidden, past_key_values=cache,
            hidden_states=tuple(all_hidden) if all_hidden is not None else None,
        )


class Mamba2PreTrainedModel(PreTrainedModel):
    config_class = Mamba2Config
    base_model_prefix = "backbone"


class Mamba2ForCausalLM(Mamba2PreTrainedModel, GenerationMixin):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = Mamba2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)
        if not config.tie_word_embeddings:
            self.lm_head = Linear(config.hidden_size, config.vocab_size, False,
                                  dtype=self.dtype, param_dtype=self.param_dtype,
                                  kernel_init=normal_init(config.initializer_range))

    def get_input_embedding_path(self):
        return "backbone.embeddings.weight"

    @property
    def tied_weights_keys(self):
        return ()

    def tie_weights(self, params):
        return params

    def __call__(self, params, input_ids=None, attention_mask=None, position_ids=None,
                 past_key_values=None, cache_position=0, inputs_embeds=None, labels=None,
                 logits_to_keep: int = 0, output_hidden_states: bool = False) -> CausalLMOutputWithPast:
        outputs = self.backbone(
            params["backbone"], input_ids, attention_mask, position_ids,
            past_key_values, cache_position, inputs_embeds, output_hidden_states)
        hidden = outputs.last_hidden_state
        if logits_to_keep:
            hidden = hidden[:, -logits_to_keep:, :]
        if self.config.tie_word_embeddings:
            logits = self.backbone.embeddings.attend(params["backbone"]["embeddings"], hidden)
        else:
            logits = self.lm_head(params["lm_head"], hidden)
        loss = None
        if labels is not None:
            from ...loss import for_causal_lm_loss

            loss = for_causal_lm_loss(logits, labels, self.config.vocab_size)
        return CausalLMOutputWithPast(
            loss=loss, logits=logits, past_key_values=outputs.past_key_values,
            hidden_states=outputs.hidden_states)

    def init_cache(self, batch_size: int, max_len: int, dtype=None,
                   implementation: str = "static"):
        """Recurrent cache — constant size regardless of max_len."""
        cfg = self.config
        dtype = dtype or self.dtype
        conv_dim = cfg.intermediate_size + 2 * cfg.n_groups * cfg.state_size
        conv = tuple(jnp.zeros((batch_size, conv_dim, cfg.conv_kernel), dtype)
                     for _ in range(cfg.num_hidden_layers))
        ssm = tuple(jnp.zeros((batch_size, cfg.num_heads, cfg.head_dim, cfg.state_size),
                              jnp.float32)
                    for _ in range(cfg.num_hidden_layers))
        return MambaCache(conv_states=conv, ssm_states=ssm, initialized=False)


class Mamba2ModelStandalone(Mamba2PreTrainedModel):
    def __init__(self, config, *, dtype=jnp.float32, param_dtype=None):
        super().__init__(config, dtype=dtype, param_dtype=param_dtype)
        self.backbone = Mamba2Model(config, dtype=self.dtype, param_dtype=self.param_dtype)

    def __call__(self, params, *args, **kwargs):
        return self.backbone(params["backbone"], *args, **kwargs)
