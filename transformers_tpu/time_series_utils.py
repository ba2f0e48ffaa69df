"""Probabilistic-forecasting heads (reference src/transformers/time_series_utils.py).

Distribution outputs (Student-T / Normal / Negative-Binomial) as pure
functions over parameter pytrees: a per-argument Linear projection bank, a
domain map into valid parameter space, closed-form log-probs for the NLL
loss, and reparameterized sampling for the autoregressive forecast loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from .core.module import Linear, Module, normal_init


def squareplus(x):
    return (x + jnp.sqrt(jnp.square(x) + 4.0)) / 2.0


def weighted_average(x, weights=None, axis=None):
    """Mean of `x` weighted by `weights`, `0*0=0` safe (reference weighted_average)."""
    if weights is None:
        return x.mean(axis=axis)
    weighted = jnp.where(weights != 0, x * weights, 0.0)
    denom = jnp.clip(weights.sum(axis=axis) if axis else weights.sum(), 1.0, None)
    return (weighted.sum(axis=axis) if axis else weighted.sum()) / denom


@dataclass
class AffineStudentT:
    """y = loc + scale * StudentT(df, t_loc, t_scale); event summed over the
    last `event_dim` axes."""

    df: Any
    t_loc: Any
    t_scale: Any
    loc: Any = None
    scale: Any = None
    event_dim: int = 0

    def log_prob(self, y):
        loc = 0.0 if self.loc is None else self.loc
        scale = 1.0 if self.scale is None else self.scale
        z = (y - loc) / scale
        x = (z - self.t_loc) / self.t_scale
        df = self.df
        lp = (jax.lax.lgamma((df + 1.0) / 2.0) - jax.lax.lgamma(df / 2.0)
              - 0.5 * jnp.log(math.pi * df) - jnp.log(self.t_scale)
              - (df + 1.0) / 2.0 * jnp.log1p(jnp.square(x) / df))
        lp = lp - jnp.log(jnp.broadcast_to(jnp.asarray(scale, lp.dtype), lp.shape))
        if self.event_dim:
            lp = lp.sum(axis=-1)
        return lp

    def sample(self, key):
        t = jax.random.t(key, self.df, self.df.shape)
        y = self.t_loc + self.t_scale * t
        loc = 0.0 if self.loc is None else self.loc
        scale = 1.0 if self.scale is None else self.scale
        return loc + scale * y

    @property
    def mean(self):
        loc = 0.0 if self.loc is None else self.loc
        scale = 1.0 if self.scale is None else self.scale
        return loc + scale * self.t_loc


@dataclass
class AffineNormal:
    n_loc: Any
    n_scale: Any
    loc: Any = None
    scale: Any = None
    event_dim: int = 0

    def log_prob(self, y):
        loc = 0.0 if self.loc is None else self.loc
        scale = 1.0 if self.scale is None else self.scale
        z = (y - loc) / scale
        lp = (-0.5 * jnp.square((z - self.n_loc) / self.n_scale)
              - jnp.log(self.n_scale) - 0.5 * math.log(2 * math.pi))
        lp = lp - jnp.log(jnp.broadcast_to(jnp.asarray(scale, lp.dtype), lp.shape))
        if self.event_dim:
            lp = lp.sum(axis=-1)
        return lp

    def sample(self, key):
        eps = jax.random.normal(key, self.n_loc.shape)
        y = self.n_loc + self.n_scale * eps
        loc = 0.0 if self.loc is None else self.loc
        scale = 1.0 if self.scale is None else self.scale
        return loc + scale * y

    @property
    def mean(self):
        loc = 0.0 if self.loc is None else self.loc
        scale = 1.0 if self.scale is None else self.scale
        return loc + scale * self.n_loc


@dataclass
class NegativeBinomial:
    """torch.distributions.NegativeBinomial parametrization: number of
    successes before `total_count` failures, success log-odds `logits`."""

    total_count: Any
    logits: Any
    event_dim: int = 0

    def log_prob(self, k):
        r, l = self.total_count, self.logits
        lp = (jax.lax.lgamma(k + r) - jax.lax.lgamma(r) - jax.lax.lgamma(k + 1.0)
              + r * jax.nn.log_sigmoid(-l) + k * jax.nn.log_sigmoid(l))
        if self.event_dim:
            lp = lp.sum(axis=-1)
        return lp

    def sample(self, key):
        kg, kp = jax.random.split(key)
        # Gamma-Poisson mixture: rate ~ Gamma(r, (1-p)/p) == Gamma(r) * exp(logits)
        rate = jax.random.gamma(kg, self.total_count) * jnp.exp(self.logits)
        return jax.random.poisson(kp, rate).astype(self.logits.dtype)

    @property
    def mean(self):
        return self.total_count * jnp.exp(self.logits)


class ParameterProjection(Module):
    """One Linear per distribution argument (checkpoint keys proj.0, proj.1, …)."""

    def __init__(self, in_features, args_dim, *, dtype, param_dtype):
        super().__init__(dtype=dtype, param_dtype=param_dtype)
        self.args_dim = args_dim
        self.proj = [Linear(in_features, d, True, dtype=dtype, param_dtype=param_dtype,
                            kernel_init=normal_init(0.02)) for d in args_dim.values()]

    def __call__(self, params, x):
        return tuple(p(params["proj"][str(i)], x) for i, p in enumerate(self.proj))


class DistributionOutput:
    args_dim: dict

    def __init__(self, dim: int = 1):
        self.dim = dim
        self.args_dim = {k: dim * v for k, v in type(self).args_dim.items()}

    @property
    def event_shape(self):
        return () if self.dim == 1 else (self.dim,)

    @property
    def event_dim(self):
        return len(self.event_shape)

    def get_parameter_projection(self, in_features, *, dtype, param_dtype):
        return ParameterProjection(in_features, self.args_dim, dtype=dtype,
                                   param_dtype=param_dtype)

    def _maybe_squeeze(self, x):
        return x[..., 0] if self.dim == 1 else x


class StudentTOutput(DistributionOutput):
    args_dim = {"df": 1, "loc": 1, "scale": 1}

    def domain_map(self, df, loc, scale):
        eps = jnp.finfo(scale.dtype).eps
        scale = jnp.clip(squareplus(scale), eps, None)
        df = 2.0 + squareplus(df)
        return tuple(self._maybe_squeeze(v) for v in (df, loc, scale))

    def distribution(self, distr_args, loc=None, scale=None):
        df, t_loc, t_scale = distr_args
        return AffineStudentT(df, t_loc, t_scale, loc, scale, self.event_dim)


class NormalOutput(DistributionOutput):
    args_dim = {"loc": 1, "scale": 1}

    def domain_map(self, loc, scale):
        eps = jnp.finfo(scale.dtype).eps
        scale = jnp.clip(squareplus(scale), eps, None)
        return tuple(self._maybe_squeeze(v) for v in (loc, scale))

    def distribution(self, distr_args, loc=None, scale=None):
        n_loc, n_scale = distr_args
        return AffineNormal(n_loc, n_scale, loc, scale, self.event_dim)


class NegativeBinomialOutput(DistributionOutput):
    args_dim = {"total_count": 1, "logits": 1}

    def domain_map(self, total_count, logits):
        total_count = squareplus(total_count)
        return tuple(self._maybe_squeeze(v) for v in (total_count, logits))

    def distribution(self, distr_args, loc=None, scale=None):
        total_count, logits = distr_args
        if scale is not None:
            # scale the rate via the Gamma scaling property (reference
            # NegativeBinomialOutput.distribution)
            logits = logits + jnp.log(scale)
        return NegativeBinomial(total_count, logits, self.event_dim)


def get_distribution_output(name: str, dim: int) -> DistributionOutput:
    table = {"student_t": StudentTOutput, "normal": NormalOutput,
             "negative_binomial": NegativeBinomialOutput}
    return table[name](dim)
