"""Stochastic interpolant forecasting wrapper (ref makani/models/
stochastic_interpolant.py:102-552; Chen et al., probabilistic forecasting
with stochastic interpolants and Foellmer processes).

The generative SDE path between the current state x0 and the next state x1:

    x_s = alpha(s) x0 + beta(s) x1 + gamma(s) z,      z ~ GRF on S^2

with the reference's coefficient choices (stochastic_interpolant.py:244-252):

    alpha(s) = 1 - s        beta(s) = s^2
    sigma(s) = eps (1 - s)  gamma(s) = sqrt(s) sigma(s)

The model learns the drift b(x_s, x0, aux, s) ~ E[d/ds x_s | x_s]; sampling
integrates the SDE with Euler-Maruyama, optionally with the Foellmer g^2
schedule. Functional redesign: the sampler and interpolant are pure functions
of explicit RNG keys.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["StochasticInterpolant", "StochasticInterpolantWrapper"]


class StochasticInterpolant:
    """Coefficient schedule + pure path/drift helpers."""

    def __init__(self, noise_epsilon: float = 1.0):
        self.eps = noise_epsilon

    # schedules (ref :244-252)
    def alpha(self, s):
        return 1.0 - s

    def dalpha(self, s):
        return -jnp.ones_like(s)

    def beta(self, s):
        return jnp.square(s)

    def dbeta(self, s):
        return 2.0 * s

    def sigma(self, s):
        return self.eps * (1.0 - s)

    def dsigma(self, s):
        return -self.eps * jnp.ones_like(s)

    def gamma(self, s):
        return jnp.sqrt(s) * self.sigma(s)

    def dgamma(self, s):
        # NOT the calculus derivative of gamma: the reference deliberately
        # leaves the sqrt(s) factor undifferentiated ("in the original paper,
        # the sqrt(s) term was not taken a derivative of", ref
        # stochastic_interpolant.py:251-252). This convention is what makes
        # the drift/score pair algebraically consistent: with it,
        # dlog_rho(x, x0, drift_target(...), s) == -noise / gamma(s) exactly
        # (pinned in tests/test_stochastic_interpolant.py).
        return jnp.sqrt(s) * self.dsigma(s)

    def interpolant(self, x0, x1, noise, s):
        return self.alpha(s) * x0 + self.beta(s) * x1 + self.gamma(s) * noise

    def drift_target(self, x0, x1, noise, s):
        return self.dalpha(s) * x0 + self.dbeta(s) * x1 + self.dgamma(s) * noise

    def gsq(self, s, foellmer: bool = False):
        """Diffusion-strength schedule (ref :274-306)."""
        if foellmer:
            ratio = jnp.where(s > 0, s * self.dbeta(s) / jnp.maximum(self.beta(s), 1e-8), 2.0)
            term1 = 2.0 * jnp.square(self.sigma(s)) * ratio
            term2 = 2.0 * s * self.sigma(s) * self.dsigma(s)
            return jnp.abs(term1 - term2 - jnp.square(self.sigma(s)))
        return jnp.square(self.sigma(s))

    def dlog_rho(self, x, x0, b, s):
        """Score recovered algebraically from the drift (ref :309-341)."""
        sig, dsig = self.sigma(s), self.dsigma(s)
        bet, dbet = self.beta(s), self.dbeta(s)
        As = 1.0 / (s * sig * (dbet * sig - bet * dsig) + 1e-12)
        cs = x * dbet + (bet * self.dalpha(s) - dbet * self.alpha(s)) * x0
        return As * (bet * b - cs)


class StochasticInterpolantWrapper(nn.Module):
    """Drift model: predicts b(x_s; x0, aux, s) with the interpolation time
    appended as a constant channel (ref InterpolationWrapper, :102-165)."""

    model: nn.Module
    interpolant: Any = None
    n_pred_chans: int = 0

    @nn.compact
    def __call__(self, x0, x_s, unpredicted=None, s=None, deterministic: bool = True):
        parts = [x_s, x0]
        if unpredicted is not None:
            unp = unpredicted[:, 0] if unpredicted.ndim == 5 else unpredicted
            parts.append(unp.astype(x_s.dtype))
        schan = jnp.broadcast_to(s.reshape(-1, 1, 1, 1), (x_s.shape[0], 1, *x_s.shape[2:])).astype(x_s.dtype)
        parts.append(schan)
        inp = jnp.concatenate(parts, axis=1)
        return self.model(inp, deterministic=deterministic)

    def sample(self, variables, x0, key, unpredicted=None, n_steps: int = 10, foellmer: bool = False, noise_sampler=None):
        """Euler-Maruyama integration from s=0 to 1 (ref :357-520).

        ``noise_sampler(key, shape_like)`` draws the SDE noise (a spherical
        GRF in the reference; white noise if None).
        """
        itp = self.interpolant or StochasticInterpolant()
        ds = 1.0 / n_steps

        x = x0
        for i in range(n_steps):
            s = jnp.full((x0.shape[0],), i * ds + 1e-4, jnp.float32)
            sb = s.reshape(-1, 1, 1, 1)
            b = self.apply(variables, x0, x, unpredicted, s, deterministic=True)
            key, sub = jax.random.split(key)
            if noise_sampler is not None:
                z = noise_sampler(sub, x)
            else:
                z = jax.random.normal(sub, x.shape, x.dtype)
            g2 = itp.gsq(sb, foellmer=foellmer)
            score = itp.dlog_rho(x, x0, b, sb)
            drift = b + 0.5 * (g2 - jnp.square(itp.sigma(sb))) * score
            x = x + ds * drift + jnp.sqrt(jnp.maximum(g2 * ds, 0.0)) * z
        return x
