"""Stochastic-interpolant math pins (ref stochastic_interpolant.py:244-341).

The schedule conventions are subtle: the reference deliberately defines
``dgamma = sqrt(s) * dsigma`` (NOT the calculus derivative of
``gamma = sqrt(s) * sigma``), and the score-recovery formula ``dlog_rho``
is derived under exactly that convention. These tests pin the endpoint
behavior, the drift/score consistency identity, the Foellmer diffusion
schedule, and the Euler-Maruyama sampler against closed forms.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models.stochastic_interpolant import StochasticInterpolant


@pytest.fixture
def si():
    return StochasticInterpolant(noise_epsilon=0.7)


def _rand(*shape, seed=0):
    return jnp.asarray(np.random.default_rng(seed).standard_normal(shape).astype(np.float32))


def test_path_endpoints(si):
    x0, x1, n = _rand(5, seed=1), _rand(5, seed=2), _rand(5, seed=3)
    np.testing.assert_allclose(si.interpolant(x0, x1, n, jnp.asarray(0.0)), x0, atol=1e-6)
    np.testing.assert_allclose(si.interpolant(x0, x1, n, jnp.asarray(1.0)), x1, atol=1e-6)


def test_schedule_derivatives_match_finite_differences(si):
    """alpha/beta/sigma d-functions are true derivatives; gamma's is NOT
    (the reference's deliberate convention) — assert both facts."""
    h = 1e-3
    for s in (0.2, 0.5, 0.8):
        s0, sp, sm = jnp.asarray(s), jnp.asarray(s + h), jnp.asarray(s - h)
        for f, df in ((si.alpha, si.dalpha), (si.beta, si.dbeta), (si.sigma, si.dsigma)):
            fd = float(f(sp) - f(sm)) / (2 * h)
            np.testing.assert_allclose(float(df(s0)), fd, rtol=1e-3, atol=1e-4)
        fd_gamma = float(si.gamma(sp) - si.gamma(sm)) / (2 * h)
        conv = float(si.dgamma(s0))
        honest = float(si.sigma(s0)) / (2 * np.sqrt(s)) + np.sqrt(s) * float(si.dsigma(s0))
        np.testing.assert_allclose(fd_gamma, honest, rtol=1e-3)
        assert abs(conv - honest) > 0.05  # the convention is intentionally different
        np.testing.assert_allclose(conv, np.sqrt(s) * float(si.dsigma(s0)), rtol=1e-6)


def test_score_recovery_identity(si):
    """dlog_rho inverts drift_target exactly: plugging the exact drift of a
    sample path recovers -noise/gamma — the Gaussian score of
    x_s | x0, x1. Only holds with the reference's dgamma convention."""
    x0, x1, n = _rand(7, seed=4), _rand(7, seed=5), _rand(7, seed=6)
    for s in (0.1, 0.3, 0.5, 0.7, 0.9):
        s_ = jnp.asarray(s)
        xs = si.interpolant(x0, x1, n, s_)
        b = si.drift_target(x0, x1, n, s_)
        score = si.dlog_rho(xs, x0, b, s_)
        want = -n / si.gamma(s_)
        np.testing.assert_allclose(np.asarray(score), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_gsq_schedules(si):
    for s in (0.1, 0.5, 0.9):
        s_ = jnp.asarray(s)
        np.testing.assert_allclose(float(si.gsq(s_)), float(si.sigma(s_)) ** 2, rtol=1e-6)
        assert float(si.gsq(s_, foellmer=True)) >= 0.0
    # foellmer at s->0 uses the limit ratio s*dbeta/beta -> 2
    sig0 = float(si.sigma(jnp.asarray(0.0)))
    want0 = abs(2.0 * sig0**2 * 2.0 - sig0**2)
    np.testing.assert_allclose(float(si.gsq(jnp.asarray(0.0), foellmer=True)), want0, rtol=1e-5)


def test_euler_maruyama_integrates_constant_drift():
    """With noise_epsilon=0 the SDE collapses to an ODE; a constant-drift
    model must integrate to x0 + c over s in [0, 1]."""
    import flax.linen as nn

    class ConstDrift(nn.Module):
        c: float

        @nn.compact
        def __call__(self, x, deterministic=True):
            # wrapper feeds cat(x_s, x0, s); emit the drift for the x_s block
            n_out = (x.shape[1] - 1) // 2
            return jnp.full((x.shape[0], n_out, *x.shape[2:]), self.c, x.dtype)

    from makani_tpu.models.stochastic_interpolant import StochasticInterpolantWrapper

    si0 = StochasticInterpolant(noise_epsilon=0.0)
    w = StochasticInterpolantWrapper(model=ConstDrift(c=0.37), interpolant=si0, n_pred_chans=2)
    x0 = _rand(2, 2, 8, 16, seed=7)
    out = w.sample({}, x0, jax.random.PRNGKey(0), n_steps=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0) + 0.37, atol=2e-2)
