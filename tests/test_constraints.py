"""Physical-constraint layers (ref tests/test_constraints.py: clamping
behavior per mode, gradient flow through the soft clamps, and the
hydrostatic-balance projection's linear-algebra identities).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.utils.constraints import HydrostaticBalanceProjection, NonNegativeConstraint

_RD = 287.0528
_G = 9.80665

NAMES = ["u10m", "t2m", "q500", "q700", "tp"]


def _data(seed=0, c=len(NAMES), h=6, w=8, scale=3.0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((2, c, h, w)) * scale).astype(np.float32)


class TestNonNegative:
    def test_eval_mode_hard_clamp_physical_zero(self):
        bias = np.asarray([0.0, 250.0, 3.0, -1.0, 0.5], np.float32)
        scale = np.asarray([1.0, 10.0, 2.0, 4.0, 0.25], np.float32)
        c = NonNegativeConstraint(NAMES, ["q500", "q700", "tp"], bias=bias, scale=scale)
        x = _data()
        y = np.asarray(c(jnp.asarray(x), train=False))
        phys = y * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
        assert phys[:, 2:].min() >= -1e-5  # clamped channels are physical-nonnegative
        np.testing.assert_array_equal(y[:, :2], x[:, :2])  # others untouched
        # already-positive values pass through exactly
        pos = phys[:, 2:] > 1e-4
        np.testing.assert_allclose(y[:, 2:][pos], x[:, 2:][pos], atol=1e-6)

    def test_eval_mode_without_stats_clamps_at_zero(self):
        c = NonNegativeConstraint(NAMES, ["tp"])
        x = _data(1)
        y = np.asarray(c(jnp.asarray(x), train=False))
        assert y[:, 4].min() >= 0.0
        np.testing.assert_array_equal(y[:, :4], x[:, :4])

    @pytest.mark.parametrize("mode", ["silu", "softplus"])
    def test_train_mode_asymptotics(self, mode):
        """Soft clamp ~ identity for values >> eps, ~ 0 (silu) or a small
        leak (softplus) for values << -eps."""
        c = NonNegativeConstraint(NAMES, ["tp"], eps=0.1, mode=mode, leak=0.02)
        x = np.zeros((1, 5, 1, 7), np.float32)
        vals = np.asarray([-20.0, -5.0, -0.5, 0.0, 0.5, 5.0, 20.0], np.float32)
        x[0, 4, 0] = vals
        y = np.asarray(c(jnp.asarray(x), train=True))[0, 4, 0]
        if mode == "silu":
            np.testing.assert_allclose(y[vals >= 5.0], vals[vals >= 5.0], rtol=1e-4)
            assert np.all(np.abs(y[vals <= -5.0]) < 1e-3)
        else:
            # softplus asymptote carries a -(1-leak) eps log2 shift
            np.testing.assert_allclose(y[vals >= 5.0], vals[vals >= 5.0] - 0.98 * 0.1 * np.log(2.0), atol=1e-3)
            # slope `leak` in the far-negative limit
            np.testing.assert_allclose(y[0] - y[1], 0.02 * (vals[0] - vals[1]), rtol=0.05)
            # the softplus clamp is strictly monotone (slope >= leak)
            assert np.all(np.diff(y) > 0.0)

    @pytest.mark.parametrize("mode", ["silu", "softplus"])
    def test_train_mode_gradient_flows_below_zero(self, mode):
        """Unlike the eval-mode max(), the training clamp keeps a nonzero
        gradient for (moderately) negative inputs — the point of soft modes."""
        c = NonNegativeConstraint(NAMES, ["tp"], eps=0.5, mode=mode)

        def f(v):
            x = jnp.zeros((1, 5, 1, 1)).at[0, 4, 0, 0].set(v)
            return c(x, train=True)[0, 4, 0, 0]

        g = jax.grad(f)(jnp.asarray(-0.4))
        assert float(jnp.abs(g)) > 1e-3
        g_eval = jax.grad(lambda v: c(jnp.zeros((1, 5, 1, 1)).at[0, 4, 0, 0].set(v), train=False)[0, 4, 0, 0])(
            jnp.asarray(-0.4)
        )
        assert float(g_eval) == 0.0

    def test_errors(self):
        with pytest.raises(ValueError):
            NonNegativeConstraint(NAMES, ["not_a_channel"])
        with pytest.raises(ValueError):
            NonNegativeConstraint(NAMES, ["tp"], mode="relu")


def _hydro_names(levels):
    return [f"z{p}" for p in levels] + [f"t{p}" for p in levels] + ["u10m"]


class TestHydrostaticProjection:
    levels = [100, 200, 300, 500, 700, 850]

    def _residual(self, z, t, levels):
        """Discrete hydrostatic residual rows z_{l+1}-z_l + (Rd/g) ln(p+/p) (T_l+T_{l+1})/2."""
        res = []
        for l in range(len(levels) - 1):
            dlnp = np.log(levels[l + 1] / levels[l])
            res.append(z[:, l + 1] - z[:, l] + 0.5 * (_RD / _G) * dlnp * (t[:, l] + t[:, l + 1]))
        return np.stack(res, 1)

    def test_projection_matrix_identities(self):
        proj = HydrostaticBalanceProjection(_hydro_names(self.levels))
        P = np.asarray(proj.P, np.float64)
        n = len(self.levels)
        assert P.shape == (2 * n, 2 * n)
        np.testing.assert_allclose(P @ P, P, atol=1e-5)  # idempotent
        np.testing.assert_allclose(P, P.T, atol=1e-6)  # orthogonal projection
        # eigenvalues are 0/1 with rank 2n - (n-1)
        ev = np.linalg.eigvalsh(P)
        assert np.sum(ev > 0.5) == 2 * n - (n - 1)

    def test_projected_state_is_balanced(self):
        names = _hydro_names(self.levels)
        proj = HydrostaticBalanceProjection(names, alpha=1.0)
        x = _data(3, c=len(names), scale=100.0)
        y = np.asarray(proj(jnp.asarray(x), train=True), np.float64)
        n = len(self.levels)
        res = self._residual(y[:, :n], y[:, n : 2 * n], self.levels)
        assert np.abs(res).max() < 1e-2 * np.abs(y[:, :n]).max()
        # the non-(z,t) channel is untouched
        np.testing.assert_array_equal(y[:, 2 * n], x[:, 2 * n])

    def test_balanced_input_is_fixed_point(self):
        """A state built by hydrostatic integration passes through unchanged."""
        names = _hydro_names(self.levels)
        proj = HydrostaticBalanceProjection(names, alpha=1.0)
        rng = np.random.default_rng(5)
        n = len(self.levels)
        t = (250.0 + 30.0 * rng.standard_normal((2, n, 4, 4))).astype(np.float64)
        z = np.zeros_like(t)
        z[:, 0] = 1e4
        for l in range(n - 1):
            dlnp = np.log(self.levels[l + 1] / self.levels[l])
            z[:, l + 1] = z[:, l] - 0.5 * (_RD / _G) * dlnp * (t[:, l] + t[:, l + 1])
        x = np.concatenate([z, t, np.zeros((2, 1, 4, 4))], 1).astype(np.float32)
        y = np.asarray(proj(jnp.asarray(x), train=True))
        np.testing.assert_allclose(y, x, atol=2e-2)  # fp32 roundoff at |z|~1e4

    def test_alpha_blending(self):
        names = _hydro_names(self.levels)
        x = _data(7, c=len(names), scale=50.0)
        y_full = np.asarray(HydrostaticBalanceProjection(names, alpha=1.0)(jnp.asarray(x)), np.float64)
        y_half = np.asarray(HydrostaticBalanceProjection(names, alpha=0.5)(jnp.asarray(x)), np.float64)
        y_zero = np.asarray(HydrostaticBalanceProjection(names, alpha=0.0)(jnp.asarray(x)), np.float64)
        np.testing.assert_allclose(y_zero, x, atol=1e-4)
        np.testing.assert_allclose(y_half, 0.5 * (y_full + x.astype(np.float64)), atol=1e-3)
        # idempotence of the full projection
        y_twice = np.asarray(HydrostaticBalanceProjection(names, alpha=1.0)(jnp.asarray(y_full.astype(np.float32))))
        np.testing.assert_allclose(y_twice, y_full, atol=2e-3)

    def test_normalized_space_round_trip(self):
        """With z-score stats the projection operates in physical units: the
        normalized output maps to the same physical state as projecting the
        denormalized input."""
        names = _hydro_names(self.levels)
        nc = len(names)
        rng = np.random.default_rng(11)
        bias = (rng.standard_normal(nc) * 100).astype(np.float32)
        scale = (1.0 + rng.random(nc)).astype(np.float32) * 10
        x_phys = _data(13, c=nc, scale=200.0)
        x_norm = (x_phys - bias.reshape(1, -1, 1, 1)) / scale.reshape(1, -1, 1, 1)
        y_norm = np.asarray(
            HydrostaticBalanceProjection(names, bias=bias, scale=scale, alpha=1.0)(jnp.asarray(x_norm)), np.float64
        )
        y_phys_direct = np.asarray(HydrostaticBalanceProjection(names, alpha=1.0)(jnp.asarray(x_phys)), np.float64)
        y_phys_via_norm = y_norm * scale.reshape(1, -1, 1, 1) + bias.reshape(1, -1, 1, 1)
        np.testing.assert_allclose(y_phys_via_norm, y_phys_direct, atol=5e-2)

    def test_level_window_and_errors(self):
        # levels outside [p_min, p_max] and unpaired levels are excluded
        names = ["z10", "z100", "t100", "z500", "t500", "z950", "t950", "z300"]
        proj = HydrostaticBalanceProjection(names, p_min=50, p_max=900)
        assert proj.levels == [100, 500]  # z10 below p_min, 950 above p_max, z300 unpaired
        with pytest.raises(ValueError):
            HydrostaticBalanceProjection(["z500", "t500", "u10m"])  # one level only
