"""Geometric metric kernels (ref makani/utils/metrics/functions.py:29-733).

All metrics are quadrature-weighted over the sphere (normalized weights) and
return per-(batch, channel) values of shape (B, C); the MetricsHandler does
batch/rollout accumulation. Under pjit the spatial sums auto-reduce over the
mesh's sharded dims.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "weighted_mean",
    "weighted_rmse",
    "weighted_acc",
    "weighted_l1",
    "ensemble_crps",
    "ensemble_spread",
    "ensemble_rank_histogram",
]


def weighted_mean(x, quad):
    """Normalized quadrature mean over the sphere: (B, C, H, W) -> (B, C)."""
    return quad(x)


def _mask_weight(x, mask):
    """Apply an optional spatial mask to an integrand. The mask is expected to
    be quadrature-normalized by the caller (the reference divides by its
    quadrature integral, inferencer.py:602-605) so masked metrics stay
    properly normalized."""
    return x if mask is None else x * mask


def weighted_rmse(prd, tar, quad, mask=None):
    return jnp.sqrt(quad(_mask_weight(jnp.square(prd - tar), mask)))


def weighted_l1(prd, tar, quad, mask=None):
    return quad(_mask_weight(jnp.abs(prd - tar), mask))


def weighted_acc(prd, tar, quad, clim=None, mask=None, eps: float = 1e-8):
    """Anomaly correlation coefficient vs climatology (ref functions.py)."""
    if clim is not None:
        pa = prd - clim
        ta = tar - clim
    else:
        pa, ta = prd, tar
    num = quad(_mask_weight(pa * ta, mask))
    den = jnp.sqrt(quad(_mask_weight(jnp.square(pa), mask)) * quad(_mask_weight(jnp.square(ta), mask)))
    return num / (den + eps)


def _crps_kernel_sorted(ens_sorted, obs):
    """CRPS via the probability-weighted-moment (PWM) form on a sorted
    ensemble (ref crps_loss.py:55-120 computes the same integral by CDF
    integration). ens_sorted: (E, ...) ascending; obs: (...). E-first layout:
    a minormost E tile-pads E -> 128 lanes on TPU (16x HBM at E=8)."""
    E = ens_sorted.shape[0]
    # E[|X - y|]
    term1 = jnp.mean(jnp.abs(ens_sorted - obs[None]), axis=0)
    # E|X - X'| via the sorted-rank identity: 2/(E*(E-1)) * sum_i (2i - E + 1) x_(i)
    ranks = jnp.arange(E, dtype=ens_sorted.dtype)
    coeff = (2.0 * ranks - E + 1.0).reshape((-1,) + (1,) * (ens_sorted.ndim - 1))
    if E > 1:
        term2 = jnp.sum(coeff * ens_sorted, axis=0) / (E * (E - 1.0))
    else:
        term2 = jnp.zeros_like(term1)
    return term1 - term2


def ensemble_crps(ens, obs, quad, fair: bool = True, mask=None):
    """CRPS of an ensemble forecast.

    ens: (B, E, C, H, W); obs: (B, C, H, W). ``fair=True`` uses the unbiased
    (fair) estimator with the 1/(E-1) spread term; ``fair=False`` uses 1/E.
    Returns (B, C).
    """
    ens_sorted = jnp.moveaxis(jnp.sort(ens, axis=1), 1, 0)  # (E, B, C, H, W)
    crps = _crps_kernel_sorted(ens_sorted, obs)
    if not fair:
        E = ens.shape[1]
        # convert the fair spread term to the biased 1/E^2 normalization
        ranks = jnp.arange(E, dtype=ens.dtype)
        coeff = (2.0 * ranks - E + 1.0).reshape((-1,) + (1,) * (ens_sorted.ndim - 1))
        # biased = term1 - S/E^2 vs fair = term1 - S/(E(E-1)) with
        # S = sum_i (2i - E + 1) x_(i); subtracting LESS spread, so the
        # correction is + S (1/(E(E-1)) - 1/E^2)
        corr = jnp.sum(coeff * ens_sorted, axis=0) * (1.0 / (E * (E - 1.0)) - 1.0 / (E * E)) if E > 1 else 0.0
        crps = crps + corr
    return quad(_mask_weight(crps, mask))


def ensemble_spread(ens, quad, mask=None, eps: float = 1e-8):
    """sqrt of mean ensemble variance: (B, E, C, H, W) -> (B, C)."""
    var = jnp.var(ens, axis=1, ddof=1) if ens.shape[1] > 1 else jnp.zeros_like(ens[:, 0])
    return jnp.sqrt(quad(_mask_weight(var, mask)) + eps)


def ensemble_rank_histogram(ens, obs, quad):
    """Quadrature-weighted rank histogram (ref functions.py:600-670
    GeometricRankHistogram): the area-weighted frequency of each rank the
    observation takes within the sorted ensemble.

    ens: (B, E, C, H, W); obs: (B, C, H, W). Returns (B, C, E+1); each (b, c)
    row sums to 1. A calibrated ensemble is flat; U-shape = underdispersion.
    The explicit sort+searchsorted is replaced by the rank count
    ``sum(member <= obs)``, which is identical and avoids the sort.
    """
    E = ens.shape[1]
    ranks = jnp.sum(ens <= obs[:, None], axis=1)  # (B, C, H, W) in [0, E]
    # per-rank masks instead of a one_hot with a minormost E+1 axis (which
    # tile-pads E+1 -> 128 lanes on TPU, a ~7x HBM blowup at full resolution)
    rows = [quad((ranks == r).astype(jnp.float32)) for r in range(E + 1)]
    return jnp.stack(rows, axis=-1)  # (B, C, E+1)
