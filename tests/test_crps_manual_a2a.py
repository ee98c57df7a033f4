"""Manual ensemble<->spatial all_to_all CRPS (ref crps_loss.py:372-380).

Parity of the shard_map all-to-all path against the GSPMD-derived path on the
8-device mesh (values AND gradients), plus a collective census: the manual
path must move the ensemble dim with all-to-all instead of all-gather.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from makani_tpu.parallel import mesh as pmesh
from makani_tpu.utils.losses.crps_loss import CRPSLoss


@pytest.fixture(autouse=True)
def reset_mesh():
    yield
    pmesh.cleanup()
    os.environ.pop("MAKANI_MANUAL_ENSEMBLE_A2A", None)


def _setup(B=2, E=4, C=3, H=16, W=32):
    mesh = pmesh.init(h=2, w=1, ensemble=2, batch=2)
    rng = np.random.RandomState(0)
    ens = rng.randn(B, E, C, H, W).astype(np.float32)
    obs = rng.randn(B, C, H, W).astype(np.float32)
    ens_sharding = NamedSharding(mesh, P("batch", "ensemble", None, "h", "w"))
    obs_sharding = NamedSharding(mesh, P("batch", None, "h", "w"))
    ens_g = jax.device_put(ens, ens_sharding)
    obs_g = jax.device_put(obs, obs_sharding)
    loss = CRPSLoss((H, W), channel_names=[f"c{i}" for i in range(C)], crps_type="skillspread")
    return mesh, loss, ens_g, obs_g


@pytest.mark.parametrize("crps_type", ["skillspread", "probability weighted moment"])
def test_manual_a2a_matches_gspmd(crps_type):
    mesh, loss, ens_g, obs_g = _setup()
    loss.crps_type = crps_type

    os.environ["MAKANI_MANUAL_ENSEMBLE_A2A"] = "off"
    ref = np.asarray(jax.jit(lambda e, o: loss(e, o))(ens_g, obs_g))
    os.environ["MAKANI_MANUAL_ENSEMBLE_A2A"] = "on"
    man = np.asarray(jax.jit(lambda e, o: loss(e, o))(ens_g, obs_g))
    np.testing.assert_allclose(man, ref, rtol=1e-5, atol=1e-6)

    # gradient parity
    def scalar(fn_env):
        os.environ["MAKANI_MANUAL_ENSEMBLE_A2A"] = fn_env
        return jax.jit(jax.grad(lambda e: jnp.sum(loss(e, obs_g))))(ens_g)

    g_ref = np.asarray(scalar("off"))
    g_man = np.asarray(scalar("on"))
    np.testing.assert_allclose(g_man, g_ref, rtol=1e-4, atol=1e-6)


def test_manual_a2a_reduces_collective_count():
    mesh, loss, ens_g, obs_g = _setup()

    def collectives(env):
        os.environ["MAKANI_MANUAL_ENSEMBLE_A2A"] = env
        hlo = jax.jit(lambda e, o: loss(e, o)).lower(ens_g, obs_g).compile().as_text()
        return {
            "all-to-all": hlo.count("all-to-all"),
            "all-gather": hlo.count("all-gather"),
            "all-reduce": hlo.count("all-reduce"),
            "reduce-scatter": hlo.count("reduce-scatter"),
            "collective-permute": hlo.count("collective-permute"),
        }

    manual = collectives("on")
    gspmd = collectives("off")
    # one member exchange expressed explicitly...
    assert manual["all-to-all"] >= 1
    # ...and strictly fewer collectives overall than what GSPMD derives from
    # the global formulation (measured in round 2: 2 vs 10 on the 8-dev mesh)
    assert sum(manual.values()) < sum(gspmd.values()), (manual, gspmd)


def test_manual_a2a_falls_back_when_indivisible():
    """17 padded-lat rows over h=2 don't split across ensemble ranks — the
    loss must quietly take the GSPMD path, not crash."""
    mesh = pmesh.init(h=2, w=1, ensemble=2, batch=2)
    H, W = 18, 32  # Hl = 9 rows per h-rank, 9 % 2 != 0
    rng = np.random.RandomState(1)
    ens = jax.device_put(
        rng.randn(2, 4, 3, H, W).astype(np.float32), NamedSharding(mesh, P("batch", "ensemble", None, "h", "w"))
    )
    obs = jax.device_put(rng.randn(2, 3, H, W).astype(np.float32), NamedSharding(mesh, P("batch", None, "h", "w")))
    loss = CRPSLoss((H, W), channel_names=["a", "b", "c"])
    os.environ["MAKANI_MANUAL_ENSEMBLE_A2A"] = "auto"
    out = np.asarray(jax.jit(lambda e, o: loss(e, o))(ens, obs))
    assert np.isfinite(out).all()
