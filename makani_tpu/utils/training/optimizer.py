"""Optimizer and LR-schedule factories (ref makani/utils/driver.py:702-810,
training_helpers.py:33-101).

optax equivalents: Adam/AdamW/SGD with weight-decay parameter groups (the
"transformer" convention excludes biases, norm parameters and position
embeddings from decay), linear warmup composed in front of the main schedule,
cosine annealing / step / plateau schedules, and model-group-aware global
gradient-norm clipping.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

__all__ = ["get_optimizer", "get_schedule", "scale_by_adam_factored", "scale_by_shampoo", "cast_params"]


# ---------------------------------------------------------------------------
# Adam with an Adafactor-style factored second moment.
#
# The SFNO flagship's dhconv weight stacks are (embed, embed, L) tensors whose
# full fp32 Adam nu is ~0.6 GB of HBM *read + written every step* on top of the
# storage. Factoring nu into row/column EMA means (Adafactor, Shazeer & Stern
# 2018) cuts that state to O(embed * L) while keeping Adam's first moment and
# update rule — the byte cut the bandwidth-bound step needs (PERF.md roofline;
# ref exposes the analogous memory-lean option as SIRFShampoo,
# makani/utils/driver.py:702-754).
# ---------------------------------------------------------------------------


def _factored_dims(shape, min_dim_size_to_factor: int):
    """Two largest axes to factor the second moment over, or None."""
    if len(shape) < 2:
        return None
    sorted_dims = np.argsort(shape)
    if shape[sorted_dims[-2]] < min_dim_size_to_factor:
        return None
    return int(sorted_dims[-2]), int(sorted_dims[-1])


class _Nu(NamedTuple):
    v_row: Any  # EMA of mean(g^2) over the larger factored axis (or size-0)
    v_col: Any  # EMA of mean(g^2) over the smaller factored axis (or size-0)
    v: Any  # full second moment for unfactored leaves (or size-0)


class ScaleByAdamFactoredState(NamedTuple):
    count: Any
    mu: Any
    nu: Any  # pytree of _Nu


def scale_by_adam_factored(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
    min_dim_size_to_factor: int = 128,
) -> optax.GradientTransformation:
    """Adam whose nu is rank-1-factored for large (>=2D) parameters.

    For a leaf with factored axes (d0, d1) the full nu is approximated by
    ``vhat = (v_row / mean_d0(v_row)) (x) v_col`` (the Adafactor estimator);
    small leaves keep exact full nu. mu is exact Adam momentum (optionally
    bf16). Update: ``mu_hat / (sqrt(nu_hat) + eps)`` with standard bias
    correction.
    """
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None

    def _zeros0(dtype=jnp.float32):
        return jnp.zeros((0,), dtype)

    def init_fn(params):
        def init_nu(p):
            dims = _factored_dims(p.shape, min_dim_size_to_factor)
            if dims is None:
                return _Nu(_zeros0(), _zeros0(), jnp.zeros_like(p, jnp.float32))
            d0, d1 = dims
            vr_shape = tuple(s for i, s in enumerate(p.shape) if i != d1)
            vc_shape = tuple(s for i, s in enumerate(p.shape) if i != d0)
            return _Nu(jnp.zeros(vr_shape, jnp.float32), jnp.zeros(vc_shape, jnp.float32), _zeros0())

        mu = jax.tree.map(lambda p: jnp.zeros_like(p, mu_dtype or jnp.float32), params)
        nu = jax.tree.map(init_nu, params)
        return ScaleByAdamFactoredState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        c1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count.astype(jnp.float32)
        c2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count.astype(jnp.float32)

        def upd(g, mu, nu):
            g32 = g.astype(jnp.float32)
            new_mu = (b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32).astype(mu.dtype)
            g2 = g32 * g32
            dims = _factored_dims(g.shape, min_dim_size_to_factor)
            if dims is None:
                new_v = b2 * nu.v + (1.0 - b2) * g2
                vhat = new_v / c2
                new_nu = _Nu(nu.v_row, nu.v_col, new_v)
            else:
                d0, d1 = dims
                new_vr = b2 * nu.v_row + (1.0 - b2) * jnp.mean(g2, axis=d1)
                new_vc = b2 * nu.v_col + (1.0 - b2) * jnp.mean(g2, axis=d0)
                # reconstruct: vhat = (vr / mean_{d0}(vr)) (x) vc
                # (after removing d1, axis d0 shifts down if d1 < d0)
                d0r = d0 - 1 if d1 < d0 else d0
                row_mean = jnp.mean(new_vr, axis=d0r, keepdims=True)
                vr_n = new_vr / jnp.maximum(row_mean, 1e-30)
                vhat = jnp.expand_dims(vr_n, d1) * jnp.expand_dims(new_vc, d0) / c2
                new_nu = _Nu(new_vr, new_vc, nu.v)
            mu_hat = new_mu.astype(jnp.float32) / c1
            out = (mu_hat / (jnp.sqrt(vhat) + eps)).astype(g.dtype)
            return out, new_mu, new_nu

        # nu's _Nu leaves align with updates' array leaves — map manually
        u_leaves, treedef = jax.tree.flatten(updates)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)
        outs = [upd(g, m, n) for g, m, n in zip(u_leaves, mu_leaves, nu_leaves)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_mu = treedef.unflatten([o[1] for o in outs])
        new_nu = treedef.unflatten([o[2] for o in outs])
        return new_updates, ScaleByAdamFactoredState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def cast_params(params, dtype):
    """Cast every floating-point leaf to ``dtype`` (bf16 compute mirror)."""
    return jax.tree.map(lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p, params)


# ---------------------------------------------------------------------------
# Shampoo: Kronecker-factored full-matrix preconditioning.
#
# The reference exposes SIRFShampoo (makani/utils/driver.py:702-754) — a
# Kronecker-structured second-order method. This is the same preconditioner
# family implemented TPU-first (Gupta et al. 2018): per-axis statistics
# S_i = b2 S_i + (1-b2) G_(i) G_(i)^T contracted on the MXU, inverse-(2k)-th
# roots refreshed every ``precondition_interval`` steps via eigh under
# lax.cond (the root is amortized; the per-step cost is k small GEMMs), SGD
# grafting for the step scale, heavy-ball momentum on the preconditioned
# direction. Axes larger than ``max_precond_dim`` are skipped (diagonal
# behavior along them), so (embed, embed, L, 2) dhconv stacks get 384x384,
# 384x384, LxL and 2x2 factors instead of one impossible full matrix.
# ---------------------------------------------------------------------------


class ScaleByShampooState(NamedTuple):
    count: Any
    mu: Any  # momentum on the preconditioned direction
    stats: Any  # per-leaf tuple of per-axis Kronecker statistics
    roots: Any  # per-leaf tuple of cached inverse-root preconditioners


def _precond_axes(shape, max_precond_dim: int):
    return tuple(i for i, d in enumerate(shape) if 1 < d <= max_precond_dim)


def _inv_pth_root(s: jnp.ndarray, p: int, ridge: float) -> jnp.ndarray:
    """(S + ridge*tr(S)/d*I)^(-1/p) via symmetric eigendecomposition."""
    d = s.shape[0]
    lam = ridge * (jnp.trace(s) / d + 1e-30)
    w, q = jnp.linalg.eigh(s + lam * jnp.eye(d, dtype=s.dtype))
    w = jnp.maximum(w, 1e-30)
    return (q * (w ** (-1.0 / p))) @ q.T


def scale_by_shampoo(
    b1: float = 0.9,
    b2: float = 0.999,
    max_precond_dim: int = 1024,
    precondition_interval: int = 10,
    ridge: float = 1e-6,
    graft: bool = True,
) -> optax.GradientTransformation:
    """Shampoo preconditioning (the reference's SIRFShampoo role).

    Leaves with no eligible axis (scalars, all-axes-too-large) fall back to
    plain momentum SGD; grafting rescales every preconditioned update to the
    raw gradient's norm so the learning-rate schedule transfers from SGD/Adam
    recipes.
    """

    def init_fn(params):
        def init_leaf(p):
            axes = _precond_axes(p.shape, max_precond_dim)
            stats = tuple(jnp.zeros((p.shape[a], p.shape[a]), jnp.float32) for a in axes)
            roots = tuple(jnp.eye(p.shape[a], dtype=jnp.float32) for a in axes)
            return stats, roots

        mu = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)
        per_leaf = jax.tree.map(init_leaf, params)
        is_sr = lambda x: isinstance(x, tuple) and len(x) == 2 and isinstance(x[0], tuple)
        stats = jax.tree.map(lambda sr: sr[0], per_leaf, is_leaf=is_sr)
        roots = jax.tree.map(lambda sr: sr[1], per_leaf, is_leaf=is_sr)
        return ScaleByShampooState(count=jnp.zeros([], jnp.int32), mu=mu, stats=stats, roots=roots)

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        do_refresh = (count - 1) % precondition_interval == 0

        def upd(g, mu, stats, roots):
            g32 = g.astype(jnp.float32)
            axes = _precond_axes(g.shape, max_precond_dim)
            k = len(axes)
            if k == 0:
                new_mu = b1 * mu + g32
                return new_mu.astype(g.dtype), new_mu, stats, roots

            other = lambda a: tuple(i for i in range(g32.ndim) if i != a)
            new_stats = tuple(
                b2 * s + (1.0 - b2) * jnp.tensordot(g32, g32, axes=(other(a), other(a)))
                for s, a in zip(stats, axes)
            )
            new_roots = jax.lax.cond(
                do_refresh,
                lambda st: tuple(_inv_pth_root(s, 2 * k, ridge) for s in st),
                lambda st: roots,
                new_stats,
            )
            pg = g32
            for r, a in zip(new_roots, axes):
                pg = jnp.moveaxis(jnp.tensordot(r, pg, axes=([1], [a])), 0, a)
            if graft:
                pg = pg * (jnp.linalg.norm(g32) / (jnp.linalg.norm(pg) + 1e-30))
            new_mu = b1 * mu + pg
            return new_mu.astype(g.dtype), new_mu, new_stats, new_roots

        u_leaves, treedef = jax.tree.flatten(updates)
        mu_leaves = treedef.flatten_up_to(state.mu)
        st_leaves = treedef.flatten_up_to(state.stats)
        rt_leaves = treedef.flatten_up_to(state.roots)
        outs = [upd(g, m, s, r) for g, m, s, r in zip(u_leaves, mu_leaves, st_leaves, rt_leaves)]
        return (
            treedef.unflatten([o[0] for o in outs]),
            ScaleByShampooState(
                count=count,
                mu=treedef.unflatten([o[1] for o in outs]),
                stats=treedef.unflatten([o[2] for o in outs]),
                roots=treedef.unflatten([o[3] for o in outs]),
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)


# FCN3 staged-training freeze groups (ref fourcastnet3.py:886-899):
# freeze_encoder covers the DISCO encoders/decoders and the big-skip transform;
# freeze_processor covers the processor blocks.
_FREEZE_ENCODER_PREFIXES = (
    "atmo_encoder",
    "surf_encoder",
    "aux_encoder",
    "atmo_decoder",
    "surf_decoder",
    "encoder",
    "decoder",
    "residual_transform",
)
_FREEZE_PROCESSOR_PREFIXES = ("block",)


def _freeze_labels(params, freeze_encoder: bool, freeze_processor: bool):
    """Label each leaf 'frozen' or 'train' by module-path prefix."""

    def label(path, _leaf):
        comps = [str(p.key) if hasattr(p, "key") else str(p) for p in path]
        for c in comps:
            if freeze_encoder and any(c == p or c.startswith(p) for p in _FREEZE_ENCODER_PREFIXES):
                return "frozen"
            if freeze_processor and any(c.startswith(p) for p in _FREEZE_PROCESSOR_PREFIXES):
                return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def apply_freeze_flags(tx, params, model_params):
    """Wrap the optimizer so frozen parameter groups receive zero updates.

    The reference freezes via ``requires_grad = False``
    (fourcastnet3.py:886-899) — parameters stop updating but gradients still
    flow *through* them (essential for push-forward multistep training, where
    later steps backprop into earlier steps' encoders). ``optax.set_to_zero``
    on the frozen label reproduces exactly that: zero update, no optimizer
    state, full gradient flow.
    """
    freeze_encoder = bool(params.get("freeze_encoder", False))
    freeze_processor = bool(params.get("freeze_processor", False))
    if not (freeze_encoder or freeze_processor):
        return tx
    labels = _freeze_labels(model_params, freeze_encoder, freeze_processor)
    return optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)


def _no_decay_mask(params):
    """True where weight decay applies: matrices/kernels, not biases/norm
    scales/pos embeddings (ref training_helpers.py:33-74)."""

    def decay_ok(path, leaf):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path).lower()
        if "bias" in name or "pos_embed" in name or "norm" in name or "gamma" in name:
            return False
        return leaf.ndim > 1

    return jax.tree_util.tree_map_with_path(decay_ok, params)


def get_schedule(params, steps_per_epoch: int = 1):
    lr = params.get("lr", 1e-3)
    sched_type = params.get("scheduler", "none")
    warmup_steps = params.get("lr_warmup_steps", 0)

    if sched_type == "CosineAnnealingLR":
        t_max = params.get("scheduler_T_max", 100) * steps_per_epoch
        main = optax.cosine_decay_schedule(lr, decay_steps=max(t_max, 1), alpha=params.get("scheduler_min_lr", 0.0) / lr if lr else 0.0)
    elif sched_type == "StepLR":
        step_size = params.get("scheduler_step_size", 20) * steps_per_epoch
        main = optax.exponential_decay(lr, transition_steps=step_size, decay_rate=params.get("scheduler_gamma", 0.5), staircase=True)
    elif sched_type in ("ReduceLROnPlateau", "none", None):
        # plateau scheduling is epoch-driven and host-side; the base schedule
        # stays constant and the trainer composes reduce_on_plateau on top
        main = optax.constant_schedule(lr)
    else:
        raise ValueError(f"scheduler {sched_type} not supported")

    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, lr, warmup_steps)
        return optax.join_schedules([warmup, main], [warmup_steps])
    return main


def get_optimizer(params, model_params, steps_per_epoch: int = 1):
    schedule = get_schedule(params, steps_per_epoch)
    opt_type = params.get("optimizer_type", "Adam")
    beta1 = params.get("optimizer_beta1", 0.9)
    beta2 = params.get("optimizer_beta2", 0.999)
    eps = params.get("optimizer_eps", 1e-8)
    wd = params.get("weight_decay", 0.0)

    # optional low-precision first moment: halves the Adam m-state memory and
    # its HBM traffic (the dhconv moments are ~1.2 GB fp32 at flagship scale)
    mu_dtype = {"bfloat16": jnp.bfloat16, "float32": None, None: None}[params.get("optimizer_mu_dtype", None)]

    # Adafactor-style factored second moment: cuts the (embed, embed, L)
    # dhconv nu from ~0.6 GB fp32 (read+written every step) to O(embed*L)
    factored_nu = bool(params.get("optimizer_nu_factored", False))

    if factored_nu and opt_type in ("Adam", "FusedAdam", "AdamW"):
        pieces = [scale_by_adam_factored(b1=beta1, b2=beta2, eps=eps, mu_dtype=mu_dtype)]
        if wd > 0:
            pieces.append(optax.add_decayed_weights(wd, mask=_no_decay_mask(model_params)))
        pieces.append(optax.scale_by_learning_rate(schedule))
        base = optax.chain(*pieces)
    elif opt_type in ("Adam", "FusedAdam"):
        if wd > 0:
            base = optax.adamw(
                schedule, b1=beta1, b2=beta2, eps=eps, mu_dtype=mu_dtype, weight_decay=wd, mask=_no_decay_mask(model_params)
            )
        else:
            base = optax.adam(schedule, b1=beta1, b2=beta2, eps=eps, mu_dtype=mu_dtype)
    elif opt_type == "AdamW":
        base = optax.adamw(
            schedule, b1=beta1, b2=beta2, eps=eps, mu_dtype=mu_dtype, weight_decay=wd, mask=_no_decay_mask(model_params)
        )
    elif opt_type == "SGD":
        base = optax.sgd(schedule, momentum=params.get("optimizer_momentum", 0.0), nesterov=params.get("optimizer_nesterov", False))
    elif opt_type == "Muon":
        # Muon orthogonalizes the momentum of matrix-shaped weights on the
        # MXU and falls back to adam elsewhere
        base = optax.contrib.muon(
            schedule,
            beta=params.get("optimizer_beta1", 0.95),
            adam_b1=beta1,
            adam_b2=beta2,
            eps=eps,
            weight_decay=wd,
        )
    elif opt_type in ("Shampoo", "SIRFShampoo"):
        # Kronecker-factored second-order preconditioning (the reference's
        # SIRFShampoo, driver.py:702-754) — scale_by_shampoo above
        pieces = [
            scale_by_shampoo(
                b1=beta1,
                b2=beta2,
                max_precond_dim=params.get("optimizer_max_precond_dim", 1024),
                precondition_interval=params.get("optimizer_precondition_interval", 10),
            )
        ]
        if wd > 0:
            pieces.append(optax.add_decayed_weights(wd, mask=_no_decay_mask(model_params)))
        pieces.append(optax.scale_by_learning_rate(schedule))
        base = optax.chain(*pieces)
    else:
        raise ValueError(f"optimizer {opt_type} not supported")

    chain = []
    max_norm = params.get("optimizer_max_grad_norm", params.get("max_grad_norm", None))
    if max_norm:
        chain.append(optax.clip_by_global_norm(max_norm))
    chain.append(base)
    tx = optax.chain(*chain)

    # staged-training freezes (FCN3 pretrain2/finetune recipes)
    tx = apply_freeze_flags(tx, params, model_params)

    accum = params.get("grad_accumulation_steps", 1)
    if accum and accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, schedule
