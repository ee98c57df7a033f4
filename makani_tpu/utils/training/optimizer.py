"""Optimizer and LR-schedule factories (ref makani/utils/driver.py:702-810,
training_helpers.py:33-101).

optax equivalents: Adam/AdamW/SGD with weight-decay parameter groups (the
"transformer" convention excludes biases, norm parameters and position
embeddings from decay), linear warmup composed in front of the main schedule,
cosine annealing / step / plateau schedules, and model-group-aware global
gradient-norm clipping.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["get_optimizer", "get_schedule"]


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

    if opt_type in ("Adam", "FusedAdam"):
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
    elif opt_type in ("Muon", "SIRFShampoo"):
        # second-order-preconditioned option (the reference exposes
        # SIRFShampoo, driver.py:702-754); Muon orthogonalizes the momentum of
        # matrix-shaped weights on the MXU and falls back to adam elsewhere —
        # the TPU-idiomatic equivalent
        base = optax.contrib.muon(
            schedule,
            beta=params.get("optimizer_beta1", 0.95),
            adam_b1=beta1,
            adam_b2=beta2,
            eps=eps,
            weight_decay=wd,
        )
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
