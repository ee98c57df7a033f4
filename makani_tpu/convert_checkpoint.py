"""Convert reference makani (PyTorch) checkpoints to makani_tpu parameters
(ref makani/convert_checkpoint.py, repurposed: instead of merging legacy
model-parallel shards, this converts across frameworks).

Supported: SFNO/FNO-family checkpoints (the flagship lineage). The mapping is
purely structural — both frameworks use the same architecture, orthonormal
SHT convention, and dhconv contraction, so weights transfer 1:1 up to layout:

    torch Conv2d (out, in, 1, 1)  -> Conv1x1 kernel (1, in, out)
    torch Linear (out, in)        -> Dense kernel (in, out)
    complex spectral weight       -> trailing [re, im] pair
    EncoderDecoder Sequential fwd.{0,2,...} -> encoder hidden{i}/out
    MLP Sequential fwd.{0,3}      -> mlp fc1/fc2

Usage:
    python -m makani_tpu.convert_checkpoint --input ckpt_mp0_v0.tar \
        --output params_dir --yaml_config config/sfnonet.yaml --config ...
"""

from __future__ import annotations

import argparse
import re
from typing import Dict

import numpy as np

__all__ = ["convert_sfno_state_dict", "load_torch_checkpoint"]


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy arrays (no torch tensors leak)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("model_state", ckpt.get("model_state_dict", ckpt))
    out = {}
    for k, v in state.items():
        # canonicalize wrapper prefixes (ref driver.py:585-599)
        k = k.replace("_orig_mod.", "").replace("module.", "")
        if hasattr(v, "numpy"):
            arr = v.detach().cpu()
            if arr.is_complex():
                arr = np.stack([arr.real.numpy(), arr.imag.numpy()], axis=-1)
            else:
                arr = arr.numpy()
        else:
            arr = np.asarray(v)
        out[k] = arr
    return out


def _conv1x1(w: np.ndarray) -> np.ndarray:
    """(out, in, 1, 1) -> (1, in, out)."""
    return np.ascontiguousarray(np.transpose(w[:, :, 0, 0], (1, 0)))[None]


def convert_sfno_state_dict(state: Dict[str, np.ndarray], encoder_layers: int = 1) -> dict:
    """Map a makani SFNO/FNO state dict onto the makani_tpu param pytree.

    Returns a nested dict matching ``SingleStepWrapper``/``MultiStepWrapper``
    variables: {"params": {"model": {...}}}.
    """
    model: dict = {}

    def put(path, value):
        node = model
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value, np.float32)

    def map_encdec(prefix_t, prefix_o):
        # Sequential indices: conv at 2*i for hidden layers, final conv last
        idxs = sorted(
            {int(m.group(1)) for k in state for m in [re.match(rf"{prefix_t}\.fwd\.(\d+)\.weight", k)] if m}
        )
        for j, si in enumerate(idxs):
            w = state[f"{prefix_t}.fwd.{si}.weight"]
            is_last = j == len(idxs) - 1
            name = "out" if is_last else f"hidden{j}"
            put((prefix_o, name, "kernel"), _conv1x1(w))
            bkey = f"{prefix_t}.fwd.{si}.bias"
            if bkey in state:
                put((prefix_o, name, "bias"), state[bkey])

    map_encdec("model.encoder", "encoder")
    map_encdec("model.decoder", "decoder")

    # blocks
    block_ids = sorted({int(m.group(1)) for k in state for m in [re.match(r"model\.blocks\.(\d+)\.", k)] if m})
    for i in block_ids:
        t = f"model.blocks.{i}"
        o = f"block{i}"
        # spectral filter weight: complex -> split pair already done at load
        w = state[f"{t}.filter.filter.weight"]
        put((o, "filter_layer", "filter", "weight"), w)
        if f"{t}.filter.filter.bias" in state:
            put((o, "filter_layer", "filter", "bias"), state[f"{t}.filter.filter.bias"])
        # norms
        for norm in ("norm0", "norm1"):
            if f"{t}.{norm}.weight" in state:
                put((o, norm, "weight"), state[f"{t}.{norm}.weight"])
                put((o, norm, "bias"), state[f"{t}.{norm}.bias"])
        # skips
        for skip in ("inner_skip", "outer_skip"):
            if f"{t}.{skip}.weight" in state:
                put((o, skip, "kernel"), _conv1x1(state[f"{t}.{skip}.weight"]))
        # mlp: Sequential[fc1, act, drop, fc2, drop]
        if f"{t}.mlp.fwd.0.weight" in state:
            put((o, "mlp", "fc1", "kernel"), _conv1x1(state[f"{t}.mlp.fwd.0.weight"]))
            put((o, "mlp", "fc1", "bias"), state[f"{t}.mlp.fwd.0.bias"])
            put((o, "mlp", "fc2", "kernel"), _conv1x1(state[f"{t}.mlp.fwd.3.weight"]))
            if f"{t}.mlp.fwd.3.bias" in state:
                put((o, "mlp", "fc2", "bias"), state[f"{t}.mlp.fwd.3.bias"])

    if "model.residual_transform.weight" in state:
        put(("residual_transform", "kernel"), _conv1x1(state["model.residual_transform.weight"]))
    if "model.pos_embed" in state:
        put(("pos_embed",), state["model.pos_embed"])

    return {"params": {"model": model}}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="makani torch checkpoint (.tar)")
    parser.add_argument("--output", required=True, help="output orbax checkpoint dir")
    args = parser.parse_args()

    import os

    import orbax.checkpoint as ocp

    state = load_torch_checkpoint(args.input)
    params = convert_sfno_state_dict(state)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.output), params)
    ckptr.wait_until_finished()
    n = sum(v.size for v in __import__("jax").tree.leaves(params))
    print(f"converted {n} parameters -> {args.output}")


if __name__ == "__main__":
    main()
