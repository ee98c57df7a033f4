"""ONNX graph execution as a jitted JAX function (TPU-native onnxruntime).

The reference wraps exported graphs in an onnxruntime session
(``makani/models/onnx_wrapper.py:21-120``) — inference leaves the training
framework and runs on ORT's CPU/CUDA providers. Here the graph itself is
*compiled*: each ONNX node maps to the equivalent jax/lax op, shape-carrying
subgraphs (Shape → Gather → Concat → Reshape chains that torch exporters
emit) are constant-folded at trace time so everything stays static under
``jit``, and the initializers become a flax param pytree — so an imported
model shards, jits, and runs on TPU like any native one.

Usage::

    ex = OnnxGraphExecutor.from_file("model.onnx")
    params = ex.initializers                    # name -> np.ndarray
    outs = ex.run(params, {"input": x})         # jittable

or through the flax module :class:`OnnxModule` (initializers registered as
frozen flax params, so they device-put once and travel with the checkpoint).
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from makani_tpu.models.onnx_proto import DTYPE_TO_NP, GraphProto, ModelProto, load_model

__all__ = ["OnnxGraphExecutor", "OnnxModule"]


def _is_static(*vals) -> bool:
    return all(isinstance(v, (np.ndarray, np.generic, int, float, bool)) for v in vals)


def _xp(*vals):
    return np if _is_static(*vals) else jnp


def _axes_arg(attrs, inputs, idx, ndim, default=None):
    """axes come as an attribute (opset<13) or a (static) input (opset>=13)."""
    axes = attrs.get("axes")
    if axes is None and len(inputs) > idx and inputs[idx] is not None:
        axes = np.asarray(inputs[idx]).tolist()
    if axes is None:
        return default
    return tuple(int(a) % ndim if ndim else int(a) for a in np.atleast_1d(axes))


def _conv_pads(attrs, spatial_rank, lhs_shape, rhs_shape, strides, dilations):
    auto = attrs.get("auto_pad", "NOTSET")
    if auto in ("NOTSET", ""):
        pads = attrs.get("pads", [0] * (2 * spatial_rank))
        return [(int(pads[i]), int(pads[i + spatial_rank])) for i in range(spatial_rank)]
    if auto == "VALID":
        return [(0, 0)] * spatial_rank
    # SAME_UPPER / SAME_LOWER
    out = []
    for i in range(spatial_rank):
        in_sz = lhs_shape[2 + i]
        k = (rhs_shape[2 + i] - 1) * dilations[i] + 1
        o = -(-in_sz // strides[i])
        total = max(0, (o - 1) * strides[i] + k - in_sz)
        lo = total // 2 if auto == "SAME_UPPER" else total - total // 2
        out.append((lo, total - lo))
    return out


class OnnxGraphExecutor:
    """Executes a parsed ONNX graph with jax ops.

    Values flow through a name->value environment. numpy values are
    "static" (shape-carrying); ops whose inputs are all static evaluate in
    numpy at trace time, so torch's dynamic-reshape idioms compile to
    static-shape XLA programs. ``Shape`` always returns a static numpy
    array (shapes are static under jit).
    """

    def __init__(self, model: ModelProto):
        self.model = model
        self.graph: GraphProto = model.graph
        self.initializers: Dict[str, np.ndarray] = dict(self.graph.initializers)
        init_names = set(self.initializers)
        self.input_names: List[str] = [vi.name for vi in self.graph.inputs if vi.name not in init_names]
        self.output_names: List[str] = [vi.name for vi in self.graph.outputs]

    @classmethod
    def from_file(cls, path: str) -> "OnnxGraphExecutor":
        return cls(load_model(path))

    # -- op implementations -------------------------------------------------

    def _binary(self, fn):
        def impl(inputs, attrs):
            a, b = inputs
            return [fn(_xp(a, b), a, b)]

        return impl

    def run(self, initializers: Dict[str, jnp.ndarray], feeds: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        env: Dict[str, object] = {}
        # float initializers may arrive traced (flax params); integer ones
        # are shape/index-carrying and must stay static numpy regardless of
        # what the caller passed, or Reshape/Slice targets become tracers
        for k, v in self.initializers.items():
            env[k] = initializers.get(k, v) if np.issubdtype(v.dtype, np.floating) else v
        for k, v in feeds.items():
            env[k] = v

        for node in self.graph.nodes:
            impl = getattr(self, f"op_{node.op_type}", None)
            if impl is None:
                raise NotImplementedError(f"ONNX op {node.op_type} not supported")
            ins = [env[n] if n else None for n in node.inputs]
            outs = impl(ins, node.attrs())
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return [env[n] for n in self.output_names]

    # elementwise ----------------------------------------------------------
    def op_Add(self, inputs, attrs):
        return [_xp(*inputs).add(inputs[0], inputs[1])]

    def op_Sub(self, inputs, attrs):
        return [_xp(*inputs).subtract(inputs[0], inputs[1])]

    def op_Mul(self, inputs, attrs):
        return [_xp(*inputs).multiply(inputs[0], inputs[1])]

    def op_Div(self, inputs, attrs):
        a, b = inputs
        xp = _xp(a, b)
        if xp is np and np.issubdtype(np.asarray(a).dtype, np.integer) and np.issubdtype(np.asarray(b).dtype, np.integer):
            return [np.floor_divide(a, b)]
        return [xp.divide(a, b)]

    def op_Pow(self, inputs, attrs):
        return [_xp(*inputs).power(inputs[0], inputs[1].astype(np.asarray(inputs[0]).dtype) if _is_static(inputs[1]) else inputs[1])]

    def op_Sqrt(self, inputs, attrs):
        return [_xp(*inputs).sqrt(inputs[0])]

    def op_Exp(self, inputs, attrs):
        return [_xp(*inputs).exp(inputs[0])]

    def op_Log(self, inputs, attrs):
        return [_xp(*inputs).log(inputs[0])]

    def op_Neg(self, inputs, attrs):
        return [-inputs[0]]

    def op_Abs(self, inputs, attrs):
        return [_xp(*inputs).abs(inputs[0])]

    def op_Reciprocal(self, inputs, attrs):
        return [1.0 / inputs[0]]

    def op_Erf(self, inputs, attrs):
        x = inputs[0]
        return [jax.scipy.special.erf(jnp.asarray(x))]

    def op_Tanh(self, inputs, attrs):
        return [jnp.tanh(inputs[0])]

    def op_Sigmoid(self, inputs, attrs):
        return [jax.nn.sigmoid(jnp.asarray(inputs[0]))]

    def op_Relu(self, inputs, attrs):
        return [_xp(*inputs).maximum(inputs[0], 0)]

    def op_LeakyRelu(self, inputs, attrs):
        alpha = attrs.get("alpha", 0.01)
        x = jnp.asarray(inputs[0])
        return [jnp.where(x >= 0, x, alpha * x)]

    def op_Gelu(self, inputs, attrs):
        approx = attrs.get("approximate", "none") == "tanh"
        return [jax.nn.gelu(jnp.asarray(inputs[0]), approximate=approx)]

    def op_Softmax(self, inputs, attrs):
        axis = attrs.get("axis", -1)
        return [jax.nn.softmax(jnp.asarray(inputs[0]), axis=axis)]

    def op_Clip(self, inputs, attrs):
        x = inputs[0]
        lo = inputs[1] if len(inputs) > 1 and inputs[1] is not None else attrs.get("min")
        hi = inputs[2] if len(inputs) > 2 and inputs[2] is not None else attrs.get("max")
        if lo is not None:
            x = _xp(x, lo).maximum(x, lo)
        if hi is not None:
            x = _xp(x, hi).minimum(x, hi)
        return [x]

    def op_Min(self, inputs, attrs):
        out = inputs[0]
        for v in inputs[1:]:
            out = _xp(out, v).minimum(out, v)
        return [out]

    def op_Max(self, inputs, attrs):
        out = inputs[0]
        for v in inputs[1:]:
            out = _xp(out, v).maximum(out, v)
        return [out]

    def op_Where(self, inputs, attrs):
        return [_xp(*inputs).where(inputs[0], inputs[1], inputs[2])]

    def op_Equal(self, inputs, attrs):
        return [_xp(*inputs).equal(inputs[0], inputs[1])]

    def op_Greater(self, inputs, attrs):
        return [_xp(*inputs).greater(inputs[0], inputs[1])]

    def op_Less(self, inputs, attrs):
        return [_xp(*inputs).less(inputs[0], inputs[1])]

    def op_Not(self, inputs, attrs):
        return [_xp(*inputs).logical_not(inputs[0])]

    def op_And(self, inputs, attrs):
        return [_xp(*inputs).logical_and(inputs[0], inputs[1])]

    def op_Or(self, inputs, attrs):
        return [_xp(*inputs).logical_or(inputs[0], inputs[1])]

    def op_Xor(self, inputs, attrs):
        return [_xp(*inputs).logical_xor(inputs[0], inputs[1])]

    def op_GreaterOrEqual(self, inputs, attrs):
        return [_xp(*inputs).greater_equal(inputs[0], inputs[1])]

    def op_LessOrEqual(self, inputs, attrs):
        return [_xp(*inputs).less_equal(inputs[0], inputs[1])]

    def op_Sign(self, inputs, attrs):
        return [_xp(*inputs).sign(inputs[0])]

    def op_PRelu(self, inputs, attrs):
        x, slope = inputs
        xp = _xp(x, slope)
        return [xp.where(x >= 0, x, x * slope)]

    def op_Selu(self, inputs, attrs):
        a = attrs.get("alpha", 1.67326319217681884765625)
        g = attrs.get("gamma", 1.05070102214813232421875)
        x = jnp.asarray(inputs[0])
        return [g * jnp.where(x > 0, x, a * (jnp.exp(x) - 1.0))]

    def op_Mish(self, inputs, attrs):
        x = jnp.asarray(inputs[0])
        return [x * jnp.tanh(jax.nn.softplus(x))]

    def op_Sinh(self, inputs, attrs):
        return [_xp(*inputs).sinh(inputs[0])]

    def op_Cosh(self, inputs, attrs):
        return [_xp(*inputs).cosh(inputs[0])]

    def op_Tan(self, inputs, attrs):
        return [_xp(*inputs).tan(inputs[0])]

    def op_Atan(self, inputs, attrs):
        return [_xp(*inputs).arctan(inputs[0])]

    def op_LogSoftmax(self, inputs, attrs):
        axis = attrs.get("axis", -1)
        return [jax.nn.log_softmax(jnp.asarray(inputs[0]), axis=axis)]

    def op_CumSum(self, inputs, attrs):
        x = inputs[0]
        axis = int(np.asarray(inputs[1]))
        if attrs.get("exclusive", 0) or attrs.get("reverse", 0):
            xj = jnp.asarray(x)
            if attrs.get("reverse", 0):
                xj = jnp.flip(xj, axis)
            out = jnp.cumsum(xj, axis=axis)
            if attrs.get("exclusive", 0):
                out = out - xj
            if attrs.get("reverse", 0):
                out = jnp.flip(out, axis)
            return [out]
        return [_xp(x).cumsum(x, axis=axis)]

    def op_ArgMax(self, inputs, attrs):
        x = inputs[0]
        axis = attrs.get("axis", 0)
        keep = bool(attrs.get("keepdims", 1))
        xp = _xp(x)
        out = xp.argmax(x, axis=axis)
        if keep:
            out = xp.expand_dims(out, axis)
        return [out.astype(np.int64) if xp is np else out.astype(jnp.int64)]

    def op_ArgMin(self, inputs, attrs):
        x = inputs[0]
        axis = attrs.get("axis", 0)
        keep = bool(attrs.get("keepdims", 1))
        xp = _xp(x)
        out = xp.argmin(x, axis=axis)
        if keep:
            out = xp.expand_dims(out, axis)
        return [out.astype(np.int64) if xp is np else out.astype(jnp.int64)]

    def op_Trilu(self, inputs, attrs):
        x = inputs[0]
        k = int(np.asarray(inputs[1])) if len(inputs) > 1 and inputs[1] is not None else 0
        upper = bool(attrs.get("upper", 1))
        xp = _xp(x)
        return [xp.triu(x, k) if upper else xp.tril(x, k)]

    def op_Floor(self, inputs, attrs):
        return [_xp(*inputs).floor(inputs[0])]

    def op_Ceil(self, inputs, attrs):
        return [_xp(*inputs).ceil(inputs[0])]

    def op_Round(self, inputs, attrs):
        # ONNX Round: half-to-even, numpy/jnp .round matches
        return [_xp(*inputs).round(inputs[0])]

    def op_Sin(self, inputs, attrs):
        return [_xp(*inputs).sin(inputs[0])]

    def op_Cos(self, inputs, attrs):
        return [_xp(*inputs).cos(inputs[0])]

    def op_Mod(self, inputs, attrs):
        a, b = inputs
        if attrs.get("fmod", 0):
            return [_xp(a, b).fmod(a, b)]
        return [_xp(a, b).mod(a, b)]

    def op_Softplus(self, inputs, attrs):
        return [jax.nn.softplus(jnp.asarray(inputs[0]))]

    def op_HardSigmoid(self, inputs, attrs):
        alpha = attrs.get("alpha", 0.2)
        beta = attrs.get("beta", 0.5)
        return [jnp.clip(alpha * jnp.asarray(inputs[0]) + beta, 0.0, 1.0)]

    def op_Elu(self, inputs, attrs):
        alpha = attrs.get("alpha", 1.0)
        x = jnp.asarray(inputs[0])
        return [jnp.where(x > 0, x, alpha * (jnp.exp(x) - 1.0))]

    def op_Cast(self, inputs, attrs):
        to = DTYPE_TO_NP[attrs["to"]]
        x = inputs[0]
        if _is_static(x):
            return [np.asarray(x).astype(to)]
        return [jnp.asarray(x).astype(to)]

    def op_Identity(self, inputs, attrs):
        return [inputs[0]]

    def op_Dropout(self, inputs, attrs):
        return [inputs[0], None]

    # reductions -----------------------------------------------------------
    def _reduce(self, fn_name):
        def impl(inputs, attrs):
            x = inputs[0]
            nd = np.ndim(x)
            axes = _axes_arg(attrs, inputs, 1, nd, default=tuple(range(nd)))
            keep = bool(attrs.get("keepdims", 1))
            xp = _xp(x)
            return [getattr(xp, fn_name)(x, axis=axes, keepdims=keep)]

        return impl

    def op_ReduceMean(self, inputs, attrs):
        return self._reduce("mean")(inputs, attrs)

    def op_ReduceSum(self, inputs, attrs):
        return self._reduce("sum")(inputs, attrs)

    def op_ReduceMax(self, inputs, attrs):
        return self._reduce("max")(inputs, attrs)

    def op_ReduceMin(self, inputs, attrs):
        return self._reduce("min")(inputs, attrs)

    def op_ReduceProd(self, inputs, attrs):
        return self._reduce("prod")(inputs, attrs)

    # shape manipulation ---------------------------------------------------
    def op_Shape(self, inputs, attrs):
        shape = np.shape(inputs[0])
        start = attrs.get("start", 0)
        end = attrs.get("end", len(shape))
        return [np.asarray(shape[start:end], dtype=np.int64)]

    def op_Size(self, inputs, attrs):
        return [np.asarray(int(np.prod(np.shape(inputs[0]))), dtype=np.int64)]

    def op_Reshape(self, inputs, attrs):
        x, shape = inputs
        if not _is_static(shape):
            raise ValueError("Reshape with traced shape is not supported under jit")
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        if attrs.get("allowzero", 0) == 0:
            shape = [np.shape(x)[i] if s == 0 else s for i, s in enumerate(shape)]
        return [_xp(x).reshape(x, shape)]

    def op_Flatten(self, inputs, attrs):
        x = inputs[0]
        axis = attrs.get("axis", 1) % (np.ndim(x) + 1)
        shp = np.shape(x)
        return [_xp(x).reshape(x, (int(np.prod(shp[:axis], dtype=np.int64)), int(np.prod(shp[axis:], dtype=np.int64))))]

    def op_Transpose(self, inputs, attrs):
        x = inputs[0]
        perm = attrs.get("perm", tuple(reversed(range(np.ndim(x)))))
        return [_xp(x).transpose(x, perm)]

    def op_Squeeze(self, inputs, attrs):
        x = inputs[0]
        axes = _axes_arg(attrs, inputs, 1, np.ndim(x))
        if axes is None:
            axes = tuple(i for i, d in enumerate(np.shape(x)) if d == 1)
        return [_xp(x).squeeze(x, axis=tuple(axes))]

    def op_Unsqueeze(self, inputs, attrs):
        x = inputs[0]
        nd = np.ndim(x) + len(attrs.get("axes", []) or np.atleast_1d(np.asarray(inputs[1])).tolist())
        axes = _axes_arg(attrs, inputs, 1, nd)
        xp = _xp(x)
        for a in sorted(axes):
            x = xp.expand_dims(x, a)
        return [x]

    def op_Concat(self, inputs, attrs):
        return [_xp(*inputs).concatenate(inputs, axis=attrs.get("axis", 0))]

    def op_Split(self, inputs, attrs):
        x = inputs[0]
        axis = attrs.get("axis", 0)
        splits = attrs.get("split")
        if splits is None and len(inputs) > 1 and inputs[1] is not None:
            splits = np.asarray(inputs[1]).tolist()
        xp = _xp(x)
        if splits is None:
            n = attrs.get("num_outputs", 2)
            return list(xp.split(x, n, axis=axis))
        idx = np.cumsum(splits)[:-1].tolist()
        return list(xp.split(x, idx, axis=axis))

    def op_Slice(self, inputs, attrs):
        x = inputs[0]
        nd = np.ndim(x)
        if len(inputs) > 1:  # opset >= 10: starts/ends/axes/steps inputs
            starts = np.asarray(inputs[1]).reshape(-1).tolist()
            ends = np.asarray(inputs[2]).reshape(-1).tolist()
            axes = np.asarray(inputs[3]).reshape(-1).tolist() if len(inputs) > 3 and inputs[3] is not None else list(range(len(starts)))
            steps = np.asarray(inputs[4]).reshape(-1).tolist() if len(inputs) > 4 and inputs[4] is not None else [1] * len(starts)
        else:
            starts = list(attrs["starts"])
            ends = list(attrs["ends"])
            axes = list(attrs.get("axes", range(len(starts))))
            steps = [1] * len(starts)
        sl = [slice(None)] * nd
        for s, e, a, st in zip(starts, ends, axes, steps):
            a = int(a) % nd
            INT64_MAX = (1 << 63) - 1
            e = None if e >= INT64_MAX else int(e)
            s = int(s)
            if st < 0 and e is not None and e <= -INT64_MAX + 1:
                e = None
            sl[a] = slice(s, e, int(st))
        return [x[tuple(sl)]]

    def op_Gather(self, inputs, attrs):
        x, idx = inputs
        axis = attrs.get("axis", 0)
        xp = _xp(x, idx)
        return [xp.take(x, idx if np.ndim(idx) else int(np.asarray(idx)) if _is_static(idx) else idx, axis=axis)]

    def op_GatherElements(self, inputs, attrs):
        x, idx = inputs
        axis = attrs.get("axis", 0)
        return [jnp.take_along_axis(jnp.asarray(x), jnp.asarray(idx), axis=axis)]

    def op_Expand(self, inputs, attrs):
        x, shape = inputs
        shape = [int(s) for s in np.asarray(shape).reshape(-1)]
        xshape = list(np.shape(x))
        # ONNX Expand: broadcast with numpy rules; dim of 1 in shape keeps x's
        nd = max(len(shape), len(xshape))
        shape = [1] * (nd - len(shape)) + shape
        xshape = [1] * (nd - len(xshape)) + xshape
        tgt = [max(s, d) for s, d in zip(shape, xshape)]
        return [_xp(x).broadcast_to(_xp(x).reshape(x, xshape), tgt)]

    def op_Tile(self, inputs, attrs):
        x, reps = inputs
        return [_xp(x).tile(x, tuple(int(r) for r in np.asarray(reps).reshape(-1)))]

    def op_Range(self, inputs, attrs):
        s, e, d = (np.asarray(v).item() for v in inputs)
        return [np.arange(s, e, d)]

    def op_Constant(self, inputs, attrs):
        if "value" in attrs:
            return [attrs["value"]]
        for k in ("value_float", "value_int"):
            if k in attrs:
                return [np.asarray(attrs[k])]
        if "value_floats" in attrs:
            return [np.asarray(attrs["value_floats"], dtype=np.float32)]
        if "value_ints" in attrs:
            return [np.asarray(attrs["value_ints"], dtype=np.int64)]
        raise ValueError("Constant node without value")

    def op_ConstantOfShape(self, inputs, attrs):
        shape = tuple(int(s) for s in np.asarray(inputs[0]).reshape(-1))
        val = attrs.get("value", np.zeros(1, np.float32))
        return [np.full(shape, np.asarray(val).reshape(-1)[0])]

    def op_Pad(self, inputs, attrs):
        x = inputs[0]
        nd = np.ndim(x)
        mode = attrs.get("mode", "constant")
        if len(inputs) > 1 and inputs[1] is not None:
            pads = np.asarray(inputs[1]).reshape(-1).tolist()
            cval = float(np.asarray(inputs[2]).reshape(-1)[0]) if len(inputs) > 2 and inputs[2] is not None else 0.0
        else:
            pads = list(attrs["pads"])
            cval = attrs.get("value", 0.0)
        widths = [(int(pads[i]), int(pads[i + nd])) for i in range(nd)]
        xp = _xp(x)
        mode_map = {"constant": "constant", "reflect": "reflect", "edge": "edge", "wrap": "wrap"}
        if mode == "constant":
            return [xp.pad(x, widths, mode="constant", constant_values=cval)]
        return [xp.pad(x, widths, mode=mode_map[mode])]

    # linear algebra / nn --------------------------------------------------
    def op_MatMul(self, inputs, attrs):
        return [jnp.matmul(jnp.asarray(inputs[0]), jnp.asarray(inputs[1]))]

    def op_Einsum(self, inputs, attrs):
        return [jnp.einsum(attrs["equation"], *[jnp.asarray(x) for x in inputs])]

    def op_Gemm(self, inputs, attrs):
        a, b = jnp.asarray(inputs[0]), jnp.asarray(inputs[1])
        if attrs.get("transA", 0):
            a = a.T
        if attrs.get("transB", 0):
            b = b.T
        y = attrs.get("alpha", 1.0) * (a @ b)
        if len(inputs) > 2 and inputs[2] is not None:
            y = y + attrs.get("beta", 1.0) * inputs[2]
        return [y]

    def op_Conv(self, inputs, attrs):
        x, w = jnp.asarray(inputs[0]), jnp.asarray(inputs[1])
        rank = w.ndim - 2
        strides = tuple(attrs.get("strides", [1] * rank))
        dilations = tuple(attrs.get("dilations", [1] * rank))
        groups = attrs.get("group", 1)
        pads = _conv_pads(attrs, rank, x.shape, w.shape, strides, dilations)
        dn = ("NC" + "DHW"[-rank:], "OI" + "DHW"[-rank:], "NC" + "DHW"[-rank:])
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=pads, rhs_dilation=dilations,
            dimension_numbers=dn, feature_group_count=groups,
        )
        if len(inputs) > 2 and inputs[2] is not None:
            b = jnp.asarray(inputs[2]).reshape((1, -1) + (1,) * rank)
            y = y + b
        return [y]

    def op_ConvTranspose(self, inputs, attrs):
        x, w = jnp.asarray(inputs[0]), jnp.asarray(inputs[1])
        rank = w.ndim - 2
        strides = tuple(attrs.get("strides", [1] * rank))
        dilations = tuple(attrs.get("dilations", [1] * rank))
        groups = attrs.get("group", 1)
        pads = attrs.get("pads", [0] * 2 * rank)
        out_pads = attrs.get("output_padding", [0] * rank)
        # ONNX ConvTranspose weight is (C_in, C_out/groups, *k); grad-of-conv
        # formulation: lhs-dilate by stride, pad by k-1-p, flip kernel
        k = w.shape[2:]
        pad_cfg = []
        for i in range(rank):
            lo = dilations[i] * (k[i] - 1) - pads[i]
            hi = dilations[i] * (k[i] - 1) - pads[i + rank] + out_pads[i]
            pad_cfg.append((lo, hi))
        wt = jnp.flip(w, axis=tuple(range(2, 2 + rank)))
        if groups > 1:
            ci, cog = w.shape[0], w.shape[1]
            wt = wt.reshape((groups, ci // groups, cog) + k)
            wt = jnp.moveaxis(wt, 2, 1).reshape((groups * cog, ci // groups) + k)
        else:
            wt = jnp.swapaxes(wt, 0, 1)
        dn = ("NC" + "DHW"[-rank:], "OI" + "DHW"[-rank:], "NC" + "DHW"[-rank:])
        y = jax.lax.conv_general_dilated(
            x, wt, window_strides=(1,) * rank, padding=pad_cfg,
            lhs_dilation=strides, rhs_dilation=dilations,
            dimension_numbers=dn, feature_group_count=groups,
        )
        if len(inputs) > 2 and inputs[2] is not None:
            y = y + jnp.asarray(inputs[2]).reshape((1, -1) + (1,) * rank)
        return [y]

    def op_LayerNormalization(self, inputs, attrs):
        x = jnp.asarray(inputs[0])
        axis = attrs.get("axis", -1) % x.ndim
        eps = attrs.get("epsilon", 1e-5)
        axes = tuple(range(axis, x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + eps)
        scale = inputs[1]
        if scale is not None:
            y = y * scale
        if len(inputs) > 2 and inputs[2] is not None:
            y = y + inputs[2]
        return [y]

    def op_InstanceNormalization(self, inputs, attrs):
        x = jnp.asarray(inputs[0])
        eps = attrs.get("epsilon", 1e-5)
        axes = tuple(range(2, x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=axes, keepdims=True)
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return [(x - mu) * jax.lax.rsqrt(var + eps) * inputs[1].reshape(shape) + inputs[2].reshape(shape)]

    def op_BatchNormalization(self, inputs, attrs):
        x = jnp.asarray(inputs[0])
        eps = attrs.get("epsilon", 1e-5)
        scale, bias, mean, var = inputs[1:5]
        shape = (1, -1) + (1,) * (x.ndim - 2)
        return [(x - mean.reshape(shape)) * jax.lax.rsqrt(jnp.asarray(var).reshape(shape) + eps) * scale.reshape(shape) + bias.reshape(shape)]

    def _pool(self, reducer, init, attrs, x, is_avg=False):
        x = jnp.asarray(x)
        rank = x.ndim - 2
        k = tuple(attrs["kernel_shape"])
        strides = tuple(attrs.get("strides", [1] * rank))
        pads = attrs.get("pads", [0] * 2 * rank)
        pad_cfg = [(0, 0), (0, 0)] + [(int(pads[i]), int(pads[i + rank])) for i in range(rank)]
        dims = (1, 1) + k
        strd = (1, 1) + strides
        y = jax.lax.reduce_window(x, init, reducer, dims, strd, pad_cfg)
        if is_avg:
            ones = jnp.ones(x.shape[:1] + (1,) + x.shape[2:], x.dtype)
            cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, dims, strd, pad_cfg) if attrs.get("count_include_pad", 0) == 0 else float(np.prod(k))
            y = y / cnt
        return [y]

    def op_MaxPool(self, inputs, attrs):
        return self._pool(jax.lax.max, -jnp.inf, attrs, inputs[0])

    def op_AveragePool(self, inputs, attrs):
        return self._pool(jax.lax.add, 0.0, attrs, inputs[0], is_avg=True)

    def op_GlobalAveragePool(self, inputs, attrs):
        x = jnp.asarray(inputs[0])
        return [jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)]

    def op_Resize(self, inputs, attrs):
        x = jnp.asarray(inputs[0])
        mode = attrs.get("mode", "nearest")
        sizes = None
        if len(inputs) > 3 and inputs[3] is not None:
            sizes = [int(s) for s in np.asarray(inputs[3]).reshape(-1)]
        elif len(inputs) > 2 and inputs[2] is not None:
            scales = np.asarray(inputs[2]).reshape(-1)
            sizes = [int(math.floor(d * s)) for d, s in zip(x.shape, scales)]
        method = {"nearest": "nearest", "linear": "linear", "cubic": "cubic"}[mode]
        return [jax.image.resize(x, tuple(sizes), method=method)]


_EXECUTOR_CACHE: Dict[str, OnnxGraphExecutor] = {}


def _get_executor(onnx_file: str) -> OnnxGraphExecutor:
    if onnx_file not in _EXECUTOR_CACHE:
        _EXECUTOR_CACHE[onnx_file] = OnnxGraphExecutor.from_file(onnx_file)
    return _EXECUTOR_CACHE[onnx_file]


class OnnxModule(nn.Module):
    """Flax wrapper: ONNX initializers become frozen flax params.

    The param tree key layout is flat ``{sanitized_name: array}`` — imported
    once from the file at init, then carried/device-put/sharded like any
    native model's params (the TPU-side answer to the reference's ORT
    session, which re-uploads weights per provider).
    """

    onnx_file: str

    @staticmethod
    def _sanitize(name: str) -> str:
        return name.replace(".", "_").replace("/", "_").replace(":", "_")

    @nn.compact
    def __call__(self, feeds: Dict[str, jnp.ndarray]) -> List[jnp.ndarray]:
        ex = _get_executor(self.onnx_file)
        inits = {}
        for name, arr in ex.initializers.items():
            # shape/index-carrying int tensors must stay static numpy (they
            # feed Reshape/Slice); only float weights become flax params
            if np.issubdtype(arr.dtype, np.floating) and arr.size > 0:
                inits[name] = self.param(self._sanitize(name), lambda *_: arr)
            else:
                inits[name] = arr
        return ex.run(inits, feeds)
