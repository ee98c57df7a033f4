"""ONNX import stack: proto round-trip, op parity vs torch, Pangu wrapper.

The environment has no ``onnx`` package (torch.onnx.export needs it for
serialization), so graphs are authored with the repo's own writer
(``models/onnx_proto.py``) — the same wire format exporters emit — and
expected outputs are computed with torch modules on the same weights.
Covers ref makani/models/onnx_wrapper.py + pangu_onnx.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from makani_tpu.models import onnx_proto as op
from makani_tpu.models.onnx_wrapper import OnnxGraphExecutor, OnnxModule
from makani_tpu.models.networks.pangu_onnx import PanguOnnx

torch = pytest.importorskip("torch")

F32 = 1
I64 = 7


def _run(model_bytes, feeds):
    ex = OnnxGraphExecutor(op.load_model(model_bytes))
    outs = jax.jit(lambda p, f: ex.run(p, f))(ex.initializers, feeds)
    return [np.asarray(o) for o in outs]


def test_proto_roundtrip():
    w = np.random.randn(4, 3).astype(np.float32)
    idx = np.array([2, 0, 1], dtype=np.int64)
    g = op.make_graph(
        nodes=[
            op.make_node("Gemm", ["x", "w"], ["y"], transB=1, alpha=1.0),
            op.make_node("Gather", ["y", "idx"], ["z"], axis=1),
        ],
        name="g",
        inputs=[("x", F32, (2, 3))],
        outputs=[("z", F32, (2, 3))],
        initializers=[("w", w), ("idx", idx)],
    )
    data = op.save_model(op.make_model(g))
    m = op.load_model(data)
    assert [n.op_type for n in m.graph.nodes] == ["Gemm", "Gather"]
    assert m.graph.nodes[0].attrs()["transB"] == 1
    assert m.graph.nodes[0].attrs()["alpha"] == 1.0
    np.testing.assert_array_equal(m.graph.initializers["w"], w)
    np.testing.assert_array_equal(m.graph.initializers["idx"], idx)
    assert [vi.name for vi in m.graph.inputs] == ["x"]
    assert m.graph.inputs[0].shape == (2, 3)


def test_mlp_parity_vs_torch():
    """Gemm + decomposed GELU (erf form) + decomposed LayerNorm — the idiom
    torch's exporter emits for nn.Linear/GELU/LayerNorm."""
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal((16, 8)).astype(np.float32) * 0.2
    b1 = rng.standard_normal(16).astype(np.float32)
    ln_w = rng.standard_normal(16).astype(np.float32)
    ln_b = rng.standard_normal(16).astype(np.float32)
    x = rng.standard_normal((5, 8)).astype(np.float32)

    nodes = [
        op.make_node("Gemm", ["x", "w1", "b1"], ["h0"], transB=1),
        # gelu(x) = x * 0.5 * (1 + erf(x / sqrt(2)))
        op.make_node("Div", ["h0", "sqrt2"], ["g0"]),
        op.make_node("Erf", ["g0"], ["g1"]),
        op.make_node("Add", ["g1", "one"], ["g2"]),
        op.make_node("Mul", ["h0", "g2"], ["g3"]),
        op.make_node("Mul", ["g3", "half"], ["h1"]),
        # layernorm decomposed
        op.make_node("ReduceMean", ["h1"], ["mu"], axes=[-1], keepdims=1),
        op.make_node("Sub", ["h1", "mu"], ["xc"]),
        op.make_node("Pow", ["xc", "two"], ["x2"]),
        op.make_node("ReduceMean", ["x2"], ["var"], axes=[-1], keepdims=1),
        op.make_node("Add", ["var", "eps"], ["ve"]),
        op.make_node("Sqrt", ["ve"], ["sd"]),
        op.make_node("Div", ["xc", "sd"], ["xn"]),
        op.make_node("Mul", ["xn", "ln_w"], ["xs"]),
        op.make_node("Add", ["xs", "ln_b"], ["out"]),
    ]
    inits = [
        ("w1", w1), ("b1", b1), ("ln_w", ln_w), ("ln_b", ln_b),
        ("sqrt2", np.float32(np.sqrt(2.0))), ("one", np.float32(1.0)),
        ("half", np.float32(0.5)), ("two", np.float32(2.0)), ("eps", np.float32(1e-5)),
    ]
    g = op.make_graph(nodes, "mlp", [("x", F32, x.shape)], [("out", F32, (5, 16))], inits)
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})

    with torch.no_grad():
        lin = torch.nn.Linear(8, 16)
        lin.weight.copy_(torch.from_numpy(w1))
        lin.bias.copy_(torch.from_numpy(b1))
        ln = torch.nn.LayerNorm(16)
        ln.weight.copy_(torch.from_numpy(ln_w))
        ln.bias.copy_(torch.from_numpy(ln_b))
        want = ln(torch.nn.functional.gelu(lin(torch.from_numpy(x)))).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_fused_layernorm_and_gelu_ops():
    """Opset-17 fused LayerNormalization + opset-20 Gelu nodes."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 4, 6)).astype(np.float32)
    w = rng.standard_normal(6).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    nodes = [
        op.make_node("LayerNormalization", ["x", "w", "b"], ["h"], axis=-1, epsilon=1e-5),
        op.make_node("Gelu", ["h"], ["out"]),
    ]
    g = op.make_graph(nodes, "ln", [("x", F32, x.shape)], [("out", F32, x.shape)], [("w", w), ("b", b)])
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})
    with torch.no_grad():
        ln = torch.nn.LayerNorm(6)
        ln.weight.copy_(torch.from_numpy(w))
        ln.bias.copy_(torch.from_numpy(b))
        want = torch.nn.functional.gelu(ln(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("groups,strides,pads", [(1, (1, 1), (1, 1, 1, 1)), (2, (2, 2), (0, 1, 0, 1))])
def test_conv_parity_vs_torch(groups, strides, pads):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 9, 10)).astype(np.float32)
    w = rng.standard_normal((6, 4 // groups, 3, 3)).astype(np.float32)
    b = rng.standard_normal(6).astype(np.float32)
    nodes = [op.make_node("Conv", ["x", "w", "b"], ["y"], strides=list(strides), pads=list(pads), group=groups)]
    g = op.make_graph(nodes, "conv", [("x", F32, x.shape)], [("y", F32, (1,))], [("w", w), ("b", b)])
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})
    with torch.no_grad():
        want = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=strides, padding=(pads[0], pads[1]), groups=groups,
        ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_conv_transpose_parity_vs_torch():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 7, 8)).astype(np.float32)
    w = rng.standard_normal((4, 3, 2, 2)).astype(np.float32)  # (C_in, C_out, kh, kw)
    nodes = [op.make_node("ConvTranspose", ["x", "w"], ["y"], strides=[2, 2])]
    g = op.make_graph(nodes, "convT", [("x", F32, x.shape)], [("y", F32, (1,))], [("w", w)])
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})
    with torch.no_grad():
        want = torch.nn.functional.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w), stride=2).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_attention_block_parity_vs_torch():
    """MatMul/Transpose/Reshape/Softmax — a single-head attention in ONNX."""
    rng = np.random.default_rng(4)
    d = 8
    x = rng.standard_normal((2, 5, d)).astype(np.float32)
    wq = rng.standard_normal((d, d)).astype(np.float32) * 0.3
    wk = rng.standard_normal((d, d)).astype(np.float32) * 0.3
    wv = rng.standard_normal((d, d)).astype(np.float32) * 0.3
    nodes = [
        op.make_node("MatMul", ["x", "wq"], ["q"]),
        op.make_node("MatMul", ["x", "wk"], ["k"]),
        op.make_node("MatMul", ["x", "wv"], ["v"]),
        op.make_node("Transpose", ["k"], ["kt"], perm=[0, 2, 1]),
        op.make_node("MatMul", ["q", "kt"], ["qk"]),
        op.make_node("Div", ["qk", "scale"], ["qks"]),
        op.make_node("Softmax", ["qks"], ["attn"], axis=-1),
        op.make_node("MatMul", ["attn", "v"], ["out"]),
    ]
    inits = [("wq", wq), ("wk", wk), ("wv", wv), ("scale", np.float32(np.sqrt(d)))]
    g = op.make_graph(nodes, "attn", [("x", F32, x.shape)], [("out", F32, x.shape)], inits)
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})
    xt = torch.from_numpy(x)
    with torch.no_grad():
        q, k, v = xt @ torch.from_numpy(wq), xt @ torch.from_numpy(wk), xt @ torch.from_numpy(wv)
        want = (torch.softmax(q @ k.transpose(1, 2) / np.sqrt(d), dim=-1) @ v).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_shape_subgraph_constant_folds_under_jit():
    """Shape -> Gather -> Concat -> Reshape (torch's dynamic-flatten idiom)
    must evaluate statically so the graph stays jittable."""
    x = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    nodes = [
        op.make_node("Shape", ["x"], ["shp"]),
        op.make_node("Gather", ["shp", "zero"], ["b"], axis=0),
        op.make_node("Unsqueeze", ["b", "ax0"], ["b1"]),
        op.make_node("Concat", ["b1", "minus1"], ["tgt"], axis=0),
        op.make_node("Reshape", ["x", "tgt"], ["out"]),
    ]
    inits = [
        ("zero", np.array(0, dtype=np.int64)),
        ("ax0", np.array([0], dtype=np.int64)),
        ("minus1", np.array([-1], dtype=np.int64)),
    ]
    g = op.make_graph(nodes, "dyn", [("x", F32, x.shape)], [("out", F32, (2, 12))], inits)
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})
    np.testing.assert_array_equal(got, x.reshape(2, 12))


def test_slice_pad_split_ops():
    x = np.arange(40, dtype=np.float32).reshape(2, 4, 5)
    nodes = [
        op.make_node("Slice", ["x", "st", "en", "ax", "stp"], ["s"]),
        op.make_node("Pad", ["s", "pads"], ["p"]),
        op.make_node("Split", ["p"], ["a", "b"], axis=1, num_outputs=2),
    ]
    inits = [
        ("st", np.array([1], dtype=np.int64)),
        ("en", np.array([(1 << 63) - 1], dtype=np.int64)),
        ("ax", np.array([2], dtype=np.int64)),
        ("stp", np.array([2], dtype=np.int64)),
        ("pads", np.array([0, 0, 0, 0, 0, 1], dtype=np.int64)),
    ]
    g = op.make_graph(nodes, "spp", [("x", F32, x.shape)], [("a", F32, (1,)), ("b", F32, (1,))], inits)
    a, b = _run(op.save_model(op.make_model(g)), {"x": x})
    want = np.pad(x[:, :, 1::2], ((0, 0), (0, 0), (0, 1)))
    np.testing.assert_array_equal(a, want[:, :2])
    np.testing.assert_array_equal(b, want[:, 2:])


def _tiny_pangu_graph(n_surf, n_atmo_vars, n_groups, lat, lon, seed=0):
    """A linear stand-in for the released graph: per-channel scale + bias on
    both inputs, same input/output names as the official export."""
    rng = np.random.default_rng(seed)
    ws = rng.standard_normal((n_surf, 1, 1)).astype(np.float32)
    wa = rng.standard_normal((n_atmo_vars, n_groups, 1, 1)).astype(np.float32)
    nodes = [
        op.make_node("Mul", ["input", "wa"], ["output"]),
        op.make_node("Mul", ["input_surface", "ws"], ["output_surface"]),
    ]
    g = op.make_graph(
        nodes, "pangu_tiny",
        [("input", F32, (n_atmo_vars, n_groups, lat, lon)), ("input_surface", F32, (n_surf, lat, lon))],
        [("output", F32, (n_atmo_vars, n_groups, lat, lon)), ("output_surface", F32, (n_surf, lat, lon))],
        [("ws", ws), ("wa", wa)],
    )
    return op.make_model(g), ws, wa


def test_pangu_onnx_wrapper(tmp_path):
    """Channel regrouping round-trip: flat stack -> (surface, atmo-by-level)
    -> flat stack, weights applied to the right channels."""
    channel_names = ["u10m", "v10m", "t2m", "z500", "t500", "z850", "t850"]
    # atmo: z500,t500 (level 500), z850,t850 (level 850) -> 2 vars x 2 groups
    lat, lon = 6, 8
    model, ws, wa = _tiny_pangu_graph(3, 2, 2, lat, lon)
    f = str(tmp_path / "tiny_pangu.onnx")
    op.save_model(model, f)

    m = PanguOnnx(inp_shape=(lat, lon), channel_names=tuple(channel_names), onnx_file=f)
    x = np.random.default_rng(5).standard_normal((1, 7, lat, lon)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(jax.jit(m.apply)(params, jnp.asarray(x)))

    assert y.shape == x.shape
    # surface channels (indices 0,1,2) scaled by ws
    np.testing.assert_allclose(y[0, :3], x[0, :3] * ws, atol=1e-6)
    # atmo: groups are (z500,t500), (z850,t850); graph layout (var, group)
    # var 0 = z, var 1 = t; group 0 = 500, group 1 = 850
    np.testing.assert_allclose(y[0, 3], x[0, 3] * wa[0, 0], atol=1e-6)  # z500
    np.testing.assert_allclose(y[0, 4], x[0, 4] * wa[1, 0], atol=1e-6)  # t500
    np.testing.assert_allclose(y[0, 5], x[0, 5] * wa[0, 1], atol=1e-6)  # z850
    np.testing.assert_allclose(y[0, 6], x[0, 6] * wa[1, 1], atol=1e-6)  # t850


def test_onnx_module_params_in_tree(tmp_path):
    """Float initializers become flax params (device-put once, shardable)."""
    model, _, _ = _tiny_pangu_graph(2, 1, 2, 4, 4, seed=7)
    f = str(tmp_path / "m.onnx")
    op.save_model(model, f)
    mod = OnnxModule(onnx_file=f)
    feeds = {
        "input": jnp.ones((1, 2, 4, 4), jnp.float32),
        "input_surface": jnp.ones((2, 4, 4), jnp.float32),
    }
    params = mod.init(jax.random.PRNGKey(0), feeds)
    leaves = params["params"]
    assert set(leaves) == {"ws", "wa"}
    outs = mod.apply(params, feeds)
    assert len(outs) == 2


def test_registry_builds_pangu_onnx(tmp_path):
    from makani_tpu.models.model_registry import get_model_handle

    handle = get_model_handle("PanguOnnx")
    assert handle is PanguOnnx


def test_pool_and_resize_ops():
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 2, 6, 6)).astype(np.float32)
    nodes = [
        op.make_node("MaxPool", ["x"], ["mp"], kernel_shape=[2, 2], strides=[2, 2]),
        op.make_node("AveragePool", ["x"], ["ap"], kernel_shape=[2, 2], strides=[2, 2]),
    ]
    g = op.make_graph(nodes, "pool", [("x", F32, x.shape)], [("mp", F32, (1,)), ("ap", F32, (1,))], [])
    mp, ap = _run(op.save_model(op.make_model(g)), {"x": x})
    with torch.no_grad():
        xt = torch.from_numpy(x)
        np.testing.assert_allclose(mp, torch.nn.functional.max_pool2d(xt, 2).numpy(), atol=1e-6)
        np.testing.assert_allclose(ap, torch.nn.functional.avg_pool2d(xt, 2).numpy(), atol=1e-6)


def test_conv_transpose_grouped_parity_vs_torch():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 4, 6, 5)).astype(np.float32)
    w = rng.standard_normal((4, 3, 2, 3)).astype(np.float32)  # (C_in, C_out/g, kh, kw), g=2
    b = rng.standard_normal(6).astype(np.float32)
    nodes = [op.make_node("ConvTranspose", ["x", "w", "b"], ["y"], strides=[2, 1], group=2, pads=[1, 0, 1, 0])]
    g = op.make_graph(nodes, "convTg", [("x", F32, x.shape)], [("y", F32, (1,))], [("w", w), ("b", b)])
    (got,) = _run(op.save_model(op.make_model(g)), {"x": x})
    with torch.no_grad():
        want = torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=(2, 1), padding=(1, 0), groups=2,
        ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_additional_elementwise_ops_vs_torch():
    rng = np.random.default_rng(10)
    x = rng.standard_normal((3, 5)).astype(np.float32) * 2.0
    nodes = [
        op.make_node("Floor", ["x"], ["f"]),
        op.make_node("Ceil", ["x"], ["c"]),
        op.make_node("Sin", ["x"], ["s"]),
        op.make_node("Cos", ["x"], ["co"]),
        op.make_node("Softplus", ["x"], ["sp"]),
        op.make_node("Elu", ["x"], ["el"], alpha=1.0),
        op.make_node("HardSigmoid", ["x"], ["hs"], alpha=0.2, beta=0.5),
    ]
    outs = [(n, F32, x.shape) for n in ("f", "c", "s", "co", "sp", "el", "hs")]
    g = op.make_graph(nodes, "elem", [("x", F32, x.shape)], outs, [])
    f, c, s, co, sp, el, hs = _run(op.save_model(op.make_model(g)), {"x": x})
    xt = torch.from_numpy(x)
    with torch.no_grad():
        np.testing.assert_allclose(f, np.floor(x), atol=1e-6)
        np.testing.assert_allclose(c, np.ceil(x), atol=1e-6)
        np.testing.assert_allclose(s, np.sin(x), atol=1e-6)
        np.testing.assert_allclose(co, np.cos(x), atol=1e-6)
        np.testing.assert_allclose(sp, torch.nn.functional.softplus(xt).numpy(), atol=1e-5)
        np.testing.assert_allclose(el, torch.nn.functional.elu(xt).numpy(), atol=1e-5)
        # ONNX HardSigmoid(alpha=0.2) != torch's (alpha=1/6): check the formula
        np.testing.assert_allclose(hs, np.clip(0.2 * x + 0.5, 0.0, 1.0), atol=1e-6)


def test_fp16_bf16_typed_field_initializers():
    # typed-field (int32_data) fp16/bf16 hold raw bit patterns packed
    # one-per-int32 (ONNX TensorProto spec), not numeric values
    vals = np.array([1.0, -2.5, 0.15625, 65504.0], dtype=np.float16)
    bits = vals.view(np.uint16)
    t = op.TensorProto(name="w", dims=(4,), data_type=10, int32_data=[int(b) for b in bits])
    np.testing.assert_array_equal(t.to_numpy(), vals)

    bvals = np.array([1.0, -2.5, 0.15625], dtype=np.float32)
    bbits = (bvals.view(np.uint32) >> 16).astype(np.uint16)
    tb = op.TensorProto(name="wb", dims=(3,), data_type=16, int32_data=[int(b) for b in bbits])
    np.testing.assert_array_equal(tb.to_numpy(), bvals)

    # raw_data fp16 path still exact
    tr = op.TensorProto(name="wr", dims=(4,), data_type=10, raw_data=vals.tobytes())
    np.testing.assert_array_equal(tr.to_numpy(), vals)


def test_logical_comparison_and_misc_ops_vs_torch():
    """And/Or/Xor, ordered comparisons, Sign, PRelu, Selu, Mish, hyperbolic
    trig, LogSoftmax, CumSum variants, ArgMax/ArgMin, Trilu — parity vs
    torch reference semantics on authored graphs."""
    rng = np.random.RandomState(7)
    x = rng.randn(3, 5).astype(np.float32)
    y = rng.randn(3, 5).astype(np.float32)
    slope = np.asarray([0.1], np.float32)

    cases = [
        ("Greater", dict(), [x, y], (x > y)),
        ("GreaterOrEqual", dict(), [x, y], (x >= y)),
        ("LessOrEqual", dict(), [x, y], (x <= y)),
        ("Sign", dict(), [x], np.sign(x)),
        ("Selu", dict(), [x], torch.nn.functional.selu(torch.from_numpy(x)).numpy()),
        ("Mish", dict(), [x], torch.nn.functional.mish(torch.from_numpy(x)).numpy()),
        ("Sinh", dict(), [x], np.sinh(x)),
        ("Cosh", dict(), [x], np.cosh(x)),
        ("Tan", dict(), [x], np.tan(x)),
        ("Atan", dict(), [x], np.arctan(x)),
        ("LogSoftmax", dict(axis=1), [x], torch.log_softmax(torch.from_numpy(x), dim=1).numpy()),
        ("ArgMax", dict(axis=1, keepdims=1), [x], np.argmax(x, axis=1)[:, None]),
        ("ArgMin", dict(axis=0, keepdims=0), [x], np.argmin(x, axis=0)),
    ]
    for op_name, attrs, ins, expect in cases:
        in_names = [f"i{k}" for k in range(len(ins))]
        g = op.make_graph(
            nodes=[op.make_node(op_name, in_names, ["out"], **attrs)],
            name="g",
            inputs=[(n, F32, tuple(a.shape)) for n, a in zip(in_names, ins)],
            outputs=[("out", F32, ())],
        )
        (got,) = _run(op.save_model(op.make_model(g)), dict(zip(in_names, [jnp.asarray(a) for a in ins])))
        np.testing.assert_allclose(np.asarray(got, np.float64), np.asarray(expect, np.float64), rtol=1e-5, atol=1e-6, err_msg=op_name)

    # binary logicals on bools
    bx, by = x > 0, y > 0
    for op_name, expect in [("And", bx & by), ("Or", bx | by), ("Xor", bx ^ by)]:
        g = op.make_graph(
            nodes=[op.make_node(op_name, ["a", "b"], ["out"])],
            name="g",
            inputs=[("a", 9, bx.shape), ("b", 9, by.shape)],
            outputs=[("out", 9, ())],
        )
        (got,) = _run(op.save_model(op.make_model(g)), {"a": jnp.asarray(bx), "b": jnp.asarray(by)})
        np.testing.assert_array_equal(got, expect, err_msg=op_name)

    # PRelu broadcast slope
    g = op.make_graph(
        nodes=[op.make_node("PRelu", ["x", "s"], ["out"])],
        name="g",
        inputs=[("x", F32, x.shape)],
        outputs=[("out", F32, ())],
        initializers=[("s", slope)],
    )
    (got,) = _run(op.save_model(op.make_model(g)), {"x": jnp.asarray(x)})
    expect = torch.nn.functional.prelu(torch.from_numpy(x), torch.from_numpy(slope)).numpy()
    np.testing.assert_allclose(got, expect, rtol=1e-6)

    # CumSum exclusive/reverse and Trilu
    for excl, rev in [(0, 0), (1, 0), (0, 1), (1, 1)]:
        g = op.make_graph(
            nodes=[op.make_node("CumSum", ["x", "ax"], ["out"], exclusive=excl, reverse=rev)],
            name="g",
            inputs=[("x", F32, x.shape)],
            outputs=[("out", F32, ())],
            initializers=[("ax", np.asarray(1, np.int64))],
        )
        (got,) = _run(op.save_model(op.make_model(g)), {"x": jnp.asarray(x)})
        ref = x[:, ::-1] if rev else x
        ref = np.cumsum(ref, axis=1)
        if excl:
            ref = ref - (x[:, ::-1] if rev else x)
        if rev:
            ref = ref[:, ::-1]
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6, err_msg=f"cumsum excl={excl} rev={rev}")

    m = rng.randn(4, 4).astype(np.float32)
    for upper, k in [(1, 0), (0, 0), (1, 1), (0, -1)]:
        g = op.make_graph(
            nodes=[op.make_node("Trilu", ["x", "k"], ["out"], upper=upper)],
            name="g",
            inputs=[("x", F32, m.shape)],
            outputs=[("out", F32, ())],
            initializers=[("k", np.asarray(k, np.int64))],
        )
        (got,) = _run(op.save_model(op.make_model(g)), {"x": jnp.asarray(m)})
        expect = np.triu(m, k) if upper else np.tril(m, k)
        np.testing.assert_array_equal(got, expect)
