"""Minimal, dependency-free ONNX protobuf reader/writer.

The environment ships neither ``onnx`` nor ``onnxruntime``; this module
implements just enough of the protobuf wire format and the (public, stable)
ONNX schema field numbers to load a ``ModelProto`` — graph topology, node
attributes, and initializer tensors as numpy arrays — and to serialize one
back (used by the tests to author golden graphs without the onnx package).

Reference counterpart: the ONNX runtime session construction in
``makani/models/onnx_wrapper.py:30-82`` (which delegates parsing to
onnxruntime); here the parse itself is native so the graph can be executed
as a jitted JAX function on TPU (see ``onnx_wrapper.py``).

Only the subset of the schema the executor needs is materialized; unknown
fields are skipped structurally (wire format is self-describing), so files
produced by standard exporters parse fine.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

__all__ = [
    "TensorProto",
    "AttributeProto",
    "NodeProto",
    "ValueInfo",
    "GraphProto",
    "ModelProto",
    "load_model",
    "save_model",
    "make_tensor",
    "make_node",
    "make_graph",
    "make_model",
]

# ---------------------------------------------------------------------------
# ONNX data types (TensorProto.DataType enum values)

DTYPE_TO_NP = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}
NP_TO_DTYPE = {np.dtype(v): k for k, v in DTYPE_TO_NP.items()}
BFLOAT16 = 16  # stored as uint16 payload; upcast to float32 on load


# ---------------------------------------------------------------------------
# wire-format primitives

def _read_varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a serialized message.

    value is: int for varint(0) and fixed(1/5) wires, memoryview for
    length-delimited(2).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        fnum, wtype = tag >> 3, tag & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:
            val = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wtype == 5:
            val = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield fnum, wtype, val


def _zigzag_i64(v: int) -> int:
    # protobuf int64 fields are stored as 2^64-complement varints, not zigzag
    return v - (1 << 64) if v >= (1 << 63) else v


def _write_varint(out: bytearray, v: int):
    if v < 0:
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _write_tag(out: bytearray, fnum: int, wtype: int):
    _write_varint(out, (fnum << 3) | wtype)


def _write_len(out: bytearray, fnum: int, payload: bytes):
    _write_tag(out, fnum, 2)
    _write_varint(out, len(payload))
    out.extend(payload)


def _write_int(out: bytearray, fnum: int, v: int):
    _write_tag(out, fnum, 0)
    _write_varint(out, v)


def _write_float(out: bytearray, fnum: int, v: float):
    _write_tag(out, fnum, 5)
    out.extend(struct.pack("<f", v))


# ---------------------------------------------------------------------------
# schema dataclasses

@dataclass
class TensorProto:
    name: str = ""
    dims: Tuple[int, ...] = ()
    data_type: int = 1
    raw_data: bytes = b""
    float_data: List[float] = field(default_factory=list)
    int32_data: List[int] = field(default_factory=list)
    int64_data: List[int] = field(default_factory=list)
    double_data: List[float] = field(default_factory=list)
    external: bool = False

    def to_numpy(self) -> np.ndarray:
        if self.external:
            raise ValueError(f"initializer {self.name!r} uses external data; not supported")
        if self.data_type == BFLOAT16:
            if self.raw_data:
                a = np.frombuffer(self.raw_data, dtype=np.uint16).astype(np.uint32) << 16
            else:  # typed-field storage: one bf16 bit pattern per int32
                a = (np.asarray(self.int32_data, dtype=np.int32).astype(np.uint32) & 0xFFFF) << 16
            return a.view(np.float32).reshape(self.dims).copy()
        np_dt = DTYPE_TO_NP.get(self.data_type)
        if np_dt is None:
            raise ValueError(f"unsupported tensor data_type {self.data_type} for {self.name!r}")
        if self.raw_data:
            return np.frombuffer(self.raw_data, dtype=np_dt).reshape(self.dims).copy()
        if self.data_type == 1 and self.float_data:
            return np.asarray(self.float_data, dtype=np.float32).reshape(self.dims)
        if self.data_type == 7 and self.int64_data:
            return np.asarray(self.int64_data, dtype=np.int64).reshape(self.dims)
        if self.data_type == 11 and self.double_data:
            return np.asarray(self.double_data, dtype=np.float64).reshape(self.dims)
        if self.data_type == 10 and self.int32_data:
            # fp16 typed-field storage holds raw IEEE-754 half bit patterns
            # packed one-per-int32 (ONNX TensorProto spec), not numeric values
            bits = np.asarray(self.int32_data, dtype=np.int32).astype(np.uint32) & 0xFFFF
            return bits.astype(np.uint16).view(np.float16).reshape(self.dims)
        if self.data_type in (2, 3, 4, 5, 6, 9) and self.int32_data:
            return np.asarray(self.int32_data, dtype=np.int32).astype(np_dt).reshape(self.dims)
        return np.zeros(self.dims, dtype=np_dt)


@dataclass
class AttributeProto:
    name: str = ""
    type: int = 0  # 1 FLOAT, 2 INT, 3 STRING, 4 TENSOR, 6 FLOATS, 7 INTS, 8 STRINGS
    f: float = 0.0
    i: int = 0
    s: bytes = b""
    t: Optional[TensorProto] = None
    floats: List[float] = field(default_factory=list)
    ints: List[int] = field(default_factory=list)
    strings: List[bytes] = field(default_factory=list)

    def value(self):
        if self.type == 1:
            return self.f
        if self.type == 2:
            return self.i
        if self.type == 3:
            return self.s.decode()
        if self.type == 4:
            return self.t.to_numpy()
        if self.type == 6:
            return list(self.floats)
        if self.type == 7:
            return list(self.ints)
        if self.type == 8:
            return [s.decode() for s in self.strings]
        raise ValueError(f"unsupported attribute type {self.type} ({self.name})")


@dataclass
class NodeProto:
    op_type: str = ""
    inputs: List[str] = field(default_factory=list)
    outputs: List[str] = field(default_factory=list)
    name: str = ""
    domain: str = ""
    attributes: Dict[str, AttributeProto] = field(default_factory=dict)

    def attrs(self) -> Dict[str, object]:
        return {k: v.value() for k, v in self.attributes.items()}


@dataclass
class ValueInfo:
    name: str = ""
    elem_type: int = 0
    shape: Tuple[Union[int, str, None], ...] = ()


@dataclass
class GraphProto:
    name: str = ""
    nodes: List[NodeProto] = field(default_factory=list)
    initializers: Dict[str, np.ndarray] = field(default_factory=dict)
    inputs: List[ValueInfo] = field(default_factory=list)
    outputs: List[ValueInfo] = field(default_factory=list)


@dataclass
class ModelProto:
    ir_version: int = 8
    opset: int = 17
    producer: str = ""
    graph: GraphProto = field(default_factory=GraphProto)


# ---------------------------------------------------------------------------
# parsing

def _parse_packed_floats(val, wtype) -> List[float]:
    if wtype == 2:
        return list(np.frombuffer(val, dtype=np.float32))
    return [struct.unpack("<f", struct.pack("<I", val))[0]]


def _parse_packed_varints(val, wtype) -> List[int]:
    if wtype != 2:
        return [_zigzag_i64(val)]
    out = []
    pos = 0
    while pos < len(val):
        v, pos = _read_varint(val, pos)
        out.append(_zigzag_i64(v))
    return out


def _parse_tensor(buf: memoryview) -> TensorProto:
    t = TensorProto()
    dims = []
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1:
            dims.extend(_parse_packed_varints(val, wtype))
        elif fnum == 2:
            t.data_type = val
        elif fnum == 4:
            t.float_data.extend(_parse_packed_floats(val, wtype))
        elif fnum == 5:
            t.int32_data.extend(_parse_packed_varints(val, wtype))
        elif fnum == 7:
            t.int64_data.extend(_parse_packed_varints(val, wtype))
        elif fnum == 8:
            t.name = bytes(val).decode()
        elif fnum == 9:
            t.raw_data = bytes(val)
        elif fnum == 10 and wtype == 2:
            t.double_data.extend(np.frombuffer(val, dtype=np.float64))
        elif fnum == 14 and val == 1:
            t.external = True
    t.dims = tuple(dims)
    return t


def _parse_attribute(buf: memoryview) -> AttributeProto:
    a = AttributeProto()
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1:
            a.name = bytes(val).decode()
        elif fnum == 2:
            a.f = struct.unpack("<f", struct.pack("<I", val))[0]
        elif fnum == 3:
            a.i = _zigzag_i64(val)
        elif fnum == 4:
            a.s = bytes(val)
        elif fnum == 5:
            a.t = _parse_tensor(val)
        elif fnum == 7:
            a.floats.extend(_parse_packed_floats(val, wtype))
        elif fnum == 8:
            a.ints.extend(_parse_packed_varints(val, wtype))
        elif fnum == 9:
            a.strings.append(bytes(val))
        elif fnum == 20:
            a.type = val
    if a.type == 0:  # exporters may omit type; infer from populated field
        if a.t is not None:
            a.type = 4
        elif a.ints:
            a.type = 7
        elif a.floats:
            a.type = 6
        elif a.s:
            a.type = 3
        elif a.i:
            a.type = 2
        else:
            a.type = 2 if a.f == 0.0 else 1
    return a


def _parse_node(buf: memoryview) -> NodeProto:
    n = NodeProto()
    for fnum, wtype, val in _iter_fields(buf):
        if fnum == 1:
            n.inputs.append(bytes(val).decode())
        elif fnum == 2:
            n.outputs.append(bytes(val).decode())
        elif fnum == 3:
            n.name = bytes(val).decode()
        elif fnum == 4:
            n.op_type = bytes(val).decode()
        elif fnum == 5:
            a = _parse_attribute(val)
            n.attributes[a.name] = a
        elif fnum == 7:
            n.domain = bytes(val).decode()
    return n


def _parse_value_info(buf: memoryview) -> ValueInfo:
    vi = ValueInfo()
    for fnum, _w, val in _iter_fields(buf):
        if fnum == 1:
            vi.name = bytes(val).decode()
        elif fnum == 2:  # TypeProto
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 1:  # tensor_type
                    shape = []
                    for f3, _w3, v3 in _iter_fields(v2):
                        if f3 == 1:
                            vi.elem_type = v3
                        elif f3 == 2:  # TensorShapeProto
                            for f4, _w4, v4 in _iter_fields(v3):
                                if f4 == 1:  # Dimension
                                    dim: Union[int, str, None] = None
                                    for f5, _w5, v5 in _iter_fields(v4):
                                        if f5 == 1:
                                            dim = _zigzag_i64(v5)
                                        elif f5 == 2:
                                            dim = bytes(v5).decode()
                                    shape.append(dim)
                    vi.shape = tuple(shape)
    return vi


def _parse_graph(buf: memoryview) -> GraphProto:
    g = GraphProto()
    for fnum, _w, val in _iter_fields(buf):
        if fnum == 1:
            g.nodes.append(_parse_node(val))
        elif fnum == 2:
            g.name = bytes(val).decode()
        elif fnum == 5:
            t = _parse_tensor(val)
            g.initializers[t.name] = t.to_numpy()
        elif fnum == 11:
            g.inputs.append(_parse_value_info(val))
        elif fnum == 12:
            g.outputs.append(_parse_value_info(val))
    return g


def load_model(src: Union[str, bytes]) -> ModelProto:
    """Parse an ONNX file (path or bytes) into a ModelProto."""
    if isinstance(src, str):
        with open(src, "rb") as f:
            data = f.read()
    else:
        data = src
    m = ModelProto()
    for fnum, _w, val in _iter_fields(memoryview(data)):
        if fnum == 1:
            m.ir_version = val
        elif fnum == 2:
            m.producer = bytes(val).decode()
        elif fnum == 7:
            m.graph = _parse_graph(val)
        elif fnum == 8:  # OperatorSetIdProto
            for f2, _w2, v2 in _iter_fields(val):
                if f2 == 2:
                    m.opset = _zigzag_i64(v2)
    return m


# ---------------------------------------------------------------------------
# writing (test authoring + golden files)

def _ser_tensor(name: str, arr: np.ndarray) -> bytes:
    out = bytearray()
    for d in arr.shape:
        _write_int(out, 1, d)
    dt = NP_TO_DTYPE.get(arr.dtype)
    if dt is None:
        raise ValueError(f"unsupported numpy dtype {arr.dtype}")
    _write_int(out, 2, dt)
    _write_len(out, 8, name.encode())
    _write_len(out, 9, np.ascontiguousarray(arr).tobytes())
    return bytes(out)


def _ser_attribute(name: str, value) -> bytes:
    out = bytearray()
    _write_len(out, 1, name.encode())
    if isinstance(value, bool):
        _write_int(out, 3, int(value))
        _write_int(out, 20, 2)
    elif isinstance(value, int):
        _write_int(out, 3, value)
        _write_int(out, 20, 2)
    elif isinstance(value, float):
        _write_float(out, 2, value)
        _write_int(out, 20, 1)
    elif isinstance(value, str):
        _write_len(out, 4, value.encode())
        _write_int(out, 20, 3)
    elif isinstance(value, np.ndarray):
        _write_len(out, 5, _ser_tensor(name + "_t", value))
        _write_int(out, 20, 4)
    elif isinstance(value, (list, tuple)):
        if all(isinstance(v, int) for v in value):
            for v in value:
                _write_int(out, 8, v)
            _write_int(out, 20, 7)
        elif all(isinstance(v, float) for v in value):
            for v in value:
                _write_float(out, 7, v)
            _write_int(out, 20, 6)
        else:
            raise ValueError(f"mixed attribute list {name}")
    else:
        raise ValueError(f"unsupported attribute value {name}={value!r}")
    return bytes(out)


def make_node(op_type: str, inputs, outputs, **attrs) -> NodeProto:
    n = NodeProto(op_type=op_type, inputs=list(inputs), outputs=list(outputs))
    for k, v in attrs.items():
        a = _parse_attribute(memoryview(_ser_attribute(k, v)))
        n.attributes[k] = a
    return n


def _ser_node(n: NodeProto) -> bytes:
    out = bytearray()
    for i in n.inputs:
        _write_len(out, 1, i.encode())
    for o in n.outputs:
        _write_len(out, 2, o.encode())
    if n.name:
        _write_len(out, 3, n.name.encode())
    _write_len(out, 4, n.op_type.encode())
    for a in n.attributes.values():
        payload = bytearray()
        _write_len(payload, 1, a.name.encode())
        if a.type == 1:
            _write_float(payload, 2, a.f)
        elif a.type == 2:
            _write_int(payload, 3, a.i if a.i >= 0 else a.i + (1 << 64))
        elif a.type == 3:
            _write_len(payload, 4, a.s)
        elif a.type == 4 and a.t is not None:
            _write_len(payload, 5, _ser_tensor(a.t.name, a.t.to_numpy()))
        elif a.type == 6:
            for v in a.floats:
                _write_float(payload, 7, v)
        elif a.type == 7:
            for v in a.ints:
                _write_int(payload, 8, v if v >= 0 else v + (1 << 64))
        elif a.type == 8:
            for s in a.strings:
                _write_len(payload, 9, s)
        _write_int(payload, 20, a.type)
        _write_len(out, 5, bytes(payload))
    return bytes(out)


def _ser_value_info(name: str, elem_type: int = 1, shape: Tuple[int, ...] = ()) -> bytes:
    shp = bytearray()
    for d in shape:
        dim = bytearray()
        _write_int(dim, 1, d)
        _write_len(shp, 1, bytes(dim))
    tt = bytearray()
    _write_int(tt, 1, elem_type)
    _write_len(tt, 2, bytes(shp))
    tp = bytearray()
    _write_len(tp, 1, bytes(tt))
    out = bytearray()
    _write_len(out, 1, name.encode())
    _write_len(out, 2, bytes(tp))
    return bytes(out)


def make_tensor(name: str, arr: np.ndarray) -> Tuple[str, np.ndarray]:
    return (name, np.asarray(arr))


def make_graph(nodes, name, inputs, outputs, initializers=()) -> GraphProto:
    """inputs/outputs: list of (name, elem_type, shape); initializers: (name, array)."""
    g = GraphProto(name=name, nodes=list(nodes))
    for nm, et, shp in inputs:
        g.inputs.append(ValueInfo(name=nm, elem_type=et, shape=tuple(shp)))
    for nm, et, shp in outputs:
        g.outputs.append(ValueInfo(name=nm, elem_type=et, shape=tuple(shp)))
    for nm, arr in initializers:
        g.initializers[nm] = np.asarray(arr)
    return g


def make_model(graph: GraphProto, opset: int = 17) -> ModelProto:
    return ModelProto(graph=graph, opset=opset)


def save_model(model: ModelProto, path: Optional[str] = None) -> bytes:
    g = model.graph
    gout = bytearray()
    for n in g.nodes:
        _write_len(gout, 1, _ser_node(n))
    _write_len(gout, 2, g.name.encode())
    for nm, arr in g.initializers.items():
        _write_len(gout, 5, _ser_tensor(nm, arr))
    for vi in g.inputs:
        _write_len(gout, 11, _ser_value_info(vi.name, vi.elem_type or 1, tuple(d for d in vi.shape if isinstance(d, int))))
    for vi in g.outputs:
        _write_len(gout, 12, _ser_value_info(vi.name, vi.elem_type or 1, tuple(d for d in vi.shape if isinstance(d, int))))
    out = bytearray()
    _write_int(out, 1, model.ir_version)
    if model.producer:
        _write_len(out, 2, model.producer.encode())
    _write_len(out, 7, bytes(gout))
    ops = bytearray()
    _write_len(ops, 1, b"")
    _write_int(ops, 2, model.opset)
    _write_len(out, 8, bytes(ops))
    data = bytes(out)
    if path is not None:
        with open(path, "wb") as f:
            f.write(data)
    return data
