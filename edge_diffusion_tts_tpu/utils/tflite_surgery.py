"""TFLite flatbuffer surgery: weight-only int8 via DEQUANTIZE ops.

The jax2tf route to an in-budget quantized edge artifact (selective
per-channel weight-only int8, utils/quantize.py) embeds ``cast(int8 const) *
scale`` in the exported graph — but the TFLite converter CONSTANT-FOLDS that
pattern back to f32 constants for every matmul weight (only gather-consumed
embedding tables survive), which erases the size saving while keeping the
quantized VALUES.  There is no converter flag to disable the folding pass.

This module restores the int8 representation after conversion, the way
deployment pipelines represent weight-only int8: for each folded f32 weight
constant it rewrites the flatbuffer to hold the int8 tensor (with TFLite
per-channel quantization parameters) plus a ``DEQUANTIZE`` op feeding the
original consumers.  The dequantize kernel computes exactly the
``int8 -> f32 * scale`` product the folded constant held, so the artifact is
BIT-IDENTICAL in behavior to the folded one (verified by
tests/test_inference.py::test_export_tflite_weight_int8) while carrying int8
weights on disk and in mmap.

Matching is by VALUE: the caller passes the quantized flat dict
(``quantize_decoder_params``); each folded constant is located by comparing
its bytes against ``q * scale`` in both orientations (the converter
transposes Dense kernels to FULLY_CONNECTED's [out, in] layout).

The torch reference has no quantized export at all (reference
utils/export.py:12-40 is fp32 ONNX); this is beyond-parity capability.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def rewrite_weights_int8(
    tflite_bytes: bytes, qflat: Dict[str, np.ndarray]
) -> Tuple[bytes, dict]:
    """Rewrite folded f32 weight constants as int8 + DEQUANTIZE.

    Returns ``(new_flatbuffer_bytes, report)`` where report lists matched /
    unmatched quantized tensors and the byte saving.
    """
    import flatbuffers
    from tensorflow.lite.python import schema_py_generated as schema_fb

    model = schema_fb.ModelT.InitFromPackedBuf(bytearray(tflite_bytes), 0)
    sg = model.subgraphs[0]

    # How many tensors share each buffer — never mutate a shared buffer.
    buf_users: Dict[int, int] = {}
    for t in sg.tensors:
        buf_users[t.buffer] = buf_users.get(t.buffer, 0) + 1

    # Candidate folded constants: value-pattern -> (path, q, scale, out_dim).
    # Orientation "nt" is the natural [in, out] layout; "t" the transposed
    # FULLY_CONNECTED [out, in] layout.
    want = {}
    for key, q in qflat.items():
        if not key.startswith("q8:"):
            continue
        path = key.split(":", 1)[1]
        scale = np.asarray(qflat["sc:" + path], np.float32)
        w = q.astype(np.float32) * scale[None, :]
        want[w.tobytes()] = (path, q, scale, 1)
        want[np.ascontiguousarray(w.T).tobytes()] = (
            path, np.ascontiguousarray(q.T), scale, 0
        )

    # Locate or append the DEQUANTIZE opcode.
    deq_code = None
    for i, oc in enumerate(model.operatorCodes):
        code = max(oc.builtinCode or 0, oc.deprecatedBuiltinCode or 0)
        if code == schema_fb.BuiltinOperator.DEQUANTIZE:
            deq_code = i
            break
    if deq_code is None:
        oc = schema_fb.OperatorCodeT()
        oc.builtinCode = schema_fb.BuiltinOperator.DEQUANTIZE
        oc.deprecatedBuiltinCode = schema_fb.BuiltinOperator.DEQUANTIZE
        oc.version = 2  # per-channel int8 dequantize
        model.operatorCodes.append(oc)
        deq_code = len(model.operatorCodes) - 1

    matched, new_ops, saved = [], [], 0
    for ti, t in enumerate(sg.tensors):
        if t.type != schema_fb.TensorType.FLOAT32 or t.buffer == 0:
            continue
        buf = model.buffers[t.buffer]
        if buf.data is None or len(buf.data) < 4096:
            continue
        if buf_users.get(t.buffer, 0) != 1:
            continue
        hit = want.pop(bytes(bytearray(buf.data)), None)
        if hit is None:
            continue
        path, q, scale, qdim = hit
        # Drop the duplicate orientation of the same tensor.
        want = {k: v for k, v in want.items() if v[0] != path}

        # int8 tensor holding q, with per-channel quantization params so the
        # DEQUANTIZE kernel reproduces q * scale exactly.
        qbuf = schema_fb.BufferT()
        qbuf.data = np.frombuffer(q.tobytes(), np.uint8)
        model.buffers.append(qbuf)
        qt = schema_fb.TensorT()
        qt.shape = list(q.shape)
        qt.type = schema_fb.TensorType.INT8
        qt.buffer = len(model.buffers) - 1
        qt.name = (t.name or b"w").decode() if isinstance(t.name, bytes) \
            else (t.name or "w")
        qt.name = (qt.name + "_int8").encode()
        qp = schema_fb.QuantizationParametersT()
        qp.scale = [float(s) for s in scale]
        qp.zeroPoint = [0] * len(scale)
        qp.quantizedDimension = qdim
        qt.quantization = qp
        sg.tensors.append(qt)
        qi = len(sg.tensors) - 1

        # The original f32 tensor becomes the DEQUANTIZE output: detach its
        # constant buffer (freeing the f32 bytes).
        saved += len(buf.data) - q.nbytes - scale.nbytes
        buf.data = None
        t.buffer = 0

        op = schema_fb.OperatorT()
        op.opcodeIndex = deq_code
        op.inputs = [qi]
        op.outputs = [ti]
        new_ops.append(op)
        matched.append(path)

    # Dequantize ops must execute before their consumers: prepend (TFLite
    # executes operators in array order).
    sg.operators = new_ops + list(sg.operators)

    builder = flatbuffers.Builder(1024)
    builder.Finish(model.Pack(builder), b"TFL3")
    out = bytes(builder.Output())

    unmatched = sorted({v[0] for v in want.values()})
    report = {
        "matched": sorted(matched),
        "unmatched": unmatched,
        "bytes_saved": int(saved),
        "in_bytes": len(tflite_bytes),
        "out_bytes": len(out),
    }
    return out, report
