"""Weight-only int8 quantization of the decoder parameter tree.

The edge-deployment size story (reference README: "~3 MB total inference
model") with an accuracy budget the TFLite converter could not hit:
dynamic-range TFLite quantizes EVERY weight and lands at e2e 4-step mel L1
0.0193 — 2x the project's 1e-2 budget (QUANT_r03.json) — and its full-int8
mode aborts a stock interpreter at invoke.  This module sidesteps both by
quantizing in JAX, per OUTPUT CHANNEL, and keeping the numerically sensitive
tensors in float32:

  - ``out_proj`` — the zero-init head; tiny weights, sets the output scale;
  - the AdaLN modulation projections (``norm1``/``norm3`` ``proj``) — they
    multiply every hidden state, so per-channel scale error compounds
    through all layers;
  - the timestep conditioning MLP (``time_fc1``/``time_fc2``);
  - all norms/biases/1-D tensors (negligible size, high sensitivity).

Everything else (QKV/attention/MLA/FFN kernels, token/step embeddings,
``in_proj``/``sem_proj``) is symmetric int8 with one f32 scale per output
channel: ``w ~= int8 * scale[None, :]``.  Dequantization is exact linear
algebra — the quantized artifact reproduces the f32 forward to the rounding
error of the kernels themselves (measured ~1e-3 e2e mel L1 at flagship
size; budget 1e-2 — tools/quant_report.py writes the artifact).

The artifact is a flat ``.npz`` (no pickle), loadable anywhere numpy runs;
``load_quantized`` returns a plain f32 params tree for ``decoder.apply``.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

# Path substrings that force a tensor to stay float32.  Matched against the
# "/"-joined parameter path, lowercase.
SENSITIVE = ("out_proj", "time_fc1", "time_fc2", "step_emb", "norm")


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        path = prefix + (str(k),)
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out["/".join(path)] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _is_sensitive(path: str) -> bool:
    p = path.lower()
    return any(s in p for s in SENSITIVE)


def quantize_decoder_params(params) -> Dict[str, np.ndarray]:
    """f32 decoder params tree -> flat dict of int8 weights + scales + kept
    f32 tensors.  Keys: ``q8:<path>`` (int8), ``sc:<path>`` (f32 per-output-
    channel scale), ``f32:<path>`` (kept tensors)."""
    import jax

    flat = _flatten(jax.device_get(params))
    out: Dict[str, np.ndarray] = {}
    for path, w in flat.items():
        w = np.asarray(w)
        if (
            w.ndim != 2
            or _is_sensitive(path)
            or not np.issubdtype(w.dtype, np.floating)
        ):
            out[f"f32:{path}"] = w.astype(np.float32)
            continue
        # Symmetric per-output-channel (last axis: flax Dense kernels are
        # [in, out]; Embed tables [vocab, features] quantize per feature).
        amax = np.max(np.abs(w), axis=0)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
        out[f"q8:{path}"] = q
        out[f"sc:{path}"] = scale
    return out


def dequantize_decoder_params(qflat: Dict[str, np.ndarray]):
    """Inverse of ``quantize_decoder_params``: flat dict -> f32 params tree."""
    flat: Dict[str, np.ndarray] = {}
    for key, v in qflat.items():
        tag, path = key.split(":", 1)
        if tag == "f32":
            flat[path] = np.asarray(v, np.float32)
        elif tag == "q8":
            scale = np.asarray(qflat[f"sc:{path}"], np.float32)
            flat[path] = v.astype(np.float32) * scale[None, :]
        elif tag != "sc":
            raise ValueError(f"unknown tag in quantized artifact: {key}")
    return _unflatten(flat)


def quantized_nbytes(qflat: Dict[str, np.ndarray]) -> int:
    return sum(np.asarray(v).nbytes for v in qflat.values())


def params_nbytes(params) -> int:
    import jax

    return sum(np.asarray(v).nbytes for v in _flatten(jax.device_get(params)).values())


def save_quantized(path: str, params) -> Tuple[str, dict]:
    """Quantize + write a flat .npz; returns (path, size report)."""
    q = quantize_decoder_params(params)
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **q)
    final = path if path.endswith(".npz") else path + ".npz"
    report = {
        "f32_bytes": params_nbytes(params),
        "quantized_bytes": quantized_nbytes(q),
        "file_bytes": os.path.getsize(final),
        "ratio": round(params_nbytes(params) / max(quantized_nbytes(q), 1), 3),
        "kept_f32": sorted(
            k.split(":", 1)[1] for k in q if k.startswith("f32:")
            and np.asarray(q[k]).ndim == 2
        ),
    }
    return final, report


def load_quantized(path: str):
    """Load a .npz written by ``save_quantized`` -> f32 params tree."""
    with np.load(path) as z:
        return dequantize_decoder_params({k: z[k] for k in z.files})
