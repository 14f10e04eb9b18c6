"""Torch-checkpoint converters: reference state dicts -> flax param trees.

Lets users of the PyTorch reference migrate trained weights
(edge_model_final.pt / best_model.pt layouts, reference:
edge_diffusion_tts/train.py:291-297, train_v2.py:335-341) to this framework,
and powers the numeric-parity test suite.  Only numpy is required here; torch
tensors are accepted and detached.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _linear(sd: Dict, name: str, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if bias and f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def _adaln(sd: Dict, name: str) -> Dict:
    return {
        "norm": {"weight": _np(sd[f"{name}.norm.weight"])},
        "proj": _linear(sd, f"{name}.proj"),
    }


def convert_decoder_state_dict(sd: Dict, num_layers: int) -> Dict:
    """Reference EdgeDiffusionDecoder state dict -> flax params tree.

    Name map: token_emb/sem_proj/time_emb(Sequential 1,3)/step_emb/in_proj/
    layers.i.{norm1,attn,norm2,cross_attn,norm3,ffn}/final_norm/out_proj
    (reference: edge_diffusion_tts/models/decoder.py:14-64).
    """
    sd = {k: v for k, v in sd.items()}
    p: Dict = {
        "token_emb": {"embedding": _np(sd["token_emb.weight"])},
        "sem_proj": _linear(sd, "sem_proj"),
        "time_fc1": _linear(sd, "time_emb.1"),
        "time_fc2": _linear(sd, "time_emb.3"),
        "step_emb": {"embedding": _np(sd["step_emb.weight"])},
        "in_proj": _linear(sd, "in_proj"),
        "final_norm": {
            "scale": _np(sd["final_norm.weight"]),
            "bias": _np(sd["final_norm.bias"]),
        },
        "out_proj": _linear(sd, "out_proj"),
    }
    for i in range(num_layers):
        pre = f"layers.{i}"
        p[f"layers_{i}"] = {
            "norm1": _adaln(sd, f"{pre}.norm1"),
            "attn": {
                "qkv": _linear(sd, f"{pre}.attn.qkv", bias=False),
                "proj": _linear(sd, f"{pre}.attn.proj"),
            },
            "norm2": {"weight": _np(sd[f"{pre}.norm2.weight"])},
            "cross_attn": {
                "q_proj": _linear(sd, f"{pre}.cross_attn.q_proj", bias=False),
                "kv_down_proj": _linear(sd, f"{pre}.cross_attn.kv_down_proj", bias=False),
                "kv_norm": {"weight": _np(sd[f"{pre}.cross_attn.kv_norm.weight"])},
                "kv_up_proj": _linear(sd, f"{pre}.cross_attn.kv_up_proj", bias=False),
                "out_proj": _linear(sd, f"{pre}.cross_attn.out_proj", bias=False),
            },
            "norm3": _adaln(sd, f"{pre}.norm3"),
            "ffn": {
                "fc1": _linear(sd, f"{pre}.ffn.net.0"),
                "fc2": _linear(sd, f"{pre}.ffn.net.3"),
            },
        }
    return jax.tree.map(jnp.asarray, {"params": p})


def convert_encoder_proj_state_dict(sd: Dict, fast: bool = False) -> Dict:
    """Reference SemanticEncoder.proj (Sequential) -> flax proj params.

    v1 layout: 0=Linear,1=GELU,2=LayerNorm,3=Linear
    (encoder.py:41-46); fast/v2 layout inserts Dropout at 3 so the final
    Linear is index 4 (train_v2.py:54-60).
    """
    last = "4" if fast else "3"
    return {
        "proj_fc1": jax.tree.map(jnp.asarray, _linear(sd, "0")),
        "proj_ln": {
            "scale": jnp.asarray(_np(sd["2.weight"])),
            "bias": jnp.asarray(_np(sd["2.bias"])),
        },
        "proj_fc2": jax.tree.map(jnp.asarray, _linear(sd, last)),
    }


def convert_fsq_encoder_state_dict(sd: Dict) -> Dict:
    """Reference FSQEncoder -> flax FSQEncoder params (proj_down/proj_up)."""
    return jax.tree.map(
        jnp.asarray,
        {
            "proj_down": _linear(sd, "proj_down"),
            "proj_up": _linear(sd, "proj_up"),
        },
    )


def convert_reference_checkpoint(
    ckpt: Dict, num_layers: int = 4, hubert_params: Dict = None
) -> tuple:
    """A reference .pt checkpoint dict -> (params, vq_state, CFG-dict).

    Accepts both layouts the reference saves:
      v1 edge_model_final.pt: {encoder_proj, encoder_vq, decoder, cfg}
         (reference: edge_diffusion_tts/train.py:291-297)
      v2 best_model.pt: {encoder_proj, encoder_fsq, decoder, epoch, val_cos}
         (reference: train_v2.py:335-341)

    The returned ``params`` tree matches training.init_models' layout:
    {"encoder": {proj..., vq..., hubert: <given or absent>}, "decoder": ...}.
    Pass ``hubert_params`` (from models.hubert.load_hubert_params_from_torch
    on the pretrained HubertModel) to complete the frozen subtree.
    """
    decoder = convert_decoder_state_dict(ckpt["decoder"], num_layers)["params"]

    # Detect the proj layout from the keys: the Fast/v2 variant inserts
    # Dropout at index 3, pushing the final Linear to index 4.
    fast = any(k.startswith("4.") for k in ckpt["encoder_proj"])
    if "encoder_fsq" in ckpt:  # v2 layout
        enc = convert_encoder_proj_state_dict(ckpt["encoder_proj"], fast=fast)
        enc["vq"] = convert_fsq_encoder_state_dict(ckpt["encoder_fsq"])
        vq_state = {}
    else:  # v1 layout: VQ or FSQ under "encoder_vq"
        sd = ckpt["encoder_vq"]
        enc = convert_encoder_proj_state_dict(ckpt["encoder_proj"], fast=fast)
        if "proj_down.weight" in sd:  # FSQEncoder
            enc["vq"] = convert_fsq_encoder_state_dict(sd)
            vq_state = {}
        else:
            vq_state = {"encoder": {"vq": convert_vq_state_dict(sd)}}
    if hubert_params is not None:
        enc["hubert"] = hubert_params["params"]

    params = {"encoder": enc, "decoder": decoder}
    cfg = ckpt.get("cfg")
    if isinstance(cfg, dict) and cfg.get("use_depthwise"):
        # The reference DECLARES use_depthwise=True but no reference model
        # consumes it, so its checkpoints carry no conv weights.  Our decoder
        # actually wires the flag (models/decoder.py pre_conv) — migrated
        # configs must turn it off or the restored decoder would expect
        # parameters that never existed (PARITY.md deviation 13).
        cfg = dict(cfg, use_depthwise=False)
    return params, vq_state, cfg


def convert_vq_state_dict(sd: Dict) -> Dict:
    """Reference VectorQuantizer buffers -> flax vq_state collection."""
    return jax.tree.map(
        jnp.asarray,
        {
            "codebook": _np(sd["codebook.weight"]),
            "ema_cluster_size": _np(sd["ema_cluster_size"]),
            "ema_w": _np(sd["ema_w"]),
            "update_count": _np(sd["update_count"]).astype(np.int32),
        },
    )
