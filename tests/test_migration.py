"""Checkpoint migration: a reference-format .pt (both v1 and v2 layouts) is
converted and produces identical generations through our stack."""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_PATH, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def reference_ckpts(tmp_path_factory):
    """Build reference models and save .pt files exactly like the reference."""
    sys.path.insert(0, REFERENCE_PATH)
    import torch

    from edge_diffusion_tts.config import CFG as RefCFG
    from edge_diffusion_tts.models.decoder import EdgeDiffusionDecoder as RefDecoder
    from edge_diffusion_tts.models.encoder import SemanticEncoder as RefEncoder

    d = tmp_path_factory.mktemp("ref_ckpts")
    torch.manual_seed(7)
    kw = dict(hidden=32, layers=2, heads=2, dropout=0.0, use_fsq=True)
    ref_cfg = RefCFG(**kw)
    ref_cfg.codebook_size = 2304

    class _Proj(torch.nn.Module):
        pass

    # Avoid downloading HuBERT: build proj+fsq directly like the encoder does
    # (reference: models/encoder.py:41-58).
    proj = torch.nn.Sequential(
        torch.nn.Linear(768, ref_cfg.semantic_dim),
        torch.nn.GELU(),
        torch.nn.LayerNorm(ref_cfg.semantic_dim),
        torch.nn.Linear(ref_cfg.semantic_dim, ref_cfg.semantic_dim),
    )
    from edge_diffusion_tts.models.fsq import FSQEncoder as RefFSQ

    fsq = RefFSQ(input_dim=ref_cfg.semantic_dim, levels=ref_cfg.fsq_levels)
    dec = RefDecoder(ref_cfg).eval()

    v1_path = str(d / "edge_model_final.pt")
    torch.save(
        {
            "encoder_proj": proj.state_dict(),
            "encoder_vq": fsq.state_dict(),
            "decoder": dec.state_dict(),
            "cfg": ref_cfg.to_dict(),
        },
        v1_path,
    )
    v2_path = str(d / "best_model.pt")
    torch.save(
        {
            "epoch": 3,
            "encoder_proj": proj.state_dict(),
            "encoder_fsq": fsq.state_dict(),
            "decoder": dec.state_dict(),
            "val_cos": 0.5,
        },
        v2_path,
    )
    return torch, dec, ref_cfg, v1_path, v2_path


@pytest.mark.parametrize("layout", ["v1", "v2"])
def test_migrate_and_generate_parity(reference_ckpts, layout, tmp_path):
    torch, ref_dec, ref_cfg, v1_path, v2_path = reference_ckpts
    import jax
    import jax.numpy as jnp

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule, ddim_sample
    from edge_diffusion_tts_tpu.training.checkpoint import (
        restore_final_model,
        save_final_model,
    )
    from edge_diffusion_tts_tpu.utils.torch_compat import (
        convert_reference_checkpoint,
    )

    path = v1_path if layout == "v1" else v2_path
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    n_layers = (ckpt.get("cfg") or {}).get("layers", 2)
    params, vq_state, cfg_dict = convert_reference_checkpoint(
        ckpt, num_layers=n_layers
    )
    # The converter's returned cfg dict is the migration source of truth: it
    # sanitizes reference-only quirks (use_depthwise declared True but
    # unconsumed there — our decoder wires it, so it must come back False).
    cfg = CFG.from_dict(cfg_dict) if cfg_dict else CFG(
        hidden=32, layers=2, heads=2, dropout=0.0, use_fsq=True
    )
    assert not cfg.use_depthwise
    cfg.out_dir = str(tmp_path)

    # round-trip through our checkpoint format
    out_dir = str(tmp_path / f"migrated_{layout}")
    save_final_model(out_dir, params, cfg)
    params2, cfg2 = restore_final_model(out_dir)

    # generation parity vs the reference decoder on the same noise
    dec = EdgeDiffusionDecoder(cfg2)
    sched = DiffusionSchedule.create(cfg2.diff_steps)
    rng = np.random.RandomState(3)
    B, S = 1, 10
    x_T = rng.randn(B, S * 2, cfg2.n_mels).astype(np.float32)
    sem_idx = rng.randint(0, 2304, size=(B, S))

    def model_fn(x, t, si):
        return dec.apply(
            {"params": params2["decoder"]}, x, t,
            sem_idx=jnp.asarray(sem_idx), step_idx=si,
        )

    ours = np.asarray(
        ddim_sample(sched, model_fn, jnp.asarray(x_T), 4, prediction="eps")
    )

    sys.path.insert(0, REFERENCE_PATH)
    from edge_diffusion_tts.schedule import DiffusionSchedule as RefSchedule

    ref_sched = RefSchedule(cfg2.diff_steps)
    x = torch.from_numpy(x_T.copy())
    sem_t = torch.from_numpy(sem_idx)
    stride = cfg2.diff_steps // 4
    x0 = None
    with torch.no_grad():
        for i, t in enumerate(list(range(cfg2.diff_steps - 1, 0, -stride))[:4]):
            t_b = torch.full((B,), t, dtype=torch.long)
            i_b = torch.full((B,), i, dtype=torch.long)
            eps = ref_dec(x, t_b, sem_t, step_idx=i_b)
            x, x0 = ref_sched.get_ddim_step(
                x, t_b, torch.full_like(t_b, max(t - stride, 0)), eps, eta=0.0
            )
    l1 = np.mean(np.abs(ours - x0.numpy()))
    assert l1 < 1e-2, l1
