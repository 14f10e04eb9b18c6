"""End-to-end generation parity vs the PyTorch reference.

The BASELINE north-star metric is mel L1 <= 1e-2 vs the reference on
identical inputs.  Here both stacks run the published 4-step DDIM path
(reference: edge_diffusion_tts/inference.py:24-53) and the DPM-Solver++
path (schedule.py:440-527) with the SAME ported decoder weights and the
SAME initial noise, and the final mels must agree to float32 tolerance —
far inside the 1e-2 budget.
"""

import sys

import numpy as np
import pytest

from conftest import REFERENCE_PATH, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference repo not mounted"
)


@pytest.fixture(scope="module")
def setup():
    sys.path.insert(0, REFERENCE_PATH)
    import torch

    from edge_diffusion_tts.config import CFG as RefCFG
    from edge_diffusion_tts.models.decoder import EdgeDiffusionDecoder as RefDecoder
    from edge_diffusion_tts.schedule import DiffusionSchedule as RefSchedule

    from edge_diffusion_tts_tpu.config import CFG
    from edge_diffusion_tts_tpu.models import EdgeDiffusionDecoder
    from edge_diffusion_tts_tpu.schedule import DiffusionSchedule
    from edge_diffusion_tts_tpu.utils.torch_compat import convert_decoder_state_dict

    torch.manual_seed(3)
    kw = dict(hidden=32, layers=2, heads=2, dropout=0.0, use_fsq=False,
              codebook_size=64)
    ref_cfg = RefCFG(**kw)
    ref_dec = RefDecoder(ref_cfg).eval()
    ref_sched = RefSchedule(ref_cfg.diff_steps)

    cfg = CFG(out_dir="/tmp/edt_test_runs", **kw)
    dec = EdgeDiffusionDecoder(cfg)
    params = convert_decoder_state_dict(ref_dec.state_dict(), num_layers=cfg.layers)
    sched = DiffusionSchedule.create(cfg.diff_steps)
    return torch, ref_dec, ref_sched, dec, params, sched, cfg


def _reference_ddim_generate(torch, ref_dec, ref_sched, x_T, sem_idx, num_steps, T):
    """The reference generate_mel loop verbatim (inference.py:24-53),
    with the initial noise injected instead of torch.randn."""
    x = torch.from_numpy(x_T.copy())
    sem = torch.from_numpy(sem_idx)
    stride = T // num_steps
    timesteps = list(range(T - 1, 0, -stride))[:num_steps]
    x0_pred = None
    with torch.no_grad():
        for i, t in enumerate(timesteps):
            t_b = torch.full((x.shape[0],), t, dtype=torch.long)
            i_b = torch.full((x.shape[0],), i, dtype=torch.long)
            eps_pred = ref_dec(x, t_b, sem, step_idx=i_b)
            t_prev = torch.full_like(t_b, max(t - stride, 0))
            x, x0_pred = ref_sched.get_ddim_step(x, t_b, t_prev, eps_pred, eta=0.0)
    return x0_pred.numpy()


@pytest.mark.parametrize("num_steps", [1, 4])
def test_ddim_generate_parity(setup, num_steps):
    torch, ref_dec, ref_sched, dec, params, sched, cfg = setup
    import jax.numpy as jnp

    from edge_diffusion_tts_tpu.schedule import ddim_sample

    rng = np.random.RandomState(10 + num_steps)
    B, S = 1, 12
    T_out = S * 2
    x_T = rng.randn(B, T_out, cfg.n_mels).astype(np.float32)
    sem_idx = rng.randint(0, 64, size=(B, S))

    ref_mel = _reference_ddim_generate(
        torch, ref_dec, ref_sched, x_T, sem_idx, num_steps, cfg.diff_steps
    )

    def model_fn(x, t, step_idx):
        return dec.apply(
            params, x, t, sem_idx=jnp.asarray(sem_idx), step_idx=step_idx
        )

    ours = np.asarray(
        ddim_sample(sched, model_fn, jnp.asarray(x_T), num_steps, prediction="eps")
    )

    l1 = np.mean(np.abs(ours - ref_mel))
    assert l1 < 1e-2, f"mel L1 {l1} exceeds the north-star budget"
    np.testing.assert_allclose(ours, ref_mel, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_dpm_solver_generate_parity(setup, order):
    torch, ref_dec, ref_sched, dec, params, sched, cfg = setup
    import jax.numpy as jnp

    from edge_diffusion_tts_tpu.schedule import DPMSolverPP

    sys.path.insert(0, REFERENCE_PATH)
    from edge_diffusion_tts.schedule import DPMSolverPP as RefSolver

    rng = np.random.RandomState(20)
    B, S = 1, 10
    x_T = rng.randn(B, S * 2, cfg.n_mels).astype(np.float32)
    feats = rng.randn(B, S, cfg.semantic_dim).astype(np.float32)

    ref_solver = RefSolver(ref_sched, order=order)
    with torch.no_grad():
        ref_out = ref_solver.sample(
            ref_dec,
            torch.from_numpy(x_T.copy()),
            torch.from_numpy(feats),
            num_steps=4,
            max_t=950,
        ).numpy()

    solver = DPMSolverPP(sched, order=order)

    def model_fn(x, t, step_idx):
        return dec.apply(
            params, x, t, sem_features=jnp.asarray(feats), step_idx=step_idx
        )

    ours = np.asarray(
        solver.sample(model_fn, jnp.asarray(x_T), num_steps=4, max_t=950)
    )
    l1 = np.mean(np.abs(ours - ref_out))
    assert l1 < 1e-2, f"DPM++ mel L1 {l1}"
    np.testing.assert_allclose(ours, ref_out, atol=2e-3, rtol=1e-2)
