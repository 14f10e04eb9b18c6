"""Evaluation + visualization: GT-vs-generated mel PNG grids.

Reference behavior: edge_diffusion_tts/utils/visualization.py —
``evaluate_model`` (epsilon/v MSE on a few val batches) lives in
training/steps.py as ``make_eval_eps_fn``; here is ``visualize_generation``:
a PNG grid of the ground-truth mel against N-step generations with per-plot
MSE, saved to ``<run_dir>/samples/gen_step_<step>.png``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def visualize_generation(
    generate_fn,
    gt_mel: np.ndarray,
    step: int,
    run_dir: str,
    steps_list: Sequence[int] = (4, 8, 16),
    rng=None,
) -> Optional[str]:
    """Render GT vs few-step generations; returns the PNG path.

    ``generate_fn(num_steps, rng) -> mel [T, n_mels]`` closes over the model
    and conditioning.  Reference: utils/visualization.py:47-94.
    """
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None

    import jax

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = len(steps_list) + 1
    fig, axes = plt.subplots(n, 1, figsize=(10, 2.2 * n), constrained_layout=True)
    gt = np.asarray(gt_mel)
    axes[0].imshow(gt.T, origin="lower", aspect="auto", cmap="magma")
    axes[0].set_title("ground truth (normalized log-mel)")

    for ax, num_steps in zip(axes[1:], steps_list):
        gen = np.asarray(generate_fn(num_steps, rng))
        T = min(gen.shape[0], gt.shape[0])
        mse = float(np.mean((gen[:T] - gt[:T]) ** 2))
        ax.imshow(gen.T, origin="lower", aspect="auto", cmap="magma")
        ax.set_title(f"{num_steps}-step generation  (MSE {mse:.4f})")

    out_dir = os.path.join(run_dir, "samples")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"gen_step_{step}.png")
    fig.savefig(path, dpi=100)
    plt.close(fig)
    return path
