"""Model-level tests: FSQ bijectivity, VQ EMA state, decoder shapes/semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models import (
    FSQ,
    EdgeDiffusionDecoder,
    FSQEncoder,
    VectorQuantizer,
)

KEY = jax.random.PRNGKey(0)


def small_cfg(**kw):
    kw.setdefault("hidden", 32)
    kw.setdefault("layers", 2)
    kw.setdefault("heads", 2)
    kw.setdefault("dropout", 0.0)
    kw.setdefault("out_dir", "/tmp/edt_test_runs")
    return CFG(**kw)


# ---------------------------------------------------------------------------
# FSQ
# ---------------------------------------------------------------------------


def test_fsq_codebook_size():
    fsq = FSQ(levels=(4, 4, 3, 3, 2, 2, 2, 2))
    assert fsq.codebook_size == 2304
    assert fsq.dim == 8


def test_fsq_index_code_bijection():
    fsq = FSQ(levels=(4, 3, 2))
    all_idx = jnp.arange(fsq.codebook_size)
    codes = fsq.indices_to_codes(all_idx)
    back = fsq.codes_to_indices(codes)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(all_idx))
    # codes land on the quantization grid and are fixed points of quantize
    np.testing.assert_allclose(
        np.asarray(fsq.quantize(codes)), np.asarray(codes), atol=1e-6
    )


def test_fsq_quantize_is_idempotent_and_bounded():
    fsq = FSQ(levels=(8, 5, 5))
    z = jax.random.normal(KEY, (4, 7, 3)) * 3
    z_q, idx = fsq(z)
    assert z_q.shape == z.shape and idx.shape == (4, 7)
    assert np.all(np.abs(np.asarray(z_q)) <= 1.0 + 1e-6)
    assert np.all(np.asarray(idx) >= 0) and np.all(
        np.asarray(idx) < fsq.codebook_size
    )


def test_fsq_straight_through_gradient():
    fsq = FSQ(levels=(4, 4))

    def loss(z):
        z_q, _ = fsq(z)
        return jnp.sum(z_q**2)

    z = jnp.array([[0.3, -0.2]])
    g = jax.grad(loss)(z)
    # STE: gradient flows through tanh bound, must be nonzero
    assert np.all(np.abs(np.asarray(g)) > 0)


def test_fsq_encoder_interface():
    enc = FSQEncoder(input_dim=16, levels=(4, 3, 2))
    z = jax.random.normal(KEY, (2, 5, 16))
    params = enc.init(KEY, z)
    z_q, idx, loss, ppl, used = enc.apply(params, z)
    assert z_q.shape == z.shape
    assert idx.shape == (2, 5)
    assert float(loss) == 0.0
    assert float(ppl) >= 1.0
    assert 1 <= int(used) <= enc.codebook_size

    indices = enc.apply(params, z, method=FSQEncoder.encode)
    decoded = enc.apply(params, indices, method=FSQEncoder.decode)
    assert decoded.shape == z.shape
    # encode/decode consistent with forward path
    np.testing.assert_array_equal(np.asarray(indices), np.asarray(idx))


# ---------------------------------------------------------------------------
# VQ
# ---------------------------------------------------------------------------


def test_vq_forward_and_ema_update():
    vq = VectorQuantizer(dim=8, codebook_size=32, commit=0.25)
    # NOTE: must not reuse the codebook's init key (PRNGKey(0)) for z — the
    # same key yields the same normal stream, making z rows exactly equal
    # codebook rows (zero quantization error by construction).
    z = jax.random.normal(jax.random.PRNGKey(42), (2, 6, 8))
    variables = vq.init({"params": KEY, "vq": KEY}, z, train=False)
    state0 = variables["vq_state"]

    (z_q, idx, loss, ppl, used), mutated = vq.apply(
        variables, z, train=True, mutable=["vq_state"], rngs={"vq": KEY}
    )
    assert z_q.shape == z.shape and idx.shape == (2, 6)
    assert float(loss) > 0.0
    state1 = mutated["vq_state"]
    assert int(state1["update_count"]) == int(state0["update_count"]) + 1
    assert not np.allclose(
        np.asarray(state1["ema_cluster_size"]), np.asarray(state0["ema_cluster_size"])
    )

    # eval: no loss, no state change needed
    z_q2, idx2, loss2, _, _ = vq.apply(variables, z, train=False)
    assert float(loss2) == 0.0
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_vq_encode_decode_roundtrip():
    vq = VectorQuantizer(dim=4, codebook_size=16)
    z = jax.random.normal(KEY, (1, 5, 4))
    variables = vq.init({"params": KEY, "vq": KEY}, z)
    idx = vq.apply(variables, z, method=VectorQuantizer.encode)
    dec = vq.apply(variables, idx, method=VectorQuantizer.decode)
    assert dec.shape == (1, 5, 4)
    idx2 = vq.apply(variables, dec, method=VectorQuantizer.encode)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_vq_dead_code_reset_fires():
    vq = VectorQuantizer(dim=4, codebook_size=8, decay=0.5, reset_unused_every=1)
    z = jnp.ones((1, 4, 4)) * 5.0  # all map to one code -> others decay dead
    variables = vq.init({"params": KEY, "vq": KEY}, z)
    state = variables["vq_state"]
    for i in range(3):
        (_, _, _, _, _), mutated = vq.apply(
            {"params": variables.get("params", {}), "vq_state": state},
            z,
            train=True,
            mutable=["vq_state"],
            rngs={"vq": jax.random.PRNGKey(i)},
        )
        state = mutated["vq_state"]
    # after resets, the replacement codes equal the batch vector (all 5s)
    cb = np.asarray(state["codebook"])
    assert np.any(np.all(np.abs(cb - 5.0) < 1e-5, axis=1))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def test_decoder_shapes_token_path():
    cfg = small_cfg(use_fsq=False, codebook_size=64)
    dec = EdgeDiffusionDecoder(cfg)
    x = jax.random.normal(KEY, (2, 20, cfg.n_mels))
    t = jnp.array([10, 500])
    sem = jax.random.randint(jax.random.PRNGKey(1), (2, 10), 0, 64)
    step = jnp.array([0, 3])
    params = dec.init(KEY, x, t, sem_idx=sem, step_idx=step)
    y = dec.apply(params, x, t, sem_idx=sem, step_idx=step)
    assert y.shape == (2, 20, cfg.n_mels)


def test_decoder_cross_q_chunk_transparent():
    # cfg.cross_q_chunk routes the decoder's cross-attention through the
    # q-chunked scan on long sequences; the forward must be unchanged.
    cfg_d = small_cfg(use_fsq=False, codebook_size=64, cross_q_chunk=0)
    cfg_c = small_cfg(use_fsq=False, codebook_size=64, cross_q_chunk=8)
    x = jax.random.normal(KEY, (1, 24, cfg_d.n_mels))
    t = jnp.array([100])
    sem = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, 64)
    dense = EdgeDiffusionDecoder(cfg_d)
    chunked = EdgeDiffusionDecoder(cfg_c)
    params = dense.init(KEY, x, t, sem_idx=sem)
    ref = dense.apply(params, x, t, sem_idx=sem)
    out = chunked.apply(params, x, t, sem_idx=sem)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_decoder_zero_init_output():
    cfg = small_cfg(use_fsq=False, codebook_size=64)
    dec = EdgeDiffusionDecoder(cfg)
    x = jax.random.normal(KEY, (1, 12, cfg.n_mels))
    t = jnp.array([100])
    sem = jnp.zeros((1, 6), dtype=jnp.int32)
    params = dec.init(KEY, x, t, sem_idx=sem)
    y = dec.apply(params, x, t, sem_idx=sem)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)


def test_decoder_use_depthwise_pre_net():
    """cfg.use_depthwise wires the depthwise-separable conv pre-net into the
    decoder (a capability the reference advertises but never consumes —
    PARITY.md deviations); default OFF keeps the reference architecture."""
    cfg_off = small_cfg(use_fsq=False, codebook_size=64)
    cfg_on = small_cfg(use_fsq=False, codebook_size=64, use_depthwise=True)
    x = jax.random.normal(KEY, (1, 16, cfg_off.n_mels))
    t = jnp.array([100])
    sem = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0, 64)

    off = EdgeDiffusionDecoder(cfg_off)
    params_off = off.init(KEY, x, t, sem_idx=sem)
    assert "pre_conv" not in params_off["params"]

    on = EdgeDiffusionDecoder(cfg_on)
    params_on = on.init(KEY, x, t, sem_idx=sem)
    assert {"depthwise", "pointwise", "norm"} <= set(
        params_on["params"]["pre_conv"].keys()
    )
    y = on.apply(params_on, x, t, sem_idx=sem)
    assert y.shape == (1, 16, cfg_off.n_mels)
    # The pre-net feeds the (zero-init-head) trunk, so the OUTPUT is still
    # zero at init; the hidden states it produces must differ from the
    # plain path — check via the prelude.
    h_on, _, _ = on.apply(params_on, x, t, sem_idx=sem, method=on.prelude)
    h_off, _, _ = off.apply(params_off, x, t, sem_idx=sem, method=off.prelude)
    assert not np.allclose(np.asarray(h_on), np.asarray(h_off), atol=1e-4)


def test_decoder_features_path_and_conditioning_matters():
    cfg = small_cfg()
    dec = EdgeDiffusionDecoder(cfg)
    x = jax.random.normal(KEY, (1, 16, cfg.n_mels))
    t = jnp.array([400])
    feats = jax.random.normal(jax.random.PRNGKey(2), (1, 8, cfg.semantic_dim))
    params = dec.init(KEY, x, t, sem_features=feats, step_idx=jnp.array([0]))
    # Perturb params with *random* noise so outputs are not trivially zero.
    # (A constant perturbation of the zero-init out_proj kernel is invisible:
    # the preceding LayerNorm makes sum(h) = 0, so h @ (c * ones) + c is the
    # same constant for any input.)
    leaves, treedef = jax.tree.flatten(params)
    pkeys = jax.random.split(jax.random.PRNGKey(99), len(leaves))
    leaves = [
        p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, pkeys)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    y1 = dec.apply(params, x, t, sem_features=feats, step_idx=jnp.array([0]))
    y2 = dec.apply(
        params, x, t, sem_features=jnp.zeros_like(feats), step_idx=jnp.array([0])
    )
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-6


def test_decoder_requires_conditioning():
    cfg = small_cfg()
    dec = EdgeDiffusionDecoder(cfg)
    x = jax.random.normal(KEY, (1, 8, cfg.n_mels))
    with pytest.raises(ValueError):
        dec.init(KEY, x, jnp.array([1]))


def test_decoder_param_count_matches_reference():
    # The reference decoder at the flagship config (160H/4L, 2304-code
    # token_emb) measures 2,270,160 params = 9.08 MB fp32 (instantiated from
    # /root/reference; its README's "~650K / 2.5 MB" claim is inaccurate).
    # Ours must match that measured count to within the odd norm vector.
    from edge_diffusion_tts_tpu.models.decoder import init_decoder_params

    cfg = CFG(out_dir="/tmp/edt_test_runs")
    dec = EdgeDiffusionDecoder(cfg)
    params = init_decoder_params(dec, KEY, cfg)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert abs(n - 2_270_160) < 1000, n
