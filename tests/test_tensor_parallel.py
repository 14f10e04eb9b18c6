"""Model-axis (tensor) parallel HuBERT encode on the virtual mesh:
placement rules land on the right axes; TP output == single-device output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from edge_diffusion_tts_tpu.config import CFG
from edge_diffusion_tts_tpu.models import SemanticEncoder
from edge_diffusion_tts_tpu.models.hubert import HubertConfig
from edge_diffusion_tts_tpu.parallel import make_mesh
from edge_diffusion_tts_tpu.parallel.tensor_parallel import (
    encoder_param_shardings,
    hubert_param_spec,
    make_tp_encode,
    shard_encoder_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)
# Long-running lane: excluded from `pytest -m 'not slow'` (CLAUDE.md).
pytestmark = [pytest.mark.slow, pytestmark]


def test_hubert_param_spec_rules():
    class K:  # stand-in for flax DictKey
        def __init__(self, key):
            self.key = key

    assert hubert_param_spec([K("layer_0"), K("q_proj"), K("kernel")]) == P(
        None, "model"
    )
    assert hubert_param_spec([K("layer_0"), K("q_proj"), K("bias")]) == P("model")
    assert hubert_param_spec([K("layer_0"), K("out_proj"), K("kernel")]) == P(
        "model", None
    )
    assert hubert_param_spec(
        [K("layer_1"), K("intermediate_dense"), K("kernel")]
    ) == P(None, "model")
    assert hubert_param_spec(
        [K("layer_1"), K("output_dense"), K("kernel")]
    ) == P("model", None)
    assert hubert_param_spec([K("feature_extractor"), K("conv_0"), K("kernel")]) == P()


def test_tp_encode_matches_single_device():
    cfg = CFG(segment_secs=0.1)
    # tiny hubert but with shardable dims: heads=4, intermediate 64, both
    # divisible by model axis 2
    hcfg = HubertConfig.tiny()
    encoder = SemanticEncoder(cfg, hcfg)
    wav = jax.random.normal(jax.random.PRNGKey(0), (4, cfg.segment_len)) * 0.1
    variables = encoder.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2),
         "vq": jax.random.PRNGKey(3)},
        wav, train=False,
    )
    params = variables["params"]

    ref = encoder.apply({"params": params}, wav, method=encoder.encode)

    mesh = make_mesh((4, 2))
    with mesh:
        tp_params = shard_encoder_params(params, mesh)
        # verify at least one kernel actually sharded over the model axis
        sh = encoder_param_shardings(params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(sh)
        model_sharded = [
            p for p, s in flat if "model" in str(s.spec)
        ]
        assert model_sharded, "no param got a model-axis placement"

        encode = make_tp_encode(encoder, mesh)
        out = encode(tp_params, wav)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
