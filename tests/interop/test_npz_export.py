"""Reference-format NPZ/config.json export: the reference's own
`qnn_param_reader.py` must consume our NPZ and produce the same integer
weights and (inc, bias) tables our pipeline computes."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from _reference import load_reference_module, reference_available

from quantized_vit_tpu.interop import (
    export_reference_ultranet,
    ultranet_reference_config,
)
from quantized_vit_tpu.quant.integer import (
    bn_act_quantize_int,
    weight_quantize_int,
)

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ultranet_tree():
    import flax
    import jax
    import jax.numpy as jnp

    from quantized_vit_tpu.models import UltraNet

    model = UltraNet()
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 64, 3),
                                                    jnp.float32))
    params = flax.core.unfreeze(v["params"])
    batch_stats = flax.core.unfreeze(v["batch_stats"])
    # non-trivial BN stats so (inc, bias) isn't degenerate
    rng = np.random.default_rng(0)
    for k in batch_stats:
        batch_stats[k]["mean"] = rng.standard_normal(
            batch_stats[k]["mean"].shape).astype(np.float32) * 0.1
        batch_stats[k]["var"] = (rng.random(
            batch_stats[k]["var"].shape).astype(np.float32) * 0.5 + 0.5)
    return params, batch_stats


@needs_ref
def test_reference_reader_consumes_our_npz(ultranet_tree, tmp_path):
    params, batch_stats = ultranet_tree
    npz_path, cfg_path = export_reference_ultranet(
        params, batch_stats, str(tmp_path))

    sys.path.insert(0, "/root/reference/4-bit quantization")
    try:
        reader_mod = load_reference_module(
            "4-bit quantization/qnn_param_reader.py", "ref_qnn_param_reader")
    finally:
        sys.path.pop(0)
    reader = reader_mod.QNNParamReader(npz_path)

    for i in range(8):
        in_bit = 8 if i == 0 else 4
        ref_qw = reader.read_qconv_weight(w_bit=4)
        ref_inc, ref_bias = reader.read_qbarch_norm_act_param(
            w_bit=4, in_bit=in_bit, out_bit=4, l_shift=8)
        ours_qw = np.moveaxis(
            np.asarray(weight_quantize_int(params[f"conv_{i}"]["kernel"],
                                           bit=4)), -1, 0).transpose(0, 3, 1, 2)
        np.testing.assert_array_equal(ref_qw, ours_qw)
        ours_inc, ours_bias = bn_act_quantize_int(
            params[f"bn_{i}"]["scale"], params[f"bn_{i}"]["bias"],
            batch_stats[f"bn_{i}"]["mean"], batch_stats[f"bn_{i}"]["var"],
            1e-5, w_bit=4, in_bit=in_bit, out_bit=4, l_shift=8)
        # numpy libm vs XLA CPU differ by 1 ULP on sqrt/div chains; a tie
        # at a round boundary then moves one integer step. |values| are
        # ~1e4-1e5 here, so +-1 is ~2^-17 relative — below the quantizer's
        # own resolution.
        np.testing.assert_allclose(ref_inc, np.asarray(ours_inc), atol=1)
        np.testing.assert_allclose(ref_bias, np.asarray(ours_bias), atol=1)

    ref_last_w = reader.read_qconv_weight(w_bit=4)
    assert ref_last_w.shape == (36, 64, 1, 1)
    last_bias = reader.get_last()
    assert last_bias.shape == (36,)
    np.testing.assert_allclose(
        last_bias, np.asarray(params["conv_8"]["bias"]), rtol=1e-6)


def test_reference_config_geometry():
    cfg = ultranet_reference_config((3, 160, 320))
    assert cfg["conv_0"]["in_shape"] == [3, 160, 320]
    assert cfg["conv_0"]["out_shape"] == [16, 160, 320]  # same-pad k3 s1
    assert cfg["pool_0"] == {"in_shape": [16, 160, 320], "p": 2,
                             "out_shape": [16, 80, 160]}
    # 4 pools halve 160x320 -> 10x20
    assert cfg["conv_8"]["in_shape"] == [64, 10, 20]
    assert cfg["conv_8"]["out_shape"] == [36, 10, 20]
    assert cfg["conv_8"]["k"] == 1 and cfg["conv_8"]["p"] == 0
    assert len([k for k in cfg if k.startswith("conv_")]) == 9
    assert len([k for k in cfg if k.startswith("pool_")]) == 4


def test_export_writes_files(ultranet_tree, tmp_path):
    params, batch_stats = ultranet_tree
    npz_path, cfg_path = export_reference_ultranet(
        params, batch_stats, str(tmp_path / "exp"))
    arrs = np.load(npz_path)
    # 8 * (w + 5 bn) + last w + last bias = 50 arrays
    assert len(arrs.files) == 50
    with open(cfg_path) as f:
        cfg = json.load(f)
    assert "conv_8" in cfg and "pool_3" in cfg


def test_compressed_checkpoint_config_matches_npz(tmp_path):
    """Regression: config.json channel counts came from the dense layer
    table while the npz carried sliced arrays — a compressed checkpoint
    exported artifacts that silently disagreed."""
    import flax
    import jax
    import jax.numpy as jnp

    from quantized_vit_tpu.graph import OTO
    from quantized_vit_tpu.models import UltraNet

    model = UltraNet()
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(v["params"])
    stats = flax.core.unfreeze(v["batch_stats"])
    oto = OTO(model, params, batch_stats=stats)
    sparse = oto.random_set_zero_groups(
        params, target_group_sparsity=0.4, num_group_divisible=1, seed=1)
    m2, p2, s2 = oto.construct_subnet(sparse)

    npz_path, cfg_path = export_reference_ultranet(p2, s2,
                                                   str(tmp_path / "c"))
    arrs = np.load(npz_path)
    with open(cfg_path) as f:
        cfg = json.load(f)
    # conv_0 weight is arr_0 [O, I, K, K]; config must agree on O
    assert cfg["conv_0"]["out_shape"][0] == arrs["arr_0"].shape[0]
    assert cfg["conv_1"]["in_shape"][0] == arrs["arr_0"].shape[0]
    assert cfg["conv_0"]["out_shape"][0] < 16  # actually pruned
