"""HLS header export parity vs the reference generator (qnn_mem_process.py).

The reference's FPGA artifact is pure host-side text generation, so parity
is asserted EXACTLY: same SIMD big-int packing, same [PE][TILES] tiling,
same derived inc/bias bit widths, and byte-identical `param.h`/`config.h`
fragments for the same integer inputs.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from _reference import load_reference_module, reference_available

from quantized_vit_tpu.artifact.hls import (
    HLSLayer,
    export_ultranet_hls,
    inc_bias_tiles,
    int_bit_width,
    pack_words,
    tile_pe,
)

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")


def _ref_mem():
    # qnn_mem_process imports qnn_param_reader at module scope; load that
    # first under its plain name so the import resolves.
    sys.path.insert(0, "/root/reference/4-bit quantization")
    try:
        return load_reference_module(
            "4-bit quantization/qnn_mem_process.py", "ref_qnn_mem_process")
    finally:
        sys.path.pop(0)


def _ref_layer(mem, name, w_bit, in_bit, out_bit, l_shift, pe, simd,
               config_entry):
    return mem.QNNLayerMemProcess(
        name, reader=None, config={name: config_entry}, w_bit=w_bit,
        in_bit=in_bit, out_bit=out_bit, l_shift=l_shift, pe=pe, simd=simd)


@needs_ref
def test_pack_and_tile_match_reference():
    mem = _ref_mem()
    rng = np.random.default_rng(0)
    w = rng.integers(-7, 8, size=(16, 27))  # conv_0-like: 16 out, 3*3*3
    proc = _ref_layer(mem, "conv_0", 4, 8, 4, 8, pe=16, simd=3,
                      config_entry={})
    ref = proc.w_to_hls_array(w)
    ours = tile_pe(pack_words(w, elem_bit=4, simd=3), pe=16)
    assert ref == ours
    assert proc.w_tiles == len(ours[0])


@needs_ref
def test_pack_negative_twos_complement_matches_reference():
    mem = _ref_mem()
    vals = np.array([[-7, -1, 3, 7, -8, 0, 1, -2]])
    ref = mem.array_to_string(vals[0], 4)
    ours = pack_words(vals, elem_bit=4, simd=8)[0][0]
    assert ref == ours


@needs_ref
def test_inc_bias_tiles_and_bit_widths_match_reference():
    mem = _ref_mem()
    rng = np.random.default_rng(1)
    inc = rng.integers(-3000, 3000, size=32)
    bias = rng.integers(-70000, 70000, size=32)
    proc = _ref_layer(mem, "conv_1", 4, 4, 4, 8, pe=8, simd=16,
                      config_entry={})
    ref_inc, ref_bias = proc.inc_bias_to_hls_array(inc.copy(), bias.copy())
    np.testing.assert_array_equal(ref_inc, inc_bias_tiles(inc, 8))
    np.testing.assert_array_equal(ref_bias, inc_bias_tiles(bias, 8))
    assert proc.get_inc_bit_width(ref_inc) == int_bit_width(ref_inc)
    assert proc.get_bias_bit_width(ref_bias) == int_bit_width(ref_bias)


@needs_ref
def test_header_text_matches_reference_exactly():
    """Full conv layer: same int weights/inc/bias -> byte-identical param.h
    fragment and config.h fragment."""
    mem = _ref_mem()
    rng = np.random.default_rng(2)
    out_ch, in_ch, k = 32, 16, 3
    w_okki_flat = rng.integers(-7, 8, size=(out_ch, k * k * in_ch))
    inc = rng.integers(-2000, 2000, size=out_ch)
    bias = rng.integers(-60000, 60000, size=out_ch)

    cfg = {"k": 3, "s": 1, "p": 1, "in_shape": [16, 80, 160],
           "out_shape": [32, 40, 80]}
    proc = _ref_layer(mem, "conv_1", 4, 4, 4, 8, pe=8, simd=16,
                      config_entry=cfg)
    ref_w = proc.w_to_hls_array(w_okki_flat)
    ref_inc, ref_bias = proc.inc_bias_to_hls_array(inc.copy(), bias.copy())
    proc.hls_w, proc.hls_inc, proc.hls_bias = ref_w, ref_inc, ref_bias
    proc.inc_bit_width = proc.get_inc_bit_width(ref_inc)
    proc.bias_bit_width = proc.get_bias_bit_width(ref_bias)
    ref_param = proc.layer_param_to_init_str(ref_w, ref_inc, ref_bias)
    ref_config = proc.conv_config_str()

    # ours: same flat [O, K*K*I] via an HWIO kernel whose moveaxis/reshape
    # reproduces that exact order
    kernel_hwio = np.moveaxis(
        w_okki_flat.reshape(out_ch, k, k, in_ch), 0, -1)
    entry = {"w_bit": 4, "in_bit": 4, "out_bit": 4, "l_shift": 8,
             "k": 3, "s": 1, "p": 1,
             "in_shape": [80, 160, 16], "out_shape": [40, 80, 32]}
    layer = HLSLayer("conv_1", entry, pe=8, simd=16).process(
        kernel_hwio, inc, bias)
    assert layer.param_str() == ref_param
    assert layer.config_str() == ref_config


@needs_ref
def test_last_conv_header_matches_reference():
    mem = _ref_mem()
    rng = np.random.default_rng(3)
    out_ch, in_ch = 36, 64
    w_flat = rng.integers(-7, 8, size=(out_ch, in_ch))  # 1x1 conv
    cfg = {"k": 1, "s": 1, "p": 0, "in_shape": [64, 20, 40],
           "out_shape": [36, 20, 40]}
    proc = _ref_layer(mem, "conv_8", 4, 4, 32, 8, pe=2, simd=8,
                      config_entry=cfg)
    ref_w = proc.w_to_hls_array(w_flat)
    proc.hls_w = ref_w
    ref_param = proc.last_layer_param_to_init_str(ref_w)
    ref_config = proc.last_conv_config_str()

    kernel_hwio = np.moveaxis(w_flat.reshape(out_ch, 1, 1, in_ch), 0, -1)
    entry = {"w_bit": 4, "in_bit": 4, "out_bit": 32, "l_shift": 8,
             "k": 1, "s": 1, "p": 0,
             "in_shape": [20, 40, 64], "out_shape": [20, 40, 36]}
    layer = HLSLayer("conv_8", entry, pe=2, simd=8, last=True).process(
        kernel_hwio)
    assert layer.param_str() == ref_param
    assert layer.config_str() == ref_config


def test_export_ultranet_hls_end_to_end(tmp_path):
    """Train-shaped random UltraNet params -> param.h/config.h/last_bias."""
    import flax
    import jax
    import jax.numpy as jnp

    from quantized_vit_tpu.models import UltraNet

    model = UltraNet()
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables["batch_stats"])

    out = export_ultranet_hls(params, batch_stats, str(tmp_path))
    assert (tmp_path / "param.h").exists()
    assert (tmp_path / "config.h").exists()
    assert (tmp_path / "last_bias.npy").exists()
    assert (tmp_path / "last_bias.bin").exists()
    # every layer emitted
    for i in range(9):
        assert f"conv_{i}_w" in out["param"]
        assert f"#define CONV_{i}_PE" in out["config"]
    # intermediate layers carry inc/bias; the last conv doesn't
    assert "conv_7_inc" in out["param"]
    assert "conv_8_inc" not in out["param"]
    assert np.load(tmp_path / "last_bias.npy").shape == (36,)


@needs_ref
def test_linear_layer_matches_reference():
    """Dense path (QNNLayerMemProcess.linear/linear_config_str,
    qnn_mem_process.py:194-218, 408-431): byte-identical param and config
    fragments for the same integer inputs."""
    mem = _ref_mem()
    rng = np.random.default_rng(4)
    out_len, in_len = 16, 64
    w = rng.integers(-7, 8, size=(out_len, in_len))
    inc = rng.integers(-1500, 1500, size=out_len)
    bias = rng.integers(-40000, 40000, size=out_len)

    cfg = {"in_len": in_len, "out_len": out_len}
    proc = _ref_layer(mem, "linear_0", 4, 4, 4, 8, pe=4, simd=8,
                      config_entry=cfg)
    ref_w = proc.w_to_hls_array(w)
    ref_inc, ref_bias = proc.inc_bias_to_hls_array(inc.copy(), bias.copy())
    proc.hls_w, proc.hls_inc, proc.hls_bias = ref_w, ref_inc, ref_bias
    proc.inc_bit_width = proc.get_inc_bit_width(ref_inc)
    proc.bias_bit_width = proc.get_bias_bit_width(ref_bias)
    ref_param = proc.layer_param_to_init_str(ref_w, ref_inc, ref_bias)
    ref_config = proc.linear_config_str()

    entry = {"w_bit": 4, "in_bit": 4, "out_bit": 4, "l_shift": 8,
             "in_len": in_len, "out_len": out_len}
    layer = HLSLayer("linear_0", entry, pe=4, simd=8).process_linear(
        w.T, inc, bias)  # flax [in, out]
    assert layer.param_str() == ref_param
    assert layer.config_str() == ref_config


@needs_ref
def test_last_linear_matches_reference():
    mem = _ref_mem()
    rng = np.random.default_rng(5)
    out_len, in_len = 8, 32
    w = rng.integers(-7, 8, size=(out_len, in_len))
    cfg = {"in_len": in_len, "out_len": out_len}
    proc = _ref_layer(mem, "linear_1", 4, 4, 4, 8, pe=2, simd=8,
                      config_entry=cfg)
    ref_w = proc.w_to_hls_array(w)
    proc.hls_w = ref_w
    ref_param = proc.last_layer_param_to_init_str(ref_w)
    ref_config = proc.last_linear_config_str()

    entry = {"w_bit": 4, "in_bit": 4, "out_bit": 4, "l_shift": 8,
             "in_len": in_len, "out_len": out_len}
    layer = HLSLayer("linear_1", entry, pe=2, simd=8,
                     last=True).process_linear(w.T)
    assert layer.param_str() == ref_param
    assert layer.config_str() == ref_config


def test_export_ultranet_hls_handles_pruned_channels(tmp_path):
    """GETA-pruned channel counts need not divide the dense PE table; the
    exporter degrades each layer's PE to gcd(out_ch, PE) and records the
    effective value in config.h."""
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
        params, target_group_sparsity=0.3, num_group_divisible=1, seed=4)
    m2, p2, s2 = oto.construct_subnet(sparse)

    out = export_ultranet_hls(p2, s2, str(tmp_path))
    ch0 = p2["conv_0"]["kernel"].shape[-1]
    import math
    assert f"#define CONV_0_OFM_CH {ch0} " in out["config"]
    assert f"#define CONV_0_PE {math.gcd(ch0, 16)} " in out["config"]
