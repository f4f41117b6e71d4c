"""Torch-module interchange + ONNX export leg (VERDICT r2 #8).

The reference exports compressed subnets to ONNX through torch
(pruning_compression.py:374-391). Here: build the reference-shaped torch
module from an arch dict, load the interchange state dict, and assert
forward parity against the JAX model — full and per-block-pruned shapes.
onnxruntime is absent in this image, so serialization itself is covered
by the gated-error contract test (export_onnx is a stock torch call).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from quantized_vit_tpu.interop import vit_params_to_torch
from quantized_vit_tpu.interop.torch_model import (bake_weight_quant,
                                                   build_torch_vit,
                                                   export_onnx,
                                                   load_interchange)
from quantized_vit_tpu.models import QuantConfig, VisionTransformer
from quantized_vit_tpu.models.vit import ViTConfig


def _jax_model(cfg):
    model = VisionTransformer(cfg)
    x0 = jnp.zeros((1, cfg.img_size, cfg.img_size, 3), jnp.float32)
    params = jax.device_get(
        model.init(jax.random.PRNGKey(0), x0)["params"])
    import flax

    return model, flax.core.unfreeze(params)


@pytest.mark.parametrize("per_block", [False, True])
def test_torch_module_matches_jax_forward(per_block):
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=2,
                    num_heads=4, num_classes=7, quant=QuantConfig.off(),
                    heads_per_block=(2, 4) if per_block else None,
                    hidden_per_block=(128, 256) if per_block else None)
    model, params = _jax_model(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    want = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    tmodel = build_torch_vit(dataclasses.asdict(cfg))
    load_interchange(tmodel, vit_params_to_torch(params))
    tmodel.eval()
    with torch.no_grad():
        got = tmodel(torch.as_tensor(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bake_weight_quant_matches_fake_quant_weights():
    from quantized_vit_tpu.models import init_quant_params_tree
    from quantized_vit_tpu.quant.lsfq import lsfq_levels

    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=1,
                    num_heads=2, num_classes=5,
                    quant=QuantConfig(enabled=True))
    model, params = _jax_model(cfg)
    params = init_quant_params_tree(params, init_bits=4.0)
    baked = bake_weight_quant(params, cfg)
    blk = params["blocks_0"]["attn"]["qkv"]
    lv = lsfq_levels(blk["kernel"], blk["d_quant_wt"], blk["q_m_wt"],
                     blk["t_quant_wt"])
    want = np.asarray(lv, np.float32) * np.asarray(blk["d_quant_wt"])
    got = np.asarray(baked["blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)
    # baked values land on the quant grid: few distinct levels
    assert len(np.unique(got / np.asarray(blk["d_quant_wt"]))) <= 17


def test_export_onnx_contract():
    """With the onnx package absent (this image), export_onnx must raise
    the documented error; when present, it must write a model file."""
    cfg = ViTConfig(img_size=32, patch_size=16, embed_dim=64, depth=1,
                    num_heads=2, num_classes=5, quant=QuantConfig.off())
    tmodel = build_torch_vit(dataclasses.asdict(cfg))
    try:
        import onnx  # noqa: F401
        has_onnx = True
    except ImportError:
        has_onnx = False
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/model.onnx"
        if has_onnx:
            export_onnx(path, tmodel, 32)
            import os

            assert os.path.getsize(path) > 0
        else:
            with pytest.raises(RuntimeError, match="onnx"):
                export_onnx(path, tmodel, 32)
