"""Torch-checkpoint interop: reference state dicts -> flax params (and back).

These are the "switch from the reference" tests: take an actual torch
module's state_dict (fp32 ViT, QAT-quantized ViT, UltraNet), convert via
the interop package, and assert forward parity between the torch model and
the flax model fed the converted params.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.interop import (
    load_torch_checkpoint,
    normalize_state_dict,
    ultranet_params_from_torch,
    ultranet_params_to_torch,
    vit_params_from_torch,
    vit_params_to_torch,
)
from quantized_vit_tpu.models import (
    QuantConfig,
    UltraNet,
    ViTConfig,
    VisionTransformer,
    init_quant_params_tree,
)

from tests._reference import reference_available, load_reference_module

torch = pytest.importorskip("torch")
flax = pytest.importorskip("flax")

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)

SMALL = dict(img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=4,
             num_classes=10)


@pytest.fixture(scope="module")
def ref_vit_mod():
    return load_reference_module("QViT_with_GETA/vit_model.py", "ref_vit_interop")


def _ref_vit(ref_vit_mod, representation_size=None):
    m = ref_vit_mod.VisionTransformer(
        representation_size=representation_size, drop_ratio=0.0,
        attn_drop_ratio=0.0, drop_path_ratio=0.0, **SMALL,
    )
    m.eval()
    return m


def test_fp32_vit_state_dict_roundtrip_parity(ref_vit_mod):
    ref = _ref_vit(ref_vit_mod)
    params = vit_params_from_torch(ref.state_dict())

    cfg = ViTConfig(quant=QuantConfig.off(), **SMALL)
    model = VisionTransformer(cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # exact state-dict round trip
    back = vit_params_to_torch(params)
    for k, v in ref.state_dict().items():
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


def test_pre_logits_checkpoint_maps(ref_vit_mod):
    ref = _ref_vit(ref_vit_mod, representation_size=48)
    params = vit_params_from_torch(ref.state_dict())
    assert params["pre_logits"]["kernel"].shape == (SMALL["embed_dim"], 48)

    cfg = ViTConfig(quant=QuantConfig.off(), representation_size=48, **SMALL)
    model = VisionTransformer(cfg)
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_qat_vit_state_dict_parity(ref_vit_mod):
    """QAT checkpoint: Linear/Conv2d swapped for Quantize* twins
    (quant_model.py:15-82) -> quant scalars ride along into the params tree
    and the quantized forwards agree."""
    ref_ql = load_reference_module(
        "QViT_with_GETA/only_train_once/quantization/quant_layers.py",
        "ref_quant_layers_interop",
    )

    def swap(model):
        for name, child in list(model.named_children()):
            if isinstance(child, torch.nn.Linear):
                setattr(model, name, ref_ql.QuantizeLinear.from_module(
                    child, quant_type=ref_ql.QuantizationType.SYMMETRIC_NONLINEAR,
                    quant_mode=ref_ql.QuantizationMode.WEIGHT_AND_ACTIVATION,
                    num_bits=32))
            elif isinstance(child, torch.nn.Conv2d):
                setattr(model, name, ref_ql.QuantizeConv2d.from_module(
                    child, quant_type=ref_ql.QuantizationType.SYMMETRIC_NONLINEAR,
                    quant_mode=ref_ql.QuantizationMode.WEIGHT_AND_ACTIVATION,
                    num_bits=32))
            else:
                swap(child)
        return model

    ref_q = swap(_ref_vit(ref_vit_mod))
    ref_q.eval()

    params = vit_params_from_torch(ref_q.state_dict())
    # quant scalars landed next to the kernels with shape (1,)
    qkv = params["blocks_0"]["attn"]["qkv"]
    for name in ("d_quant_wt", "q_m_wt", "t_quant_wt",
                 "d_quant_act", "q_m_act", "t_quant_act"):
        assert qkv[name].shape == (1,), name

    cfg = ViTConfig(
        quant=QuantConfig(enabled=True, nonlinear=True, quantize_acts=True),
        **SMALL,
    )
    model = VisionTransformer(cfg)
    x = np.random.default_rng(2).standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref_q(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_load_torch_checkpoint_wrappers(ref_vit_mod, tmp_path):
    """The combined {model, optimizer, args} checkpoint (train.py:517-532)
    and a module.-prefixed save both normalize to the same state dict."""
    ref = _ref_vit(ref_vit_mod)
    sd = ref.state_dict()

    p1 = tmp_path / "combined.pt"
    torch.save({"model": sd, "optimizer": {}, "args": {"lr": 1e-4}}, p1)
    got = load_torch_checkpoint(str(p1))
    assert set(got) == set(sd)

    wrapped = {f"module.{k}": v for k, v in sd.items()}
    norm = normalize_state_dict(wrapped)
    assert set(norm) == set(sd)

    # whole pickled module (predict.py:43)
    p2 = tmp_path / "whole.pt"
    torch.save(ref, p2)
    got2 = load_torch_checkpoint(str(p2))
    np.testing.assert_array_equal(got2["cls_token"], sd["cls_token"].numpy())


def test_strict_rejects_unknown_keys(ref_vit_mod):
    ref = _ref_vit(ref_vit_mod)
    sd = dict(ref.state_dict())
    sd["blocks.0.attn.qkv.mystery_buffer_x"] = torch.zeros(3, 3, 3)
    with pytest.raises(KeyError):
        vit_params_from_torch(sd)
    params = vit_params_from_torch(sd, strict=False)
    assert "mystery_buffer_x" not in params["blocks_0"]["attn"]["qkv"]


@pytest.fixture(scope="module")
def ref_ultranet():
    load_reference_module("4-bit quantization/quant_ultra.py", "quant_ultra")
    mymodel = load_reference_module("4-bit quantization/mymodel.py", "ref_mymodel")
    torch.manual_seed(0)
    m = mymodel.UltraNetQua()
    # randomize BN stats so the fold isn't trivially identity
    for mod in m.modules():
        if isinstance(mod, torch.nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.05)
            mod.running_var.uniform_(0.5, 1.5)
            mod.weight.data.uniform_(0.8, 1.2)
            mod.bias.data.normal_(0, 0.05)
    m.eval()
    return m


def test_ultranet_state_dict_parity(ref_ultranet):
    params, stats = ultranet_params_from_torch(ref_ultranet.state_dict())
    model = UltraNet()
    rng = np.random.default_rng(3)
    x = rng.random((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        io_ref, p_ref = ref_ultranet(torch.tensor(x.transpose(0, 3, 1, 2)))
    io, p = model.apply(
        {"params": params, "batch_stats": stats}, jnp.array(x)
    )
    np.testing.assert_allclose(np.asarray(io), io_ref.numpy(),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(p), p_ref[0].numpy(),
                               rtol=1e-3, atol=1e-3)

    back = ultranet_params_to_torch(params, stats)
    want = {k: v for k, v in ref_ultranet.state_dict().items()
            if not k.endswith("num_batches_tracked")}
    assert set(back) == set(want)
    for k, v in want.items():
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)
