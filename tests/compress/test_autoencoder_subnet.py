"""ConvTranspose + GroupNorm pruning: zeroing whole norm groups then slicing
must preserve the forward exactly (the SPREAD-transform contract,
pruning_dependency.py:426-538 + ConvTranspose2dOTO, operator.py:291-349)."""

import numpy as np
import pytest

import flax
import jax
import jax.numpy as jnp

from quantized_vit_tpu.compress import construct_subnet_autoencoder
from quantized_vit_tpu.graph import autoencoder_node_groups
from quantized_vit_tpu.models import (
    AutoencoderConfig,
    ConvAutoencoder,
    QuantConfig,
    init_quant_params_tree,
)
from quantized_vit_tpu.opt.groups import (
    Transform,
    get_path,
    group_mask_for_param,
    set_path,
)


def _zero_groups(params, group, idxes):
    mask = np.zeros((group.num_groups,), np.float32)
    mask[np.asarray(idxes)] = 1.0
    for e in group.entries:
        if e.transform == Transform.NO_PRUNE:
            continue
        p = get_path(params, e.path)
        m = group_mask_for_param(jnp.array(mask), e.transform, p.shape,
                                 group.num_heads)
        params = set_path(params, e.path, p * (1.0 - m))
    return params


@pytest.mark.parametrize("quant", [False, True])
def test_autoencoder_subnet_forward_parity(quant):
    cfg = AutoencoderConfig(
        widths=(8, 16), norm_groups=4, in_channels=3,
        quant=QuantConfig(enabled=True) if quant else QuantConfig.off(),
    )
    model = ConvAutoencoder(cfg)
    x = jnp.array(np.random.default_rng(0).standard_normal((2, 16, 16, 3)),
                  jnp.float32)
    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])
    if quant:
        params = init_quant_params_tree(params, init_bits=8.0)

    groups = autoencoder_node_groups(cfg, params)
    by_id = {g.id: g for g in groups}
    # drop one norm group from enc_1 and dec_0, two from enc_0
    params = _zero_groups(params, by_id["enc_0"], [1, 3])
    params = _zero_groups(params, by_id["enc_1"], [0])
    params = _zero_groups(params, by_id["dec_0"], [2])

    sparse_out = model.apply({"params": params}, x)

    new_cfg, new_params = construct_subnet_autoencoder(cfg, params, groups)
    assert new_cfg.widths == (4, 12)
    assert new_cfg.enc_norm_groups == (2, 3)
    # decoder: dec_0 (width 8, G=4) lost 1 group; dec_1 untouched
    assert new_cfg.dec_widths[0] == 6
    assert new_cfg.dec_norm_groups == (3, 4)

    compressed = ConvAutoencoder(new_cfg)
    dense_out = compressed.apply({"params": new_params}, x)
    np.testing.assert_allclose(
        np.asarray(dense_out), np.asarray(sparse_out), rtol=1e-5, atol=1e-5
    )


def test_autoencoder_unprunable_output_conv_kept():
    cfg = AutoencoderConfig(widths=(8,), norm_groups=2, in_channels=3)
    model = ConvAutoencoder(cfg)
    x = jnp.zeros((1, 8, 8, 3), jnp.float32)
    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])
    groups = autoencoder_node_groups(cfg, params)
    out_g = [g for g in groups if g.id == "out_conv"][0]
    assert not out_g.is_prunable
    # shapes reconstruct the input resolution and channels
    assert model.apply({"params": params}, x).shape == x.shape


def test_autoencoder_instance_norm_case():
    """InstanceNorm2dOTO (operator.py:387-457) = GroupNorm with
    norm_groups == channels: per-channel pruning granularity, lossless
    slicing."""
    cfg = AutoencoderConfig(widths=(8,), norm_groups=8, in_channels=3)
    model = ConvAutoencoder(cfg)
    x = jnp.array(np.random.default_rng(1).standard_normal((2, 16, 16, 3)),
                  jnp.float32)
    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])

    groups = autoencoder_node_groups(cfg, params)
    by_id = {g.id: g for g in groups}
    assert by_id["enc_0"].num_groups == 8  # one group per channel
    params = _zero_groups(params, by_id["enc_0"], [2, 5, 7])

    sparse_out = model.apply({"params": params}, x)
    new_cfg, new_params = construct_subnet_autoencoder(cfg, params, groups)
    assert new_cfg.widths == (5,)
    assert new_cfg.enc_norm_groups == (5,)  # still instance norm
    dense_out = ConvAutoencoder(new_cfg).apply({"params": new_params}, x)
    np.testing.assert_allclose(np.asarray(dense_out), np.asarray(sparse_out),
                               rtol=1e-5, atol=1e-5)


def test_unet_skip_concat_compress_is_lossless():
    """U-Net concat skips: the concat-fed decoder in-dims slice with
    per-segment offsets (the reference's auxiliary-group wiring,
    pruning_dependency.py step 8 / node_group.py:241-254). Zero groups in
    BOTH producers of a concat, slice, and the forward must be exact."""
    cfg = AutoencoderConfig(widths=(8, 16, 16), norm_groups=4, in_channels=3,
                            skip_concat=True)
    model = ConvAutoencoder(cfg)
    x = jnp.array(np.random.default_rng(2).standard_normal((2, 16, 16, 3)),
                  jnp.float32)
    params = flax.core.unfreeze(model.init(jax.random.PRNGKey(0), x)["params"])
    # dec_0 input = bottleneck; dec_0 out concats with enc_1, dec_1 out
    # concats with enc_0
    assert params["dec_1"]["kernel"].shape[-2] == \
        cfg.decoder_widths[0] + cfg.widths[1]

    groups = autoencoder_node_groups(cfg, params)
    by_id = {g.id: g for g in groups}
    # prune one norm group from each concat producer + a decoder stage
    params = _zero_groups(params, by_id["enc_0"], [1])
    params = _zero_groups(params, by_id["enc_1"], [0, 3])
    params = _zero_groups(params, by_id["dec_0"], [2])

    sparse_out = model.apply({"params": params}, x)
    new_cfg, new_params = construct_subnet_autoencoder(cfg, params, groups)
    assert new_cfg.widths == (6, 8, 16)
    # concat-fed in-dims shrank by BOTH producers' cuts (dec_2 is the last
    # stage: mirror < 0, so out_conv sees no concat)
    assert new_params["dec_1"]["kernel"].shape[-2] == \
        new_cfg.dec_widths[0] + new_cfg.widths[1]
    assert new_params["dec_2"]["kernel"].shape[-2] == \
        new_cfg.dec_widths[1] + new_cfg.widths[0]
    assert new_params["out_conv"]["kernel"].shape[-2] == \
        new_cfg.dec_widths[2]

    dense_out = ConvAutoencoder(new_cfg).apply({"params": new_params}, x)
    np.testing.assert_allclose(np.asarray(dense_out),
                               np.asarray(sparse_out), rtol=1e-5, atol=1e-5)
