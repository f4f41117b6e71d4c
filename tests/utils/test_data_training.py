"""Data loader static shapes + end-to-end TrainLoop smoke on a tiny ViT."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from quantized_vit_tpu.utils import (
    ArrayDataset,
    DataLoader,
    TrainLoop,
    evaluate,
    read_split_data,
)


def test_dataloader_static_shapes_and_padding():
    ds = ArrayDataset(np.zeros((10, 4, 4, 3), np.float32),
                      np.arange(10) % 3)
    # drop_last
    batches = list(DataLoader(ds, batch_size=4))
    assert len(batches) == 2
    assert all(x.shape == (4, 4, 4, 3) for x, _, _ in batches)
    assert all(m.all() for _, _, m in batches)
    # pad_last: 3 batches, final has 2 valid rows
    batches = list(DataLoader(ds, batch_size=4, pad_last=True))
    assert len(batches) == 3
    assert batches[-1][0].shape == (4, 4, 4, 3)
    assert batches[-1][2].sum() == 2


def test_dataloader_shuffle_covers_all_samples():
    ds = ArrayDataset(
        np.arange(8, dtype=np.float32).reshape(8, 1, 1, 1), np.arange(8))
    seen = []
    for _, labels, _ in DataLoader(ds, batch_size=2, shuffle=True, seed=1):
        seen.extend(labels.tolist())
    assert sorted(seen) == list(range(8))


def test_read_split_data_folder_tree(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    for cls in ("a", "b"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(5):
            Image.new("RGB", (8, 8)).save(d / f"{i}.png")
    tp, tl, vp, vl = read_split_data(str(tmp_path), val_rate=0.2, seed=0)
    assert len(tp) + len(vp) == 10
    assert len(vp) == 2
    assert set(tl + vl) == {0, 1}


def _tiny_vit_setup(enable_quant=True, num_classes=4):
    from quantized_vit_tpu.models import (
        QuantConfig, ViTConfig, VisionTransformer, init_quant_params_tree)
    import flax

    cfg = ViTConfig(
        img_size=16, patch_size=8, embed_dim=32, depth=1, num_heads=2,
        num_classes=num_classes,
        quant=QuantConfig(enabled=enable_quant),
    )
    model = VisionTransformer(cfg)
    x0 = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = flax.core.unfreeze(
        model.init(jax.random.PRNGKey(0), x0)["params"])
    if enable_quant:
        params = init_quant_params_tree(params, init_bits=8.0)
    return cfg, model, params


def test_trainloop_reduces_loss_and_preserves_finiteness():
    from quantized_vit_tpu.graph import vit_node_groups
    from quantized_vit_tpu.opt import GETA, GETAConfig

    cfg, model, params = _tiny_vit_setup()
    groups = vit_node_groups(cfg, params)
    opt = GETA(groups, params, GETAConfig(
        lr=5e-2, lr_quant=1e-3, variant="sgd",
        start_projection_step=1000, start_pruning_step=2000,
    ))

    rng = np.random.default_rng(0)
    images = rng.standard_normal((16, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 16)
    loader = DataLoader(ArrayDataset(images, labels), batch_size=8)

    def apply_fn(p, x, step_rng):
        return model.apply({"params": p}, x, deterministic=True)

    loop = TrainLoop(apply_fn=apply_fn, optimizer=opt, num_classes=4,
                     label_smooth=True)
    losses = []
    key = jax.random.PRNGKey(0)
    for epoch in range(3):
        params, m = loop.train_one_epoch(params, loader, epoch, key)
        losses.append(m["loss"])
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_trainloop_with_mixup_kd_and_lasso_runs():
    from quantized_vit_tpu.graph import vit_node_groups
    from quantized_vit_tpu.opt import GETA, GETAConfig

    cfg, model, params = _tiny_vit_setup()
    groups = vit_node_groups(cfg, params)
    opt = GETA(groups, params, GETAConfig(
        lr=1e-2, variant="sgd",
        start_projection_step=1000, start_pruning_step=2000))

    rng = np.random.default_rng(1)
    images = rng.standard_normal((8, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 8)
    loader = DataLoader(ArrayDataset(images, labels), batch_size=8)

    def apply_fn(p, x, step_rng):
        return model.apply({"params": p}, x, deterministic=True)

    teacher_params = params

    def teacher_fn(x):
        return model.apply({"params": teacher_params}, x,
                           deterministic=True)

    loop = TrainLoop(
        apply_fn=apply_fn, optimizer=opt, num_classes=4,
        mix_up=True, label_smooth=True,
        teacher_fn=teacher_fn, kd_alpha=0.5,
        use_group_lasso=True, group_lasso_lambda=1e-4)
    params, m = loop.train_one_epoch(params, loader, 0, jax.random.PRNGKey(1))
    assert np.isfinite(m["loss"])
    assert m["gl_loss"] > 0.0
    assert np.isfinite(m["kd_loss"])


def test_evaluate_counts_only_valid_rows():
    cfg, model, params = _tiny_vit_setup(enable_quant=False)
    rng = np.random.default_rng(2)
    images = rng.standard_normal((10, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 4, 10)
    loader = DataLoader(ArrayDataset(images, labels), batch_size=4,
                        pad_last=True)

    def apply_fn(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    out = evaluate(apply_fn, params, loader, ks=(1, 2))
    assert out["samples"] == 10
    assert 0.0 <= out["top1"] <= out["top2"] <= 1.0


def test_nonfinite_loss_raises():
    from quantized_vit_tpu.utils import NonFiniteLossError
    from quantized_vit_tpu.graph import vit_node_groups
    from quantized_vit_tpu.opt import GETA, GETAConfig

    cfg, model, params = _tiny_vit_setup()
    groups = vit_node_groups(cfg, params)
    opt = GETA(groups, params, GETAConfig(
        lr=1e-2, start_projection_step=1000, start_pruning_step=2000))

    images = np.full((4, 16, 16, 3), np.nan, np.float32)
    labels = np.zeros(4, np.int64)
    loader = DataLoader(ArrayDataset(images, labels), batch_size=4)

    def apply_fn(p, x, step_rng):
        return model.apply({"params": p}, x, deterministic=True)

    loop = TrainLoop(apply_fn=apply_fn, optimizer=opt, num_classes=4)
    with pytest.raises(NonFiniteLossError):
        loop.train_one_epoch(params, loader, 0, jax.random.PRNGKey(0))
