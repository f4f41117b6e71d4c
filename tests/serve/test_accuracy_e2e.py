"""End-to-end accuracy rehearsal: train -> (prune) -> export -> INT4 top-1.

An executable stand-in for the reference's ImageNet claim (the 0.1% top-1
target in BASELINE.md), upgraded per VERDICT r2 #3 to carry statistical
weight:

- **2,000-sample test set**: one top-1 flip = 0.05%, so the <=0.1% bound is
  a measurable quantum, not an exact-parity assertion in disguise.
- **harder task**: 32x32, 10 classes, 4-block patch-8 ViT (vit_small_test)
  trained through the real CLI driver (mirrors QViT_with_GETA/train.py ->
  RESULT_TEST.py:36-109).
- **a pruning leg**: a second run with target_group_sparsity > 0 ->
  construct_subnet -> export -> INT4 serving, so GETA pruning ->
  compression -> serving is covered end-to-end by one accuracy number.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

CLASSES = 10
IMG = 32
PATCH = 8
N_TRAIN = 512
N_TEST = 2000


def _make_task(rng, n):
    """Learnable 10-class task on the 4x4 patch grid: class k brightens
    patch cell (k // 4, k % 4) across channels (signal 1.5 vs noise sigma
    1) — each class lights a distinct token, so a converged patch-embed +
    attention stack separates cleanly but single pixels do not."""
    labels = rng.integers(0, CLASSES, n)
    images = rng.standard_normal((n, IMG, IMG, 3)).astype(np.float32)
    for i, k in enumerate(labels):
        r, c = divmod(int(k), 4)
        images[i, r * PATCH:(r + 1) * PATCH, c * PATCH:(c + 1) * PATCH] += 1.5
    return images, labels


def _train(tmp_root, sparsity: float):
    from quantized_vit_tpu.cli.train import main

    rng = np.random.default_rng(0)
    tr_x, tr_y = _make_task(rng, N_TRAIN)
    te_x, te_y = _make_task(rng, N_TEST)
    npz = str(tmp_root / "task.npz")
    np.savez(npz, train_images=tr_x, train_labels=tr_y,
             test_images=te_x, test_labels=te_y)

    out = str(tmp_root / "run")
    main([
        "--model", "vit_small_test", "--dataset", "npz", "--data-path", npz,
        "--img-size", str(IMG), "--num-classes", str(CLASSES),
        "--batch-size", "64", "--epochs", "8", "--lr", "2e-3",
        "--variant", "adam",
        # project bits 8 -> 4 so the export packs int4
        "--projection-start-epochs", "2", "--projection-epochs", "2",
        "--projection-periods", "4", "--pruning-epochs", "2",
        "--pruning-periods", "2", "--bit-reduction", "4",
        "--target-group-sparsity", str(sparsity),
        "--out-dir", out, "--seed", "0",
    ])
    return out, te_x, te_y


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    return _train(tmp_path_factory.mktemp("acc_e2e"), sparsity=0.0)


@pytest.fixture(scope="module")
def trained_pruned(tmp_path_factory):
    return _train(tmp_path_factory.mktemp("acc_e2e_prune"), sparsity=0.3)


def _top1(logits, labels):
    return float((np.argmax(logits, -1) == labels).mean())


def _batched_apply(fn, x, bs=250):
    import jax.numpy as jnp

    outs = [np.asarray(fn(jnp.asarray(x[i:i + bs])))
            for i in range(0, len(x), bs)]
    return np.concatenate(outs, 0)


def test_int4_path_top1_within_0p1pct(trained):
    from quantized_vit_tpu.cli.eval import load_model_for_eval
    from quantized_vit_tpu.serve import export_vit_int4, vit_int4_forward

    out, te_x, te_y = trained

    class A:
        checkpoint = os.path.join(out, "final")
        model = "vit_small_test"
        img_size = IMG
        num_classes = CLASSES
        fp32 = False

    model, params = load_model_for_eval(A)
    cfg = model.cfg

    y_fake = _batched_apply(
        lambda xb: model.apply({"params": params}, xb), te_x)
    top1_fake = _top1(y_fake, te_y)
    # the training run must actually have learned the task, else the delta
    # assertion is vacuous
    assert top1_fake >= 0.90, f"training failed to converge: {top1_fake}"

    art = export_vit_int4(cfg, params)
    y_int = _batched_apply(
        lambda xb: vit_int4_forward(art, xb, cfg, use_pallas=False), te_x)
    top1_int = _top1(y_int, te_y)
    assert abs(top1_int - top1_fake) <= 1e-3 + 1e-9, (
        f"INT4 path top-1 {top1_int} vs fake-quant {top1_fake} "
        f"({N_TEST} samples)")

    # int8 attention: dynamic-quantized score/AV matmuls change numerics;
    # the serving default documents <=1% top-1 drift at this scale
    y_ia = _batched_apply(
        lambda xb: vit_int4_forward(art, xb, cfg, use_pallas=False,
                                    int_attention=True), te_x)
    top1_ia = _top1(y_ia, te_y)
    assert abs(top1_ia - top1_fake) <= 0.01 + 1e-9, (
        f"int8-attention top-1 {top1_ia} vs fake-quant {top1_fake}")


def test_pruned_subnet_int4_path_top1_within_0p1pct(trained_pruned):
    """GETA pruning -> construct_subnet -> export -> INT4 serving, one
    accuracy number end to end (VERDICT r2 #3; mirrors the reference's
    train.py:534-611 construct_subnet + RESULT_TEST.py flow)."""
    from quantized_vit_tpu.cli._common import load_params_any
    from quantized_vit_tpu.cli.eval import vit_config_from_dict
    from quantized_vit_tpu.models.vit import VisionTransformer
    from quantized_vit_tpu.serve import export_vit_int4, vit_int4_forward

    out, te_x, te_y = trained_pruned

    params, _, extra = load_params_any(os.path.join(out, "compressed"))
    assert "subnet" in extra, "train CLI did not save the compressed subnet"
    cfg = vit_config_from_dict(extra["subnet"])
    model = VisionTransformer(cfg)

    y_fake = _batched_apply(
        lambda xb: model.apply({"params": params}, xb), te_x)
    top1_fake = _top1(y_fake, te_y)
    assert top1_fake >= 0.85, (
        f"pruned subnet lost the task: {top1_fake} (sparsity leg vacuous)")

    art = export_vit_int4(cfg, params)
    y_int = _batched_apply(
        lambda xb: vit_int4_forward(art, xb, cfg, use_pallas=False), te_x)
    top1_int = _top1(y_int, te_y)
    assert abs(top1_int - top1_fake) <= 1e-3 + 1e-9, (
        f"pruned INT4 path top-1 {top1_int} vs fake-quant {top1_fake} "
        f"({N_TEST} samples)")
