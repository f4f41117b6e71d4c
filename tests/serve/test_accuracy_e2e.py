"""End-to-end accuracy rehearsal: train -> export -> INT4-path top-1 delta.

An executable stand-in for the reference's ImageNet claim (the 0.1% top-1
target in BASELINE.md): trains the tiny fake-quant ViT to convergence on a
learnable synthetic task through the real CLI driver
(mirrors QViT_with_GETA/train.py -> RESULT_TEST.py:36-109), exports the
integer serving artifact, and asserts the INT4 kernel path reproduces the
fake-quant model's test accuracy to <= 0.1% absolute. The int8-attention
variant's delta is measured too (it changes numerics — dynamic-scale score
and AV matmuls — so it gets a looser, documented bound).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

CLASSES = 4
IMG = 16
N_TRAIN = 256
N_TEST = 96


def _make_task(rng, n):
    """Learnable 4-class task: class k brightens quadrant k of the image.
    SNR chosen so a converged model separates cleanly but the task is not
    trivially linear (noise sigma 1 vs signal 1.5)."""
    labels = rng.integers(0, CLASSES, n)
    images = rng.standard_normal((n, IMG, IMG, 3)).astype(np.float32)
    h = IMG // 2
    for i, k in enumerate(labels):
        r, c = divmod(int(k), 2)
        images[i, r * h:(r + 1) * h, c * h:(c + 1) * h] += 1.5
    return images, labels


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from quantized_vit_tpu.cli.train import main

    rng = np.random.default_rng(0)
    tr_x, tr_y = _make_task(rng, N_TRAIN)
    te_x, te_y = _make_task(rng, N_TEST)
    root = tmp_path_factory.mktemp("acc_e2e")
    npz = str(root / "task.npz")
    np.savez(npz, train_images=tr_x, train_labels=tr_y,
             test_images=te_x, test_labels=te_y)

    out = str(root / "run")
    main([
        "--model", "vit_tiny_test", "--dataset", "npz", "--data-path", npz,
        "--img-size", str(IMG), "--num-classes", str(CLASSES),
        "--batch-size", "32", "--epochs", "10", "--lr", "1e-3",
        "--variant", "adam",
        # project bits 8 -> 4 so the export packs int4; no pruning so the
        # artifact keeps the full architecture
        "--projection-start-epochs", "2", "--projection-epochs", "3",
        "--projection-periods", "4", "--pruning-epochs", "1",
        "--pruning-periods", "1", "--bit-reduction", "4",
        "--target-group-sparsity", "0.0",
        "--out-dir", out, "--seed", "0",
    ])
    return out, npz, te_x, te_y


def _top1(logits, labels):
    return float((np.argmax(logits, -1) == labels).mean())


def test_int4_path_top1_within_0p1pct(trained):
    import jax.numpy as jnp

    from quantized_vit_tpu.cli.eval import load_model_for_eval
    from quantized_vit_tpu.serve import export_vit_int4, vit_int4_forward

    out, npz, te_x, te_y = trained

    class A:
        checkpoint = os.path.join(out, "final")
        model = "vit_tiny_test"
        img_size = IMG
        num_classes = CLASSES
        fp32 = False

    model, params = load_model_for_eval(A)
    cfg = model.cfg

    x = jnp.asarray(te_x)
    y_fake = np.asarray(model.apply({"params": params}, x))
    top1_fake = _top1(y_fake, te_y)
    # the training run must actually have learned the task, else the delta
    # assertion is vacuous
    assert top1_fake >= 0.80, f"training failed to converge: {top1_fake}"

    art = export_vit_int4(cfg, params)
    y_int = np.asarray(vit_int4_forward(art, x, cfg, use_pallas=False))
    top1_int = _top1(y_int, te_y)
    assert abs(top1_int - top1_fake) <= 1e-3 + 1e-9, (
        f"INT4 path top-1 {top1_int} vs fake-quant {top1_fake}")

    # int8 attention: dynamic-quantized score/AV matmuls change numerics;
    # the serving default documents <=1% top-1 drift at this scale
    y_ia = np.asarray(vit_int4_forward(art, x, cfg, use_pallas=False,
                                       int_attention=True))
    top1_ia = _top1(y_ia, te_y)
    assert abs(top1_ia - top1_fake) <= 0.02, (
        f"int8-attention top-1 {top1_ia} vs fake-quant {top1_fake}")
