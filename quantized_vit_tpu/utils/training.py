"""Epoch drivers: jitted train step + evaluation (utils.py:197-366).

The reference's per-step path (utils.py:235-316) becomes:

  1. one jitted ``value_and_grad`` over (params -> CE + KD + group-lasso),
     with mixup/label smoothing folded into the same computation;
  2. host-side ``GETA.clip_grads`` + ``GETA.step`` (the optimizer makes its
     rare schedule decisions on the host, heavy math in its own jits);
  3. a finite-loss guard raising :class:`NonFiniteLossError`
     (utils.py:311-313).

Static loss configuration (mixup on/off, KD on/off, lasso on/off) selects a
distinct jit specialization — no data-dependent branching inside the trace.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .guards import NonFiniteLossError
from .losses import (
    cross_entropy_onehot_target,
    group_lasso_loss,
    kd_loss,
    mixup,
    one_hot,
)


def topk_accuracy(logits: jax.Array, labels: jax.Array,
                  ks: Sequence[int] = (1, 5),
                  mask: Optional[jax.Array] = None) -> Dict[int, jax.Array]:
    """Top-k correct COUNTS per k (RESULT_TEST.py:66-88 semantics). ``mask``
    excludes padded rows of the final batch."""
    out = {}
    num_classes = logits.shape[-1]
    kmax = min(max(ks), num_classes)  # k > C degenerates to "always hit"
    _, top = jax.lax.top_k(logits, kmax)
    hit = top == labels[:, None]
    if mask is not None:
        hit = hit & mask[:, None]
    for k in ks:
        out[k] = jnp.sum(hit[:, :min(k, kmax)])
    return out


@dataclasses.dataclass
class TrainLoop:
    """Orchestrates epochs of (model, GETA) training.

    ``apply_fn(params, images, rngs) -> logits`` abstracts the flax apply
    (dropout rngs threaded by the caller-provided closure).
    ``teacher_fn(images) -> logits`` enables KD when given (utils.py:268-278).
    """

    apply_fn: Callable
    optimizer: Any                     # GETA/HESSO-style host optimizer
    num_classes: int
    mix_up: bool = False
    label_smooth: bool = False
    smoothing_eps: float = 0.1
    mixup_alpha: float = 0.2
    teacher_fn: Optional[Callable] = None
    kd_alpha: float = 0.0
    kd_temperature: float = 4.0
    use_group_lasso: bool = False
    group_lasso_lambda: float = 0.0
    gl_start_epoch: int = 0

    def __post_init__(self):
        self._grad_fn = self._build_grad_fn()

    # ------------------------------------------------------------------

    def _build_grad_fn(self):
        use_kd = self.teacher_fn is not None and self.kd_alpha > 0.0

        def loss_fn(params, images, labels, rng, gl_scales, gl_lambda):
            if self.mix_up or self.label_smooth:
                eps = self.smoothing_eps if self.label_smooth else None
                targets = one_hot(labels, self.num_classes, eps)
                if self.mix_up:
                    images, targets = mixup(rng, images, targets,
                                            self.mixup_alpha)
            else:
                targets = one_hot(labels, self.num_classes)
            logits = self.apply_fn(params, images, rng)
            ce = cross_entropy_onehot_target(logits, targets)
            loss = ce
            kd = jnp.float32(0.0)
            if use_kd:
                kd = kd_loss(logits, self.teacher_fn(images),
                             self.kd_temperature)
                loss = (1.0 - self.kd_alpha) * ce + self.kd_alpha * kd
            gl = jnp.float32(0.0)
            if self.use_group_lasso and self.group_lasso_lambda > 0.0:
                groups = [g for g in self.optimizer.groups
                          if g.is_prunable and not g.is_auxiliary]
                gl = group_lasso_loss(groups, params, gl_scales)
                loss = loss + gl_lambda * gl
            aux = {"ce": ce, "kd": kd, "gl": gl, "logits": logits}
            return loss, aux

        return jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    def _gl_scales_device(self):
        gls = getattr(self.optimizer, "gl_scales", None)
        if not self.use_group_lasso or gls is None:
            return None
        return {k: jnp.asarray(v) for k, v in gls.items()}

    # ------------------------------------------------------------------

    def train_one_epoch(self, params, loader, epoch: int, rng: jax.Array):
        """Returns (params, metrics dict) — utils.py:197-325."""
        gl_on = (self.use_group_lasso and epoch >= self.gl_start_epoch
                 and self.group_lasso_lambda > 0.0)
        gl_lambda = jnp.float32(self.group_lasso_lambda if gl_on else 0.0)

        tot = {"loss": 0.0, "ce": 0.0, "kd": 0.0, "gl": 0.0}
        correct = 0
        seen = 0
        steps = 0
        t0 = time.time()
        for images, labels, mask in loader:
            rng, step_rng = jax.random.split(rng)
            images = jnp.asarray(images)
            labels = jnp.asarray(labels)
            (loss, aux), grads = self._grad_fn(
                params, images, labels, step_rng,
                self._gl_scales_device(), gl_lambda)
            loss_val = float(loss)
            if not np.isfinite(loss_val):
                raise NonFiniteLossError(
                    f"non-finite loss {loss_val} at epoch {epoch} "
                    f"step {steps}")
            grads = self.optimizer.clip_grads(grads)
            params = self.optimizer.step(params, grads)

            pred = np.asarray(jnp.argmax(aux["logits"], axis=-1))
            valid = np.asarray(mask)
            correct += int(((pred == np.asarray(labels)) & valid).sum())
            seen += int(valid.sum())
            tot["loss"] += loss_val
            for k in ("ce", "kd", "gl"):
                tot[k] += float(aux[k])
            steps += 1

        n = max(steps, 1)
        return params, {
            "loss": tot["loss"] / n,
            "acc": correct / max(seen, 1),
            "ce_loss": tot["ce"] / n,
            "kd_loss": tot["kd"] / n,
            "gl_loss": tot["gl"] / n,
            "steps": steps,
            "seconds": time.time() - t0,
        }


def evaluate(apply_fn: Callable, params, loader,
             ks: Sequence[int] = (1, 5)) -> Dict[str, float]:
    """Top-1/top-5 eval (utils.py:328-366, RESULT_TEST.py:36-109).

    ``apply_fn(params, images) -> logits`` must be deterministic.
    """

    @jax.jit
    def batch_counts(params, images, labels, mask):
        logits = apply_fn(params, images)
        counts = topk_accuracy(logits, labels, ks, mask)
        loss = cross_entropy_onehot_target(
            logits, jax.nn.one_hot(labels, logits.shape[-1]))
        return counts, loss

    hits = {k: 0 for k in ks}
    seen = 0
    loss_sum = 0.0
    steps = 0
    for images, labels, mask in loader:
        counts, loss = batch_counts(params, jnp.asarray(images),
                                    jnp.asarray(labels), jnp.asarray(mask))
        for k in ks:
            hits[k] += int(counts[k])
        seen += int(np.asarray(mask).sum())
        loss_sum += float(loss)
        steps += 1

    out = {f"top{k}": hits[k] / max(seen, 1) for k in ks}
    out["loss"] = loss_sum / max(steps, 1)
    out["samples"] = seen
    return out
