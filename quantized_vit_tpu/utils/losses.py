"""Loss functions (QViT_with_GETA/utils.py:120-194, 268-287), as pure jnp.

All functions are jit-safe (no data-dependent Python control flow) so the
whole loss — CE + KD + group-lasso — compiles into one XLA computation with
the model forward.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from ..opt.groups import NodeGroup, Transform, get_path, group_matrix


def one_hot(labels: jax.Array, num_classes: int,
            smoothing_eps: Optional[float] = None) -> jax.Array:
    """One-hot targets with optional label smoothing (utils.py:120-130).

    The reference writes v1/v0 via ``one_hot*(v1-v0)+v0`` with
    v1 = 1-eps+eps/C, v0 = eps/C; algebraically out = one_hot*(1-eps) + eps/C.
    """
    oh = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if smoothing_eps is None:
        return oh
    v1 = 1.0 - smoothing_eps + smoothing_eps / float(num_classes)
    v0 = smoothing_eps / float(num_classes)
    return oh * (v1 - v0) + v0


def cross_entropy_onehot_target(logits: jax.Array,
                                target: jax.Array) -> jax.Array:
    """-(target * log_softmax(logits)).sum(1).mean() (utils.py:133-139)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target * logp, axis=-1))


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Plain integer-label CE (the mix_up/label_smooth=False branch)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def mixup(rng: jax.Array, inputs: jax.Array, targets: jax.Array,
          alpha: float = 0.2):
    """Mixup on inputs + one-hot targets (utils.py:142-154).

    The reference draws gamma ~ Beta(alpha, alpha) on the host via
    np.random.beta and a random permutation; here both come from a JAX PRNG
    key so the whole augmentation stays on device inside the jitted step.
    Returns (mixed_inputs, mixed_targets).
    """
    k_gamma, k_perm = jax.random.split(rng)
    gamma = jax.random.beta(k_gamma, alpha, alpha)
    perm = jax.random.permutation(k_perm, inputs.shape[0])
    gx = gamma.astype(inputs.dtype)
    gy = gamma.astype(targets.dtype)
    mixed_x = gx * inputs + (1 - gx) * inputs[perm]
    mixed_y = gy * targets + (1 - gy) * targets[perm]
    return mixed_x, mixed_y


def kd_loss(student_logits: jax.Array, teacher_logits: jax.Array,
            temperature: float = 4.0) -> jax.Array:
    """KL(teacher_T || student_T) * T^2, batchmean (utils.py:268-278).

    torch F.kl_div(log_p_student, p_teacher, 'batchmean') computes
    sum(p_t * (log p_t - log p_s)) / batch.
    """
    t = temperature
    log_p_s = jax.nn.log_softmax(student_logits / t, axis=-1)
    log_p_t = jax.nn.log_softmax(teacher_logits / t, axis=-1)
    p_t = jnp.exp(log_p_t)
    kl = jnp.sum(p_t * (log_p_t - log_p_s)) / student_logits.shape[0]
    return kl * (t * t)


def group_lasso_loss(groups: Sequence[NodeGroup], params,
                     gl_scales: Optional[Dict[str, jax.Array]] = None
                     ) -> jax.Array:
    """Cost-aware group-lasso regularizer (utils.py:157-194).

    sum over prunable non-auxiliary groups of ``(||row||_2 * gl_scale).sum()``
    where rows are the [num_groups, -1] group matrices of each prunable param
    (NO_PRUNE params skipped). ``gl_scales`` comes from
    ``GETA.gl_scales`` (importance.py gl_scale math); when absent the lasso is
    unscaled, matching the reference's fallback.
    """
    total = jnp.float32(0.0)
    for g in groups:
        if not g.is_prunable or g.is_auxiliary:
            continue
        sq = None
        for e in g.entries:
            if e.transform == Transform.NO_PRUNE:
                continue
            mat = group_matrix(get_path(params, e.path), e.transform,
                               g.num_groups, num_heads=g.num_heads)
            contrib = jnp.sum(mat.astype(jnp.float32) ** 2, axis=1)
            sq = contrib if sq is None else sq + contrib
        if sq is None:
            continue
        norms = jnp.sqrt(sq + 1e-12)
        scale = None if gl_scales is None else gl_scales.get(g.id)
        if scale is not None and scale.shape[0] == g.num_groups:
            total = total + jnp.sum(norms * scale)
        else:
            total = total + jnp.sum(norms)
    return total
