"""Round-5 QAT-backward forensics (VERDICT r4 #3).

exp_train_decomp.py: the activation quantizers add +107 ms to the
backward, yet one quantizer VJP microbenches at ~50 us x 37 sites ~ 2 ms
(exp_actquant_bwd.py). This isolates WHICH gradient path composes badly
by monkeypatching the quantize dispatch (experiment-only):

  qat_wa         — unmodified training config (repro)
  act_nograd_sdt — stop_gradient on the ACTIVATION quantizers'
                   (d, q_m, t): only the STE dx path remains for
                   activations (weights keep full grads)
  act_ste_only   — activation quantizer replaced by a pure STE
                   clip-mask custom path (dx = g * mask, no level math
                   in the backward at all): the absolute floor
  wt_nograd_sdt  — stop_gradient on the WEIGHT quantizers' (d, q_m, t)
                   (activations keep full grads): the symmetric control

Full-tree SGD write consumes every grad leaf (no DCE hollowing).
Usage (chip): python tools/exp_qat_bwd2.py
"""
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp

from _bench_util import measure_floor, timeit

BATCH = 32
ITERS = 10


def main():
    import flax

    from quantized_vit_tpu.models import (QuantConfig, VisionTransformer,
                                          init_quant_params_tree)
    from quantized_vit_tpu.models import layers as L
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.utils.losses import (cross_entropy_onehot_target,
                                                one_hot)

    rng = np.random.default_rng(0)
    images = jnp.array(rng.standard_normal((BATCH, 224, 224, 3)) * 0.5,
                       jnp.float32)
    labels = jnp.array(rng.integers(0, 1000, BATCH))
    floor = measure_floor()
    print(json.dumps({"rpc_floor_ms": round(floor * 1e3, 1)}), flush=True)

    orig_quantize = L._QuantParamsMixin._quantize

    def make_patched(mode):
        def _quantize(self, x, d, q_m, t, clip):
            is_act = x.ndim > 2  # activations are [B, N, D]; kernels 2-D
            if mode == "act_nograd_sdt" and is_act:
                d = jax.lax.stop_gradient(d)
                q_m = jax.lax.stop_gradient(q_m)
                t = jax.lax.stop_gradient(t) if t is not None else None
            if mode == "wt_nograd_sdt" and not is_act:
                d = jax.lax.stop_gradient(d)
                q_m = jax.lax.stop_gradient(q_m)
                t = jax.lax.stop_gradient(t) if t is not None else None
            if mode == "act_ste_only" and is_act:
                lo, hi = float(clip[0]), float(clip[1])
                dd = jax.lax.stop_gradient(d)

                @jax.custom_vjp
                def ste(x):
                    xc = jnp.clip(x, lo, hi)
                    return jnp.round(xc / dd) * dd

                def fwd(x):
                    return ste(x), (x,)

                def bwd(res, g):
                    (x,) = res
                    return (jnp.where((x >= lo) & (x <= hi), g, 0.0),)

                ste.defvjp(fwd, bwd)
                return ste(x)
            return orig_quantize(self, x, d, q_m, t, clip)
        return _quantize

    cfg = ViTConfig(num_classes=1000, quant=QuantConfig(enabled=True))

    for mode in ("qat_wa", "act_nograd_sdt", "act_ste_only",
                 "wt_nograd_sdt"):
        L._QuantParamsMixin._quantize = (
            orig_quantize if mode == "qat_wa" else make_patched(mode))
        for klass in (L.QuantDense, L.QuantConv):
            klass._quantize = L._QuantParamsMixin._quantize
        model = VisionTransformer(cfg)
        abstract = jax.eval_shape(
            lambda m=model: m.init(jax.random.PRNGKey(0), images[:1])
        )["params"]
        params = jax.tree.map(
            lambda s: jnp.array(
                rng.standard_normal(s.shape).astype(np.float32) * 0.02),
            flax.core.unfreeze(abstract))
        params = init_quant_params_tree(params, init_bits=8.0)

        def loss_fn(p, x, y, model=model):
            logits = model.apply({"params": p}, x, deterministic=True)
            return cross_entropy_onehot_target(logits, one_hot(y, 1000))

        @jax.jit
        def fb_chain(params, images, labels, loss_fn=loss_fn):
            def body(i, carry):
                p, acc = carry
                LV, grads = jax.value_and_grad(loss_fn)(p, images, labels)
                p = jax.tree.map(lambda a, g: a - 1e-3 * g, p, grads)
                return p, acc + LV
            p, acc = jax.lax.fori_loop(
                0, ITERS, body, (params, jnp.float32(0)))
            return acc + jax.tree.leaves(p)[0].reshape(-1)[0]

        dt = max((timeit(fb_chain, params, images, labels) - floor)
                 / ITERS, 1e-9)
        print(json.dumps({"variant": mode,
                          "fwd_bwd_ms": round(dt * 1e3, 2)}), flush=True)

    L._QuantParamsMixin._quantize = orig_quantize
    for klass in (L.QuantDense, L.QuantConv):
        klass._quantize = orig_quantize


if __name__ == "__main__":
    main()
