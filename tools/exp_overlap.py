"""Experiment: can XLA's latency-hiding scheduler overlap the FSDP
weight gathers (and the TP AG/RS) with the Pallas compute?

The round-4 audit shows `async pairs: 0` for the FSDP executable and
"the large AG/RS are synchronous" for TP — the gathers are issued with a
one-block lookahead at the program level (serve/vit_fsdp.py), but the
SCHEDULER serializes them. This sweeps compiler options that control
async collectives + the latency-hiding scheduler and reports what each
does to the audited async-pair count / measured overlap.

Usage: python tools/exp_overlap.py [fsdp|tp]
"""
import functools
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

VARIANTS = {
    "baseline": None,
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "lhs+async_ag": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_enable_async_all_gather": "true",
    },
    "lhs+async_ag+fusion": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_enable_async_all_gather": "true",
        "xla_tpu_enable_async_collective_fusion": "true",
        "xla_tpu_enable_async_collective_fusion_fuse_all_gather": "true",
    },
    "lhs+overlap_tc": {
        "xla_tpu_enable_latency_hiding_scheduler": "true",
        "xla_enable_async_all_gather": "true",
        "xla_tpu_overlap_compute_collective_tc": "true",
    },
}


def build_fsdp():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.parallel import get_topology
    from quantized_vit_tpu.serve import (fsdp_artifact_specs,
                                         prepare_fsdp_artifact,
                                         random_vit_int4_artifact,
                                         vit_int4_forward_fsdp)

    tp, dp = 2, 1
    topo = get_topology("v5e:2x2")
    devs = np.array(topo.devices)[:dp * tp]
    mesh = Mesh(devs.reshape(dp, tp), axis_names=("data", "model"))
    cfg = ViTConfig(num_classes=1000)
    art0 = prepare_fsdp_artifact(
        random_vit_int4_artifact(cfg, seed=0, pack_weights=True), cfg, tp)
    batch = 32 * dp * tp
    x_abs = jax.ShapeDtypeStruct(
        (batch, 224, 224, 3), jnp.float32,
        sharding=NamedSharding(mesh, P(("data", "model"))))
    specs = fsdp_artifact_specs(art0)
    sds = lambda a, s: jax.ShapeDtypeStruct(
        a.shape, a.dtype, sharding=NamedSharding(mesh, s))
    art_abs = jax.tree.map(sds, art0, specs)
    fn = jax.jit(functools.partial(
        vit_int4_forward_fsdp, cfg=cfg, mesh=mesh, use_pallas=True,
        float_dtype=jnp.bfloat16))
    return fn, (art_abs, x_abs)


def build_tp():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.parallel import get_topology
    from quantized_vit_tpu.serve import (prepare_tp_artifact,
                                         random_vit_int4_artifact,
                                         tp_artifact_specs,
                                         vit_int4_forward_tp)

    tp, dp = 2, 1
    topo = get_topology("v5e:2x2")
    devs = np.array(topo.devices)[:dp * tp]
    mesh = Mesh(devs.reshape(dp, tp), axis_names=("data", "model"))
    cfg = ViTConfig(num_classes=1000)
    art_tp = prepare_tp_artifact(
        random_vit_int4_artifact(cfg, seed=0, pack_weights=False), cfg, tp)
    specs = tp_artifact_specs(art_tp)
    sds = lambda a, s: jax.ShapeDtypeStruct(
        a.shape, a.dtype, sharding=NamedSharding(mesh, s))
    art_abs = jax.tree.map(sds, art_tp, specs)
    batch = 32 * dp
    x_abs = jax.ShapeDtypeStruct(
        (batch, 224, 224, 3), jnp.float32,
        sharding=NamedSharding(mesh, P(("data", "model"))))
    fn = jax.jit(functools.partial(
        vit_int4_forward_tp, cfg=cfg, mesh=mesh, use_pallas=True,
        float_dtype=jnp.bfloat16, comm_dtype=jnp.bfloat16))
    return fn, (art_abs, x_abs)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fsdp"
    from quantized_vit_tpu.parallel import audit_schedule

    fn, args = build_fsdp() if which == "fsdp" else build_tp()
    lowered = fn.lower(*args)
    for name, opts in VARIANTS.items():
        try:
            comp = (lowered.compile(compiler_options=opts) if opts
                    else lowered.compile())
            aud = audit_schedule(comp.as_text())
            print(json.dumps({
                "variant": name,
                "n_async": aud["n_async"],
                "n_sync": aud["n_sync"],
                "overlap_ms": round(aud["overlap_s_measured"] * 1e3, 3),
                "summary": {k: v["count"] for k, v in
                            aud["summary"].items()},
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name, "error":
                              f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)


if __name__ == "__main__":
    main()
