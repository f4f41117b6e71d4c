"""Measure the in-kernel RDMA gather's overlap (VERDICT r4 #2).

Two legs:

1. **AOT deviceless compile** of the full RDMA FSDP forward at REAL ViT-B
   batch-32/chip shapes for a v5e 2-device mesh — proves the Mosaic RDMA
   lowering at production shapes (we have one physical chip; the compile
   is topology-true).

2. **Single-chip overlap harness**: the one thing a single chip CAN
   measure is whether the gather DMA hides under the MLP compute. Run
   ``fused_mlp_gather`` at tp=1 (the remote legs vanish; the local
   copy — same DMA engine path, HBM->HBM — remains) with the dummy-shard
   volume scaled so the DMA takes as long as the tp=2 ICI gather would
   (HBM ~819 GB/s vs ICI ring ~90 GB/s -> ~9x bytes), and compare
   against plain fused_mlp at the same shapes. If the kernel time is
   flat, the copy is hidden; the exposed FSDP ring time then drops from
   0.47 ms (all-synchronous XLA gathers) to ~the block-0 bootstrap.

Usage: python tools/exp_rdma_overlap.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tools.time_kernels import timeit_chain

D = 768
HID = 3072
M = 32 * 208


def aot_leg():
    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.parallel import get_topology
    from quantized_vit_tpu.serve import (fsdp_rdma_artifact_specs,
                                         prepare_fsdp_rdma_artifact,
                                         random_vit_int4_artifact,
                                         vit_int4_forward_fsdp_rdma)
    import functools

    tp = 2
    topo = get_topology("v5e:2x2")
    devs = np.array(topo.devices).reshape(-1)[:2 * tp]
    mesh = Mesh(devs.reshape(2, tp), axis_names=("data", "model"))
    cfg = ViTConfig(num_classes=1000)
    art = prepare_fsdp_rdma_artifact(
        random_vit_int4_artifact(cfg, seed=0, pack_weights=False), cfg, tp)
    specs = fsdp_rdma_artifact_specs(art)
    sds = lambda a, s: jax.ShapeDtypeStruct(
        a.shape, a.dtype, sharding=NamedSharding(mesh, s))
    art_abs = jax.tree.map(sds, art, specs)
    x_abs = jax.ShapeDtypeStruct(
        (32 * 2 * tp, 224, 224, 3), jnp.float32,
        sharding=NamedSharding(mesh, P(("data", "model"))))
    fn = jax.jit(functools.partial(
        vit_int4_forward_fsdp_rdma, cfg=cfg, mesh=mesh,
        float_dtype=jnp.bfloat16))
    txt = fn.lower(art_abs, x_abs).compile().as_text()
    n_ag = sum(1 for ln in txt.splitlines()
               if "all-gather" in ln and "-done(" not in ln)
    print(f"[aot] RDMA FSDP forward compiled for v5e 2x2 (dp=2, tp=2) at "
          f"ViT-B batch-32/chip; XLA all-gathers in schedule: {n_ag} "
          "(bootstrap only — steady-state gathers are in-kernel RDMA)")
    return n_ag


def overlap_leg():
    from quantized_vit_tpu.ops import fused_mlp
    from quantized_vit_tpu.ops.ring_gather import fused_mlp_gather

    rng = np.random.default_rng(0)
    d = jnp.float32(0.05)
    t = jnp.float32(1.0)
    scale = jnp.float32(1e-3)
    g = jnp.ones((D,), jnp.float32)
    be = jnp.zeros((D,), jnp.float32)
    x2 = jnp.array(rng.standard_normal((M, D)) * 0.2, jnp.bfloat16)
    w1 = jnp.array(rng.integers(-7, 8, (D, HID)), jnp.int8)
    w2 = jnp.array(rng.integers(-7, 8, (HID, D)), jnp.int8)
    b1 = jnp.array(rng.standard_normal(HID) * 0.01, jnp.float32)
    b2 = jnp.array(rng.standard_normal(D) * 0.01, jnp.float32)
    kw = dict(ln_scale=g, ln_bias=be, act_d=d, act_t=t, act_top=7,
              act_pow=False, hid_d=d, hid_t=t, hid_top=7, hid_pow=False,
              out_dtype=jnp.bfloat16)

    mesh = Mesh(np.array(jax.devices()[:1]), axis_names=("model",))
    results = {}

    def run(name, step, x0, iters=1000):
        dt = timeit_chain(step, x0, iters=iters)
        results[name] = round(dt * 1e6, 1)
        print(f"[done] {name}: {dt * 1e6:.1f} us", flush=True)

    run("fused_mlp (no gather)",
        lambda x: fused_mlp(x, w1, scale, b1, w2, scale, b2, fmt="int8",
                            block_m=832, **kw)[0, 0].astype(jnp.float32),
        x2)

    # tp=2 real gather volume per block: (qkv 1.7 + proj 0.56 + fc1 2.25
    # + fc2 2.25) MB int8 / 2 received remotely = 3.4 MB over ICI
    # (2x45 GB/s) ~ 38 us. At HBM (~819 GB/s) the same DURATION needs
    # ~31 MB. Sweep dummy volumes to find where hiding stops.
    for mb in (4, 8, 16, 31):
        rows = (mb * 2**20) // D
        rows -= rows % 32
        dummy = jnp.array(rng.integers(-7, 8, (rows, D)), jnp.int8)

        def step(x, dummy=dummy):
            def body(x, sh):
                y, _g = fused_mlp_gather(
                    x, w1, scale, b1, w2, scale, b2,
                    next_shards=[sh], axis_name="model", tp=1,
                    fmt="int8", block_m=832, **kw)
                return y
            y = jax.shard_map(
                body, mesh=mesh, in_specs=(P(), P("model", None)),
                out_specs=P(), check_vma=False)(x, dummy)
            return y[0, 0].astype(jnp.float32)

        run(f"fused_mlp_gather tp=1, {mb} MB dummy DMA", step, x2)

    base = results["fused_mlp (no gather)"]
    print(json.dumps(results))
    print(f"[overlap] baseline {base} us; a flat number at N MB means "
          f"~N MB of gather DMA hides under one block's MLP compute "
          "(tp=2 ICI needs the ~38 us-equivalent ~31 MB at HBM rate)")


def main():
    if jax.default_backend() == "tpu":
        overlap_leg()
    aot_leg()


if __name__ == "__main__":
    main()
