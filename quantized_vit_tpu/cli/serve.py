"""Serving driver: INT4 artifact + continuous batching load test.

Loads a ViT INT4 artifact (cli.export vit), starts the
:class:`ContinuousBatcher`, fires a synthetic request load at a target
rate, and reports throughput/latency/batch-occupancy — the serving half of
BASELINE.md's throughput target. With ``--mesh-model N`` the artifact loads
tensor-sharded over an N-way model axis (GSPMD; requires >= N devices).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="QViT INT4 serving load test")
    p.add_argument("--artifact", required=True)
    p.add_argument("--requests", type=int, default=64)
    p.add_argument("--rate", type=float, default=0.0,
                   help="request arrival rate /s (0 = as fast as possible)")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-delay-ms", type=float, default=5.0)
    p.add_argument("--mesh-model", type=int, default=0,
                   help="model-axis size for tensor-sharded serving (0=off)")
    p.add_argument("--no-pallas", action="store_true",
                   help="XLA int path instead of Pallas kernels")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from ..artifact import load_vit_int4_artifact
    from ..serve import ContinuousBatcher, vit_int4_forward

    mesh = None
    if args.mesh_model:
        from jax.sharding import Mesh

        devs = np.array(jax.devices())
        if devs.size < args.mesh_model:
            raise SystemExit(
                f"--mesh-model {args.mesh_model} needs that many devices; "
                f"have {devs.size}")
        mesh = Mesh(devs[: args.mesh_model].reshape(1, args.mesh_model),
                    axis_names=("data", "model"))

    art, cfg = load_vit_int4_artifact(args.artifact, mesh=mesh)
    use_pallas = (jax.default_backend() == "tpu") and not args.no_pallas

    # host-side patchify in the batcher's dispatch thread (overlapped with
    # the device step): the on-device patch relayout costs ~220us/batch-32
    # (tools/exp_entry.py), the host writes these bytes during batch
    # assembly anyway — serve/vit_int4.py images_layout='patches'
    from ..utils.native_prep import patchify_batch

    def forward(images):
        x = jnp.asarray(
            patchify_batch(np.asarray(images, np.float32), cfg.patch_size))
        if mesh is not None:
            with mesh:
                return np.asarray(
                    vit_int4_forward(art, x, cfg, use_pallas=use_pallas,
                                     images_layout="patches"))
        return np.asarray(
            vit_int4_forward(art, x, cfg, use_pallas=use_pallas,
                             images_layout="patches"))

    rng = np.random.default_rng(0)
    example = rng.standard_normal(
        (cfg.img_size, cfg.img_size, 3)).astype(np.float32)

    batcher = ContinuousBatcher(forward, max_batch=args.max_batch,
                                max_delay_ms=args.max_delay_ms)
    print("[serve] warming buckets", batcher.buckets)
    batcher.warmup(example)

    lat = []
    t0 = time.time()
    with batcher:
        futs = []
        for i in range(args.requests):
            if args.rate > 0:
                time.sleep(1.0 / args.rate)
            futs.append((time.monotonic(), batcher.submit(example)))
        for t_sub, f in futs:
            f.result(timeout=120)
            lat.append(time.monotonic() - t_sub)
    wall = time.time() - t0

    out = {
        "requests": args.requests,
        "wall_s": round(wall, 3),
        "throughput_rps": round(args.requests / wall, 2),
        "latency_p50_ms": round(float(np.percentile(lat, 50)) * 1e3, 2),
        "latency_p99_ms": round(float(np.percentile(lat, 99)) * 1e3, 2),
        "batches": batcher.stats["batches"],
        "padded": batcher.stats["padded"],
        "batch_hist": batcher.stats["batch_hist"],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
