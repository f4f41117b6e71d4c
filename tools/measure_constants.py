"""Measure the chain-timed constants and write MEASURED.json (repo root).

Single source of truth for every chain-measured time that other tools
consume (VERDICT r3 weak #6: the same quantity drifted across
tools/scaling_report.py, __graft_entry__.py and docs). Consumers:
tools/scaling_report.py (TP/DP/ViT-L compute inputs), __graft_entry__.py
(dryrun efficiency predictions), docs (cite MEASURED.json).

Timing method is bench.py's poke-chain (the only valid method on the axon
tunnel — block_until_ready lies, ~25 ms RPC floor): ITERS forwards chained
inside one jit via an O(1) dynamic_update_slice data dependency, empty-jit
floor subtracted. Run on the real chip:

    python tools/measure_constants.py
"""

import functools
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import jax
import jax.numpy as jnp

ITERS = 30

from _bench_util import make_chain as _chain, measure_floor, timeit as _timeit


def main():
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from quantized_vit_tpu.models.vit import ViTConfig
    from quantized_vit_tpu.serve import (prepare_tp_artifact,
                                         random_vit_int4_artifact,
                                         shard_tp_artifact,
                                         vit_int4_forward,
                                         vit_int4_forward_tp)
    from quantized_vit_tpu.utils.native_prep import patchify_batch

    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu:
        print("WARNING: not on TPU — numbers will not be chip truth",
              file=sys.stderr)

    floor = measure_floor()
    out = {}
    prov = {}

    # --- DP (fused single-device path), ViT-B batch 32, patches layout ---
    cfg = ViTConfig(num_classes=1000)
    art = random_vit_int4_artifact(cfg, seed=0, pack_weights=False)
    imgs = jnp.array(np.random.default_rng(0).standard_normal(
        (32, 224, 224, 3)), jnp.float32)
    imgs_p = jnp.asarray(patchify_batch(np.asarray(imgs), cfg.patch_size))
    dp_chain = _chain(lambda a, x: vit_int4_forward(
        a, x, cfg, use_pallas=on_tpu, float_dtype=jnp.bfloat16,
        images_layout="patches"), ITERS)
    dt = max((_timeit(dp_chain, art, imgs_p) - floor) / ITERS, 1e-9)
    out["dp_single_chip_ms_b32"] = round(dt * 1e3, 3)
    prov["dp_single_chip_ms_b32"] = (
        "fused single-device serving path, ViT-B/16 W4A4 batch 32, "
        "patches layout, bf16 residual (poke chain, this script)")

    # --- TP-path single-chip (1x1 mesh: standalone LN+quant, shard_map
    # layout constraints — the honest TP compute input) ---
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1),
                axis_names=("data", "model"))
    art_tp = shard_tp_artifact(prepare_tp_artifact(art, cfg, 1), mesh)
    imgs_tp = jax.device_put(imgs_p,
                             NamedSharding(mesh, P(("data", "model"))))
    tp_chain = _chain(lambda a, x: vit_int4_forward_tp(
        a, x, cfg, mesh, use_pallas=on_tpu,
        float_dtype=jnp.bfloat16, comm_dtype=jnp.bfloat16,
        images_layout="patches"), ITERS)
    dt = max((_timeit(tp_chain, art_tp, imgs_tp) - floor) / ITERS, 1e-9)
    out["tp_single_chip_ms_b32"] = round(dt * 1e3, 3)
    prov["tp_single_chip_ms_b32"] = (
        "TP-path forward on a 1x1 mesh (standalone LN+quant, shard_map "
        "layout constraints), batch 32, patches layout (poke chain)")

    # --- ViT-L/16: single-device batch 16, and the REAL TP-path forward
    # at batch 32 on the 1x1 mesh (VERDICT r4 #7: the previous x2 x1.03
    # extrapolation is replaced by a measurement) ---
    cfg_l = ViTConfig(num_classes=1000, embed_dim=1024, depth=24,
                      num_heads=16, patch_size=16)
    art_l = random_vit_int4_artifact(cfg_l, seed=0, pack_weights=False)
    imgs_l = jnp.asarray(patchify_batch(
        np.asarray(imgs[:16]), cfg_l.patch_size))
    l_chain = _chain(lambda a, x: vit_int4_forward(
        a, x, cfg_l, use_pallas=on_tpu, float_dtype=jnp.bfloat16,
        images_layout="patches"), ITERS)
    dt = max((_timeit(l_chain, art_l, imgs_l) - floor) / ITERS, 1e-9)
    out["vitl_single_chip_ms_b16"] = round(dt * 1e3, 3)

    art_l_tp = shard_tp_artifact(prepare_tp_artifact(art_l, cfg_l, 1), mesh)
    imgs_l32 = jax.device_put(
        jnp.asarray(patchify_batch(np.asarray(imgs), cfg_l.patch_size)),
        NamedSharding(mesh, P(("data", "model"))))
    ltp_chain = _chain(lambda a, x: vit_int4_forward_tp(
        a, x, cfg_l, mesh, use_pallas=on_tpu,
        float_dtype=jnp.bfloat16, comm_dtype=jnp.bfloat16,
        images_layout="patches"), ITERS)
    dt = max((_timeit(ltp_chain, art_l_tp, imgs_l32) - floor) / ITERS, 1e-9)
    out["vitl_tp_single_chip_ms_b32"] = round(dt * 1e3, 3)
    prov["vitl_tp_single_chip_ms_b32"] = (
        "ViT-L/16 TP-path forward on a 1x1 mesh (standalone LN+quant, "
        "shard_map layout constraints), batch 32, patches layout "
        "(poke chain, this script — measured, not extrapolated)")

    # --- batch-1 latency (packed int4 — the weight-bandwidth regime) ---
    # Serving batch-1 path is the whole-depth megakernel
    # (ops/block_stack.py, round 4); the per-block chain is kept as a
    # separate constant for the launch-overhead comparison in docs.
    from quantized_vit_tpu.serve import (prepare_latency_artifact,
                                         vit_int4_forward_latency)

    art_packed = random_vit_int4_artifact(cfg, seed=0, pack_weights=True)
    if on_tpu:
        art_lat, lat_meta = prepare_latency_artifact(art_packed, cfg)
        mk_chain = _chain(lambda a, x: vit_int4_forward_latency(
            a, x, cfg, lat_meta, float_dtype=jnp.bfloat16), 10 * ITERS)
        dt = max((_timeit(mk_chain, art_lat, imgs_p[:1]) - floor)
                 / (10 * ITERS), 1e-9)
        out["batch1_latency_ms"] = round(dt * 1e3, 3)
        prov["batch1_latency_ms"] = (
            "ViT-B/16 packed-int4 batch-1 whole-depth megakernel "
            "(ops/block_stack.py), 300-iter poke chain")
    b1_chain = _chain(lambda a, x: vit_int4_forward(
        a, x, cfg, use_pallas=on_tpu, float_dtype=jnp.bfloat16,
        images_layout="patches"), 10 * ITERS)
    dt = max((_timeit(b1_chain, art_packed, imgs_p[:1]) - floor)
             / (10 * ITERS), 1e-9)
    out["batch1_chain_latency_ms"] = round(dt * 1e3, 3)
    prov["batch1_chain_latency_ms"] = (
        "ViT-B/16 packed-int4 batch-1 per-block kernel chain poke chain, "
        "300 iters (30-iter chains jitter +-30% at this body time)")

    # merge-preserve keys written by other tools (tools/bench_train.py
    # train_* keys) — this script owns only the keys it measures.
    # ADVICE r4 #3: only ALLOWLISTED keys survive the merge, so constants
    # retired from any tool don't persist as stale truth.
    KNOWN_KEYS = set(out) | {
        "batch1_latency_ms",  # TPU-only; keep a prior value on CPU runs
        "train_qat_warmup_ms_per_step_b32", "train_qat_range_ms_per_step_b32",
        "train_qat_bf16mm_ms_per_step_b32",
        "train_bf16_ms_per_step_b32", "train_f32_ms_per_step_b32",
        "train_qat_overhead_vs_f32", "train_qat_overhead_vs_bf16",
    }
    path = os.path.join(_REPO, "MEASURED.json")
    prior = {}
    if os.path.exists(path):
        with open(path) as f:
            prior = json.load(f)
    prior_prov = prior.get("provenance", {})
    prior_prov.update(prov)
    for k in ("_comment", "measured_on", "rpc_floor_ms", "provenance"):
        prior.pop(k, None)
    for k in list(prior):
        if k not in KNOWN_KEYS:
            print(f"[measure_constants] dropping retired key {k!r} "
                  f"(= {prior[k]!r}) — not in the allowlist", file=sys.stderr)
            prior.pop(k)
            prior_prov.pop(k, None)
    prior.update(out)
    out = prior
    prov = prior_prov

    # ADVICE r4 #2: the fresh-checkout fallbacks in utils/measured.py must
    # not silently drift from what this script measures
    from quantized_vit_tpu.utils.measured import FALLBACKS
    for k in FALLBACKS:
        if k not in out:
            print(f"[measure_constants] WARNING: FALLBACKS key {k!r} was "
                  "not measured this run", file=sys.stderr)
        elif abs(FALLBACKS[k] - out[k]) > 0.15 * max(abs(out[k]), 1e-9):
            print(f"[measure_constants] WARNING: utils/measured.py "
                  f"FALLBACKS[{k!r}] = {FALLBACKS[k]} drifted >15% from "
                  f"the fresh measurement {out[k]} — update the fallback",
                  file=sys.stderr)

    doc = {
        "_comment": ("Single source of truth for chain-measured timing "
                     "constants (VERDICT r3 weak #6). Written by "
                     "tools/measure_constants.py on the real v5e chip; "
                     "read by tools/scaling_report.py, __graft_entry__.py "
                     "and docs. Do not edit numbers by hand."),
        **out,
        "provenance": prov,
        "measured_on": ("v5e (axon tunnel)" if on_tpu
                        else "NOT TPU — placeholder"),
        "rpc_floor_ms": round(floor * 1e3, 1),
    }
    path = os.path.join(_REPO, "MEASURED.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(json.dumps(doc, indent=2))
    print(f"written to {path}")


if __name__ == "__main__":
    main()
