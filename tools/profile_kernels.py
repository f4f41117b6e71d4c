"""Profiler-based kernel microbench: exact device times per kernel, no RPC noise.

Usage: python ubench_prof.py
"""
import glob, gzip, json, collections, os, re, shutil, sys
import numpy as np
import jax, jax.numpy as jnp

from quantized_vit_tpu.ops import quant_matmul_fa, int4_matmul
from quantized_vit_tpu.quant.packing import pack_int4

LOOP = 20


def profile_device_times(fn, *args, tag=""):
    """Run fn LOOP times under the profiler; return {kernel_name: avg_us}."""
    out = fn(*args); jax.block_until_ready(out)
    tdir = f"/tmp/prof_{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        for _ in range(LOOP):
            out = fn(*args)
        jax.block_until_ready(out)
    path = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)[0]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {e["pid"]: e["args"].get("name", "") for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    durs = collections.defaultdict(float)
    cnts = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev and not e["name"].startswith("jit_"):
            key = re.sub(r"[.\d]+$", "", e["name"])
            durs[key] += e.get("dur", 0)
            cnts[key] += 1
    return {k: (v / LOOP, cnts[k] // LOOP) for k, v in durs.items()}


def main():
    rng = np.random.default_rng(0)
    M = 1664  # 8 * 208 padded tokens
    print(f"M={M}")
    for (K, N, label) in [(768, 2304, "qkv"), (768, 768, "proj"),
                          (768, 3072, "fc1"), (3072, 768, "fc2")]:
        x = jnp.array(rng.standard_normal((M, K)).astype(np.float32) * 0.1,
                      jnp.bfloat16)
        x_lv = jnp.array(rng.integers(-7, 8, (M, K)), jnp.int8)
        w_lv = jnp.array(rng.integers(-7, 8, (K, N)), jnp.int8)
        wp = pack_int4(w_lv, axis=0)
        bias = jnp.array(rng.standard_normal(N) * 0.01, jnp.float32)
        d = jnp.float32(0.05); t = jnp.float32(1.0); top = jnp.int32(7)
        scale = jnp.float32(1e-3)
        ideal = 2 * M * K * N / 394e12 * 1e6

        # A. fused act-quant matmul (auto blocks)
        fa = jax.jit(lambda x: quant_matmul_fa(
            x, wp, scale, bias, d, t, top, fmt="int4", act_pow=False,
            out_dtype=jnp.bfloat16))
        r = profile_device_times(fa, x, tag=f"fa_{label}")
        t_fa = r.get("quant_matmul_fa", (0, 0))[0]

        # B. pre-quantized int4 matmul (no prologue)
        i4 = jax.jit(lambda xl: int4_matmul(xl, wp, scale, bias,
                                            out_dtype=jnp.float32))
        r2 = profile_device_times(i4, x_lv, tag=f"i4_{label}")
        t_i4 = r2.get("int4_matmul", (0, 0))[0]

        # C. block sweep for fa
        best = (1e9, None)
        for bm in (224, 448, 832, 1664):
            for bn in (256, 512, 768, 1152, 2304, 3072):
                if bn > N or (N % bn) or (M % bm):
                    continue
                try:
                    f = jax.jit(lambda x, bm=bm, bn=bn: quant_matmul_fa(
                        x, wp, scale, bias, d, t, top, fmt="int4",
                        act_pow=False, out_dtype=jnp.bfloat16,
                        block_m=bm, block_n=bn))
                    rr = profile_device_times(f, x, tag=f"sw_{label}_{bm}_{bn}")
                    tt = rr.get("quant_matmul_fa", (1e9, 0))[0]
                    if tt < best[0]:
                        best = (tt, (bm, bn))
                except Exception as ex:
                    pass
        print(f"{label:5s} K={K:4d} N={N:4d}: ideal {ideal:5.1f}us  "
              f"fa(auto) {t_fa:6.1f}us  int4(noprologue) {t_i4:6.1f}us  "
              f"fa best {best[0]:6.1f}us @ {best[1]}")


if __name__ == "__main__":
    main()
