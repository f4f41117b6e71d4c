"""Profile the full ViT INT4 serving forward: per-kernel device times.

Usage: python tools/profile_serving.py [BATCH]
"""
import collections
import glob
import gzip
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from quantized_vit_tpu.models.vit import ViTConfig
from quantized_vit_tpu.serve import random_vit_int4_artifact, vit_int4_forward

LOOP = 10


def profile_device_times(fn, *args, tag=""):
    out = fn(*args)
    jax.block_until_ready(out)
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
        if (e.get("ph") == "X" and e.get("pid") in dev
                and not e["name"].startswith("jit_")):
            key = re.sub(r"[.\d]+$", "", e["name"])
            durs[key] += e.get("dur", 0)
            cnts[key] += 1
    return {k: (v / LOOP, cnts[k] // LOOP) for k, v in durs.items()}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = ViTConfig(num_classes=1000)
    art = random_vit_int4_artifact(cfg, seed=0)
    images = jnp.array(
        np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
        jnp.float32)

    fwd = jax.jit(lambda im: vit_int4_forward(
        art, im, cfg, float_dtype=jnp.bfloat16))
    r = profile_device_times(fwd, images, tag=f"serve_b{batch}")
    total = 0.0
    for k, (us, n) in sorted(r.items(), key=lambda kv: -kv[1][0]):
        total += us
        print(f"{k:50s} {us:9.1f} us  x{n}")
    print(f"{'TOTAL':50s} {total:9.1f} us  "
          f"({batch / total * 1e6:.0f} img/s)")


if __name__ == "__main__":
    main()
