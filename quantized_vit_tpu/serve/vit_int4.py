"""ViT W4A4 serving path: exported integer artifacts + Pallas INT kernels.

This is the BASELINE.json north star — replacing the reference's float
fake-quant inference (quant_layers.py:575-587 forward) with real packed-INT4
MXU matmuls:

- :func:`export_vit_int4` converts a trained fake-quant params pytree into a
  serving artifact: per quantized layer, weight integer levels packed int4
  (or int8 when the trained bit width exceeds 4 — GETA produces mixed
  precision), the fused dequant scale ``d_w * d_a``, the float bias, and the
  activation quantizer constants (d_a, q_m_a, t_a, top level).
- :func:`vit_int4_forward` runs the ViT with every Dense/Conv as an
  ``ops.int4_matmul``/``int8_matmul`` call. The patch-embed 16x16/s16 conv is
  exactly a [B*196, p*p*3] x [p*p*3, D] gemm (vit_model.py:78,100), so it
  uses the same kernel. LayerNorm/softmax/GELU/residuals stay float (bf16),
  matching the reference's quantization surface (SURVEY.md §3.4).

Numerics: identical to the fake-quant forward because LSFQ quantized values
are integer multiples of d — sum((d_w i_w)(d_a i_a)) = d_w d_a sum(i_w i_a)
exactly (see quant/lsfq.py). Tests assert parity against the float model.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("w", "scale", "bias", "act"),
    meta_fields=("fmt", "act_pow", "top"),
)
@dataclasses.dataclass
class QLayerArtifact:
    """One quantized layer's serving artifact. ``fmt`` ('int4'/'int8'),
    ``act_pow`` (whether the layer's activation t != 1, i.e. the power map
    must run) and ``top`` (the activation clip level, a per-layer export-
    time constant) are pytree metadata so they stay static under jit —
    ``top`` in particular MUST be compile-time: a runtime clip bound costs
    ~60us/kernel on v5e (ops/fused.py:_fused_kernel)."""

    w: jax.Array          # packed int4 [K/2, N] or int8 [K, N]
    scale: jax.Array      # d_w * d_a
    bias: Any             # [N] f32 or None
    act: Dict[str, jax.Array]  # activation quantizer constants (d, q_m, t)
    fmt: str
    act_pow: bool = True
    top: int = 127

from ..models.vit import ViTConfig
from ..ops import (attention_qkv, attention_qkv_xla, fused_quant_matmul,
                   fused_quant_matmul_xla)
from ..ops.fused import _quantize_f32
from ..quant.lsfq import lsfq_levels, lsfq_top_level, _safe_pow, _EPS
from ..quant.packing import pack_int4


def _export_layer(layer_params: Dict[str, Any], pack_weights: bool = True):
    """One QuantDense/QuantConv -> serving artifact entry.

    ``pack_weights``: store 4-bit levels nibble-packed ([K/2, N], halves
    weight HBM) vs unpacked int8 ([K, N]). Unpacked is the throughput
    default: the in-kernel nibble unpack costs ~8-15us/layer of VPU time
    per call where the extra HBM read costs ~1.4us at ViT-B stripe sizes
    (measured, tools/time_kernels.py); packed wins only when weight
    bandwidth dominates (batch-1 latency serving).
    """
    kernel = layer_params["kernel"]
    if kernel.ndim == 4:  # conv HWIO -> [H*W*I, O] gemm form
        h, w, i, o = kernel.shape
        kernel = kernel.reshape(h * w * i, o)
    d_w = layer_params["d_quant_wt"]
    qm_w = layer_params["q_m_wt"]
    t_w = layer_params.get("t_quant_wt", jnp.ones_like(d_w))

    w_lv = lsfq_levels(kernel, d_w, qm_w, t_w)
    top_w = int(lsfq_top_level(d_w, qm_w, t_w)[0])

    d_a = layer_params["d_quant_act"]
    qm_a = layer_params["q_m_act"]
    t_a = layer_params.get("t_quant_act", jnp.ones_like(d_a))
    top_a = lsfq_top_level(d_a, qm_a, t_a)[0]

    # Layers trained above 8 bits (export before GETA's projection settles)
    # can't ride the int8 MXU path at their learned step size — level
    # CLIPPING would corrupt values, so instead REQUANTIZE properly to
    # 8 bits: widen d to d(8 bits) and recompute the levels. This is a
    # sound 8-bit quantization of the same float tensor (numerics change
    # by at most d8/2 per value), flagged with a warning.
    if top_w > 127 or float(top_a) > 127:
        import warnings

        from ..quant.bitwidth import d_for_bits

        warnings.warn(
            f"layer trained above 8 bits (weight top {top_w}, act top "
            f"{float(top_a):.0f}); requantizing to 8 bits for the INT8 "
            "serving path", stacklevel=2)
        if top_w > 127:
            d_w = jnp.broadcast_to(d_for_bits(8.0, qm_w, t_w), d_w.shape)
            w_lv = lsfq_levels(kernel, d_w, qm_w, t_w)
            top_w = int(lsfq_top_level(d_w, qm_w, t_w)[0])
        if float(top_a) > 127:
            d_a = jnp.broadcast_to(d_for_bits(8.0, qm_a, t_a), d_a.shape)
            top_a = lsfq_top_level(d_a, qm_a, t_a)[0]
    act = {"d": d_a[0], "q_m": qm_a[0], "t": t_a[0]}
    top = int(min(float(top_a), 127.0))
    act_pow = bool(abs(float(t_a[0]) - 1.0) > 1e-6)
    k = w_lv.shape[0]
    if pack_weights and top_w <= 7 and k % 2 == 0:
        return QLayerArtifact(
            w=pack_int4(jnp.clip(w_lv, -8, 7).astype(jnp.int8), axis=0),
            scale=(d_w * d_a)[0], bias=layer_params.get("bias"),
            act=act, fmt="int4", act_pow=act_pow, top=top,
        )
    return QLayerArtifact(
        w=jnp.clip(w_lv, -127, 127).astype(jnp.int8),
        scale=(d_w * d_a)[0], bias=layer_params.get("bias"),
        act=act, fmt="int8", act_pow=act_pow, top=top,
    )


def export_vit_int4(cfg: ViTConfig, params: Dict[str, Any],
                    pack_weights: bool = True) -> Dict[str, Any]:
    """Trained fake-quant ViT params -> integer serving artifact pytree.

    ``fmt`` per layer is a static string ('int4'/'int8'); everything else is
    arrays, so the artifact passes straight through jit as a pytree.
    ``pack_weights=False`` stores 4-bit levels unpacked int8 — the
    single-chip throughput configuration (see :func:`_export_layer`).
    """
    art: Dict[str, Any] = {}
    art["patch_embed"] = _export_layer(params["patch_embed"]["proj"],
                                       pack_weights)
    art["cls_token"] = params["cls_token"]
    art["pos_embed"] = params["pos_embed"]
    art["blocks"] = []
    for i in range(cfg.depth):
        b = params[f"blocks_{i}"]
        art["blocks"].append({
            "norm1": b["norm1"],
            "qkv": _export_layer(b["attn"]["qkv"], pack_weights),
            "proj": _export_layer(b["attn"]["proj"], pack_weights),
            "norm2": b["norm2"],
            "fc1": _export_layer(b["mlp"]["fc1"], pack_weights),
            "fc2": _export_layer(b["mlp"]["fc2"], pack_weights),
        })
    art["norm"] = params["norm"]
    if cfg.representation_size is not None:
        art["pre_logits"] = {k: v for k, v in params["pre_logits"].items()}
    if cfg.num_classes > 0:
        art["head"] = _export_layer(params["head"], pack_weights)
    return art


def _qmatmul(x2d, entry: QLayerArtifact, use_pallas: bool,
             float_dtype=jnp.float32, **kw):
    """Quantized matmul with fused prologue/epilogue (see ops/fused.py)."""
    mm = fused_quant_matmul if use_pallas else fused_quant_matmul_xla
    kw.setdefault("prologue", "quant")
    if kw["prologue"] is not None:
        kw.setdefault("act_d", entry.act["d"])
        kw.setdefault("act_t", entry.act["t"])
        kw.setdefault("act_top", entry.top)
        kw.setdefault("act_pow", entry.act_pow)
    return mm(x2d, entry.w, entry.scale, entry.bias, fmt=entry.fmt,
              out_dtype=float_dtype, **kw)


def _layernorm(x, p, eps=1e-6):
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["scale"]
            + p["bias"]).astype(dt)


def _round_up(a: int, b: int) -> int:
    return -(-a // b) * b


def _embed_tokens(art, images, cfg: ViTConfig, use_pallas: bool,
                  float_dtype, images_layout: str, n_align: int = 32):
    """Patch-embed + pos-embed + cls + pad: images -> [B*n_pad, D] rows.

    Shared by the single-device forward and the shard_map TP forward
    (serve/vit_tp.py), which runs it per-device on its local images.
    Returns (x2d, n_pad, dim). See :func:`vit_int4_forward` for the layout
    notes (cls-last token order, token padding). ``n_align``: token-pad
    granularity — 16 (197 -> 208 rows/img) is the measured batch-serving
    optimum (tools/exp_pad208.py: 7.1% less matmul M beats the former
    224-row layout on every kernel); 32 (-> 224) remains for the batch-1
    megakernel whose int8 scratch wants 32-sublane M."""
    b = images.shape[0]
    p = cfg.patch_size
    g = cfg.img_size // p

    pe = art["patch_embed"]
    if images_layout == "patches":
        acc32 = _qmatmul(
            images.reshape(b * g * g, p * p * cfg.in_channels), pe,
            use_pallas, jnp.float32, prologue="quant", epilogue=None,
        )
        dim = acc32.shape[1]
        acc = acc32.reshape(b, g, g, dim)
    else:
        if pe.fmt == "int4":
            from ..quant.packing import unpack_int4

            w_lv = unpack_int4(pe.w, axis=0)
        else:
            w_lv = pe.w
        dim = w_lv.shape[1]
        w_conv = w_lv.reshape(p, p, cfg.in_channels, dim).astype(jnp.bfloat16)
        img_lv = _quantize_f32(images, pe.act["d"], pe.act["t"], pe.top,
                               pe.act_pow).astype(jnp.bfloat16)
        acc = jax.lax.conv_general_dilated(
            img_lv, w_conv, window_strides=(p, p), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    n_real = cfg.num_tokens
    n_pad = _round_up(n_real, n_align)

    pos = art["pos_embed"].astype(jnp.float32).reshape(n_real, dim)
    cls_row = art["cls_token"].astype(jnp.float32).reshape(dim) + pos[0]
    pos_patch = pos[1:]
    pe_scale = jnp.float32(1.0) if images_layout == "patches" else pe.scale
    if pe.bias is not None and images_layout != "patches":
        pos_patch = pos_patch + pe.bias
    acc = acc.reshape(b, g * g, dim)
    if use_pallas:
        from ..ops.patch import patch_finalize

        x2d = patch_finalize(acc, pos_patch, cls_row, pe_scale,
                             n_pad=n_pad, out_dtype=float_dtype)
    else:
        body = acc * jnp.asarray(pe_scale, jnp.float32) + pos_patch
        x = jnp.concatenate(
            [body, jnp.broadcast_to(cls_row, (b, 1, dim))], axis=1
        ).astype(float_dtype)
        if n_pad != n_real:
            x = jnp.pad(x, ((0, 0), (0, n_pad - n_real), (0, 0)))
        x2d = x.reshape(b * n_pad, dim)
    return x2d, n_pad, dim


def _vit_block(x2d, blk, *, b: int, n_pad: int, n_real: int, dim: int,
               hd: int, sm_scale: float, use_pallas: bool, float_dtype,
               int_attention: bool):
    """One transformer block of the serving forward (attention branch +
    MLP branch, both with the fused-kernel routing). Shared by the
    single-device forward and the FSDP weight-gather forward
    (serve/vit_fsdp.py), which runs it per device on gathered weights."""
    proj_e = blk["proj"]
    fc2_e = blk["fc2"]
    # heads may differ per block in GETA-compressed subnets; the qkv
    # width encodes it (N = 3 * heads_i * hd)
    heads_i = blk["qkv"].w.shape[1] // (3 * hd)

    qkv_e = blk["qkv"]
    from ..ops.attention import attention_block_fits

    attn_fn = attention_qkv if use_pallas else attention_qkv_xla
    qkv_item = jnp.dtype(float_dtype).itemsize
    if (use_pallas and qkv_e.fmt == proj_e.fmt and b >= 4
            and (attention_block_fits(n_pad, dim, heads_i, hd, qkv_e.fmt,
                                      j_imgs=2, qkv_itemsize=qkv_item)
                 or attention_block_fits(n_pad, dim, heads_i, hd,
                                         qkv_e.fmt, j_imgs=1,
                                         qkv_itemsize=qkv_item))):
        # the WHOLE attention residual branch in one kernel — LN ->
        # quant -> qkv matmul -> per-head softmax -> int8 alv -> proj
        # -> +x. The [M, 3D] qkv tensor (66 MB/block round trip at
        # batch 32) and the [M, D] alv tensor never touch HBM
        # (ops/attention.py:attention_block, bitwise vs the chain;
        # 179.7 vs 195.7 us/block at batch 32). Gate b >= 4 (round 5,
        # tools/exp_smallbatch.py): block kernels win at b=4 (0.68 vs
        # the chain's 0.75 ms/batch) and tie at b=2 (0.425 vs 0.428) —
        # batches 2-3 keep the chain; batch 1 routes to the whole-depth
        # megakernel (0.165 ms; the b=2 megakernel crashes Mosaic's
        # scoped-VMEM at 448 resident rows — measured dead end).
        from ..ops import attention_block

        x2d = attention_block(
            x2d.reshape(b, n_pad, dim),
            qkv_e.w, qkv_e.scale, qkv_e.bias,
            proj_e.w, proj_e.scale, proj_e.bias,
            ln_scale=blk["norm1"]["scale"],
            ln_bias=blk["norm1"]["bias"],
            heads=heads_i, sm_scale=sm_scale, n_valid=n_real,
            act_d=qkv_e.act["d"], act_t=qkv_e.act["t"],
            act_top=qkv_e.top, act_pow=qkv_e.act_pow,
            out_d=proj_e.act["d"], out_t=proj_e.act["t"],
            out_top=proj_e.top, out_pow=proj_e.act_pow,
            fmt=proj_e.fmt, out_dtype=float_dtype,
            int_attention=int_attention,
        ).reshape(b * n_pad, dim)
    else:
        qkv = _qmatmul(
            x2d, qkv_e, use_pallas, float_dtype,
            prologue="ln_quant",
            ln_scale=blk["norm1"]["scale"],
            ln_bias=blk["norm1"]["bias"],
        )
        alv = attn_fn(
            qkv.reshape(b, n_pad, 3 * heads_i * hd),
            heads=heads_i, sm_scale=sm_scale, n_valid=n_real,
            out_d=proj_e.act["d"], out_t=proj_e.act["t"],
            out_top=proj_e.top, out_pow=proj_e.act_pow,
            int_attention=int_attention,
        )
        x2d = _qmatmul(
            alv.reshape(b * n_pad, heads_i * hd), proj_e, use_pallas,
            float_dtype, prologue=None, epilogue="residual",
            residual=x2d,
        )
    fc1_e = blk["fc1"]
    hid_dim = fc1_e.w.shape[1]
    mlp_aligned = (use_pallas and fc1_e.fmt == fc2_e.fmt
                   and x2d.shape[1] % (256 if fc1_e.fmt == "int4"
                                       else 128) == 0
                   and hid_dim % (256 if fc1_e.fmt == "int4"
                                  else 128) == 0)
    chain_bm = None
    if mlp_aligned:
        # VMEM-aware routing (tools/exp_vith.py, ViT-H measurements): the
        # resident-weight fused_mlp needs both weights in VMEM next to a
        # useful M tile. ViT-B/L fit (bm 448-896, ~81% roofline); ViT-H's
        # 13.1 MB forces bm=32 (39%) — there the measured order is
        # two-kernel chain at bm=288 (83%) > chunked fused (74%) >
        # resident fused (39%). Small-M big-weight (batch<=2) keeps the
        # fused kernel: _fused_mlp auto-chunks, weights then stream once.
        from ..ops.fused import fused_mlp_resident_bm

        big_weights = fused_mlp_resident_bm(
            x2d.shape[1], hid_dim, fc1_e.fmt,
            jnp.dtype(float_dtype).itemsize,
            jnp.dtype(float_dtype).itemsize) < 224
        if big_weights and x2d.shape[0] > 576:
            mlp_aligned = False  # -> chain
            if use_pallas:
                # measured chain tiles for the big-weight (ViT-H-class)
                # geometries: 544 at 272-row token padding (fc1 100.3 us
                # vs 115.0 at the auto bm=128 — round-5 sweep), 288 at
                # the r4 288-row geometry
                for cb in (544, 288):
                    if x2d.shape[0] % cb == 0:
                        chain_bm = cb
                        break
    if mlp_aligned:
        # whole-MLP-block kernel: the [M, hidden] tensor never touches
        # HBM and x is read once (ops/fused.py:fused_mlp — fc1 VPU
        # epilogue overlapped under fc2's stripe dots; replaces the
        # fc1/fc2 kernel pair, -40us/block measured on v5e)
        from ..ops import fused_mlp

        # Measured M-tile overrides for the 208-token geometries (the
        # conservative fits predicate rejects these, Mosaic runs them
        # fine — it fails loudly, never silently, on a real overflow):
        # ViT-B (768, 3072): bm=832 — 197.4 us vs 200.9 at the gated 416
        # (tools/exp_pad208.py); ViT-L (1024, 4096): bm=416 — 175.1 us
        # vs 190.5 auto (round-5 ViT-L tile sweep). Gated to the exact
        # measured (k, hid).
        mlp_bm = None
        if use_pallas and fc1_e.fmt == "int8":
            if (x2d.shape[1] == 768 and hid_dim == 3072
                    and x2d.shape[0] % 832 == 0):
                mlp_bm = 832
            elif (x2d.shape[1] == 1024 and hid_dim == 4096
                    and x2d.shape[0] % 416 == 0):
                mlp_bm = 416
        x2d = fused_mlp(
            x2d, fc1_e.w, fc1_e.scale, fc1_e.bias,
            fc2_e.w, fc2_e.scale, fc2_e.bias,
            block_m=mlp_bm,
            ln_scale=blk["norm2"]["scale"],
            ln_bias=blk["norm2"]["bias"],
            act_d=fc1_e.act["d"], act_t=fc1_e.act["t"],
            act_top=fc1_e.top, act_pow=fc1_e.act_pow,
            hid_d=fc2_e.act["d"], hid_t=fc2_e.act["t"],
            hid_top=fc2_e.top, hid_pow=fc2_e.act_pow,
            fmt=fc1_e.fmt, out_dtype=float_dtype,
        )
    else:
        bm_kw = {"block_m": chain_bm} if (chain_bm and use_pallas) else {}
        hlv = _qmatmul(
            x2d, fc1_e, use_pallas, float_dtype,
            prologue="ln_quant",
            ln_scale=blk["norm2"]["scale"], ln_bias=blk["norm2"]["bias"],
            epilogue="gelu_quant",
            out_d=fc2_e.act["d"], out_t=fc2_e.act["t"],
            out_top=fc2_e.top, out_pow=fc2_e.act_pow, **bm_kw,
        )
        x2d = _qmatmul(
            hlv, fc2_e, use_pallas, float_dtype,
            prologue=None, epilogue="residual", residual=x2d, **bm_kw,
        )
    return x2d


def _blocks_uniform(blocks) -> bool:
    """True when every block shares geometry and static quantizer metadata
    — the precondition for scanning one traced block body over stacked
    weights (GETA-compressed subnets with per-block head counts, or
    mixed-precision exports with per-layer tops, fall back to unrolling)."""
    def sig(b):
        return tuple(
            (k, b[k].fmt, b[k].act_pow, b[k].top, b[k].bias is not None,
             tuple(b[k].w.shape))
            for k in ("qkv", "proj", "fc1", "fc2"))
    s0 = sig(blocks[0])
    return all(sig(b) == s0 for b in blocks[1:])


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "use_pallas", "float_dtype", "int_attention",
                     "images_layout", "scan_blocks", "n_align",
                     "input_scale"),
)
def vit_int4_forward(art, images, cfg: ViTConfig, use_pallas: bool = True,
                     float_dtype=jnp.float32, int_attention: bool = False,
                     images_layout: str = "nhwc",
                     scan_blocks: bool | None = None,
                     n_align: int = 16,
                     input_scale: float | None = None):
    """Quantized ViT forward on integer weights. images: [B, H, W, 3] f32,
    or — with ``images_layout='patches'`` — the host-patchified
    [B, (H/P)*(W/P), P*P*3] layout from utils.native_prep.patchify_batch:
    the on-device patch relayout costs ~220us/batch-32 however expressed
    (strided conv, dy-gemm, explicit transpose — tools/exp_entry.py) while
    the host input pipeline writes those bytes anyway, and the patch embed
    then runs as an ordinary K=P*P*3 fused matmul (~40us).

    Fully fused serving pipeline (per transformer block, 5 kernels and no
    intermediate HBM glue):

      qkv  = fused_quant_matmul(x, prologue=LN1+quant)          bf16 [M, 3D]
      alv  = attention_qkv(qkv) -> softmax in VMEM, epilogue
             quantizes to the proj layer's int8 levels           int8 [M, D]
      x    = fused_quant_matmul(alv, epilogue=residual+x)       bf16 [M, D]
      hlv  = fused_quant_matmul(x, prologue=LN2+quant,
             epilogue=GELU+quant to fc2's levels)                int8 [M, Hid]
      x    = fused_quant_matmul(hlv, epilogue=residual+x)       bf16 [M, D]

    Tokens are padded once (197 -> multiple of 16) right after pos-embed; the
    attention kernel masks padded keys, so no per-kernel pad/slice runs.

    ``float_dtype`` sets the residual-stream dtype. bf16 is the serving
    configuration; f32 is the strict-parity configuration the tests compare
    against the fake-quant model. Level math is always f32 so levels never
    flip between the two.
    """
    b = images.shape[0]

    # integer input mode (round 5): serving pipelines feed uint8 pixels
    # (JPEG-decoded bytes) — 4x less host->device transfer than f32
    # (measured the bottleneck of the batcher load test over the dev
    # tunnel at ~50 MB/s fresh-buffer upload: docs/PERFORMANCE.md
    # "Serving"); the cast + scale to float happens here ON DEVICE
    if input_scale is not None:
        images = images.astype(jnp.float32) * jnp.float32(input_scale)

    # Patch embed as a bf16 LEVEL conv: quantize the image to integer
    # levels elementwise (layout-free), then run XLA's native strided conv
    # on bf16 levels with f32 accumulation. Bit-exact vs the int gemm form
    # because levels (<=127) and their products are exact in bf16 and the
    # accumulator stays below 2^24 (768 * top_w * top_a <= 1.24e7); avoids
    # the [B,224,224,3] -> [B*196,768] relayout that cost ~570us/batch-32
    # on v5e (patchify transposes cross the lane dim, so XLA materializes
    # them). Replaces the reference's QuantizeConv2d patch embed
    # (vit_model.py:84-103, quant_layers.py:575-587). With
    # images_layout='patches' the host already patchified and the embed is
    # a plain quantized matmul over K = p*p*3 (bit-identical logits).
    #
    # 16-row token padding (197 -> 208): cuts 7.1% of every matmul's M vs
    # the former 224-row layout, and M = B*208 divides the 832/416-row M
    # tiles which measured at-or-better per-FLOP rates than 896/448 at
    # these shapes (tools/exp_pad208.py — attention_block 168.9 vs 177.9
    # us/block, fused_mlp 197.4 vs 216.1 at bm=832). Token layout:
    # patches first, cls LAST real row, pad rows above — attention is
    # token-permutation-invariant (ops/patch.py).
    x2d, n_pad, dim = _embed_tokens(art, images, cfg, use_pallas,
                                    float_dtype, images_layout,
                                    n_align=n_align)
    n_real = cfg.num_tokens

    hd = dim // cfg.num_heads
    sm_scale = cfg.qk_scale if cfg.qk_scale is not None else hd**-0.5

    blocks = art["blocks"]
    common = dict(b=b, n_pad=n_pad, n_real=n_real, dim=dim, hd=hd,
                  sm_scale=sm_scale, use_pallas=use_pallas,
                  float_dtype=float_dtype, int_attention=int_attention)
    if scan_blocks is None:
        # measured on v5e (tools/exp_vith.py follow-ups): unrolled beats
        # scanned at every depth tried — ViT-H b8 9.99 vs 11.10 ms (the
        # scan's per-step weight slice from the stacked array costs an
        # HBM copy per block) and ViT-B b32 5.34 vs 5.39. scan_blocks=True
        # remains available for program-size/compile-time relief (one
        # traced block instead of depth). NOTE for harness authors: pass
        # the artifact as a jit ARGUMENT, never a closure constant — a
        # closure artifact is inlined as MLIR literals (1.27 GB at ViT-H)
        # and overflows the remote-compile request limit.
        scan_blocks = False
    if scan_blocks and len(blocks) > 1 and _blocks_uniform(blocks):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

        def body(carry, blk):
            return _vit_block(carry, blk, **common), None

        x2d, _ = jax.lax.scan(body, x2d, stacked)
    else:
        for blk in blocks:
            x2d = _vit_block(x2d, blk, **common)

    x = x2d.reshape(b, n_pad, dim)[:, n_real - 1]  # cls row (last real row)
    x = _layernorm(x, art["norm"]).astype(jnp.float32)
    if "pre_logits" in art:
        x = jnp.tanh(x @ art["pre_logits"]["kernel"] + art["pre_logits"]["bias"])
    if "head" in art:
        x = _qmatmul(x, art["head"], use_pallas, jnp.float32)
    return x


class StackMeta(NamedTuple):
    """Static metadata for the batch-1 megakernel (hashable, jit-static)."""

    fmt: str
    heads: int
    act_top: int
    out_top: int
    mlp_top: int
    hid_top: int
    act_pow: bool
    out_pow: bool
    mlp_pow: bool
    hid_pow: bool


def prepare_latency_artifact(art: Dict[str, Any], cfg: ViTConfig):
    """One-time prep for the batch-1 megakernel (ops/block_stack.py):
    stack the per-block weights along a leading depth axis and apply the
    SAME constant folds the per-block kernel wrappers apply (1/d into LN
    gamma/beta when the quantizer is linear; 2^-0.5 into fc1's dequant
    for the folded-GELU handoff). Stacking happens HERE, outside jit —
    inside jit it would re-copy every weight per call (~43 MB at ViT-B,
    ruinous at a 0.1 ms latency target).

    Returns (latency_artifact, StackMeta). Requires uniform static
    metadata across blocks (fmt/tops/pow — true for standard exports;
    GETA mixed-precision subnets fall back to the chain path)."""
    blocks = art["blocks"]
    if not _blocks_uniform(blocks):
        raise ValueError("per-block static metadata differs; the "
                         "megakernel needs a uniform stack")
    b0 = blocks[0]
    fmt = b0["qkv"].fmt
    if any(b0[k].fmt != fmt for k in ("proj", "fc1", "fc2")):
        raise ValueError("mixed weight formats within a block; the "
                         "megakernel needs one fmt (use the chain path)")
    hd = cfg.embed_dim // cfg.num_heads
    heads = b0["qkv"].w.shape[1] // (3 * hd)
    meta = StackMeta(
        fmt, heads,
        b0["qkv"].top, b0["proj"].top, b0["fc1"].top, b0["fc2"].top,
        b0["qkv"].act_pow, b0["proj"].act_pow,
        b0["fc1"].act_pow, b0["fc2"].act_pow)

    def f32(a):
        return jnp.asarray(a, jnp.float32)

    def fold_ln(ln, entry):
        g, be = f32(ln["scale"]), f32(ln["bias"])
        if not entry.act_pow:
            inv_d = 1.0 / f32(entry.act["d"])
            g, be = g * inv_d, be * inv_d
        return g, be

    rows = {"wq": [], "qs": [], "qb": [], "l1g": [], "l1b": [],
            "wp": [], "ps": [], "pb": [], "l2g": [], "l2b": [],
            "w1": [], "s1": [], "b1": [], "w2": [], "s2": [], "b2": [],
            "act_d": [], "act_t": [], "out_d": [], "out_t": [],
            "mlp_d": [], "mlp_t": [], "hid_d": [], "hid_t": []}
    for blk in blocks:
        qkv_e, proj_e = blk["qkv"], blk["proj"]
        fc1_e, fc2_e = blk["fc1"], blk["fc2"]
        three = qkv_e.w.shape[1]
        hid = fc1_e.w.shape[1]
        d = proj_e.w.shape[1]
        g1, be1 = fold_ln(blk["norm1"], qkv_e)
        g2, be2 = fold_ln(blk["norm2"], fc1_e)
        s1 = jnp.broadcast_to(f32(fc1_e.scale), (hid,))
        b1 = (jnp.zeros((hid,), jnp.float32) if fc1_e.bias is None
              else f32(fc1_e.bias))
        if not fc2_e.act_pow:  # folded-GELU handoff (fused_mlp wrapper)
            s1 = s1 * jnp.float32(2.0**-0.5)
            b1 = b1 * jnp.float32(2.0**-0.5)
        rows["wq"].append(qkv_e.w)
        rows["qs"].append(jnp.broadcast_to(f32(qkv_e.scale), (three,)))
        rows["qb"].append(jnp.zeros((three,), jnp.float32)
                          if qkv_e.bias is None else f32(qkv_e.bias))
        rows["l1g"].append(g1)
        rows["l1b"].append(be1)
        rows["wp"].append(proj_e.w)
        rows["ps"].append(jnp.broadcast_to(f32(proj_e.scale), (d,)))
        rows["pb"].append(jnp.zeros((d,), jnp.float32)
                          if proj_e.bias is None else f32(proj_e.bias))
        rows["l2g"].append(g2)
        rows["l2b"].append(be2)
        rows["w1"].append(fc1_e.w)
        rows["s1"].append(s1)
        rows["b1"].append(b1)
        rows["w2"].append(fc2_e.w)
        rows["s2"].append(jnp.broadcast_to(f32(fc2_e.scale), (d,)))
        rows["b2"].append(jnp.zeros((d,), jnp.float32)
                          if fc2_e.bias is None else f32(fc2_e.bias))
        rows["act_d"].append(f32(qkv_e.act["d"]))
        rows["act_t"].append(f32(qkv_e.act["t"]))
        rows["out_d"].append(f32(proj_e.act["d"]))
        rows["out_t"].append(f32(proj_e.act["t"]))
        rows["mlp_d"].append(f32(fc1_e.act["d"]))
        rows["mlp_t"].append(f32(fc1_e.act["t"]))
        rows["hid_d"].append(f32(fc2_e.act["d"]))
        rows["hid_t"].append(f32(fc2_e.act["t"]))

    stack = {}
    for k, vs in rows.items():
        arr = jnp.stack(vs)
        if arr.ndim == 2 and k not in ("wq", "wp", "w1", "w2"):
            arr = arr[:, None, :]  # [L, 1, cols] (kernel scale/bias rows)
        stack[k] = arr

    out = {k: v for k, v in art.items() if k != "blocks"}
    out["stack"] = stack
    return out, meta


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "meta", "float_dtype", "images_layout",
                     "interpret"),
)
def vit_int4_forward_latency(art, images, cfg: ViTConfig, meta: StackMeta,
                             float_dtype=jnp.bfloat16,
                             images_layout: str = "patches",
                             interpret: bool = False):
    """Batch-1 latency forward: embed -> ONE megakernel over the whole
    block stack -> head (ops/block_stack.py). ~4 dispatches instead of
    ~38; numerics identical to vit_int4_forward (parity-tested).

    art: (latency_artifact from :func:`prepare_latency_artifact`).
    images: batch size 1 ([1, H, W, 3] or patches layout)."""
    from ..ops.block_stack import vit_block_stack

    b = images.shape[0]
    if b != 1:
        # measured dead end (round 5, tools/exp_smallbatch.py): at b=2
        # the 448 resident rows overflow Mosaic's scoped VMEM (compiler
        # crash) even though the analytic estimate fit; b=2-3 serve via
        # the per-block chain, b>=4 via the block kernels
        # (serve routing gate in _vit_block)
        raise ValueError(f"latency megakernel is batch-1 only, got {b}")
    # interpret=True (CPU parity tests): the embed/head Pallas kernels
    # can't lower on CPU, so those stages take their XLA mirrors
    # (bit-identical — bench parity preamble) while the megakernel runs
    # in Pallas interpret mode
    x2d, n_pad, dim = _embed_tokens(art, images, cfg, not interpret,
                                    float_dtype, images_layout)
    hd = dim // cfg.num_heads
    sm_scale = cfg.qk_scale if cfg.qk_scale is not None else hd**-0.5
    st = art["stack"]
    x2d = vit_block_stack(
        x2d, st["wq"], st["qs"], st["qb"], st["l1g"], st["l1b"],
        st["wp"], st["ps"], st["pb"], st["l2g"], st["l2b"],
        st["w1"], st["s1"], st["b1"], st["w2"], st["s2"], st["b2"],
        st["act_d"], st["act_t"], st["out_d"], st["out_t"],
        st["mlp_d"], st["mlp_t"], st["hid_d"], st["hid_t"],
        heads=meta.heads, sm_scale=sm_scale, n_valid=cfg.num_tokens,
        fmt=meta.fmt, act_pow=meta.act_pow, out_pow=meta.out_pow,
        mlp_pow=meta.mlp_pow, hid_pow=meta.hid_pow,
        act_top=meta.act_top, out_top=meta.out_top,
        mlp_top=meta.mlp_top, hid_top=meta.hid_top,
        out_dtype=float_dtype, j_imgs=b, interpret=interpret)

    n_real = cfg.num_tokens
    x = x2d.reshape(b, n_pad, dim)[:, n_real - 1]
    x = _layernorm(x, art["norm"]).astype(jnp.float32)
    if "pre_logits" in art:
        x = jnp.tanh(x @ art["pre_logits"]["kernel"]
                     + art["pre_logits"]["bias"])
    if "head" in art:
        x = _qmatmul(x, art["head"], not interpret, jnp.float32)
    return x


def random_vit_int4_artifact(cfg: ViTConfig, seed: int = 0,
                             pack_weights: bool = True):
    """Random serving artifact with realistic scales (bench/compile-check
    helper — avoids the slow on-device flax init of an 86M-param model)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    d = cfg.embed_dim
    hidden = int(d * cfg.mlp_ratio)

    def qlayer(k, n, with_bias=True):
        w = rng.integers(-7, 8, (k, n)).astype(np.int8)
        return QLayerArtifact(
            w=pack_int4(jnp.array(w), axis=0) if pack_weights
            else jnp.array(w),
            scale=jnp.float32(1e-3),
            bias=jnp.array(rng.standard_normal(n).astype(np.float32) * 1e-2)
            if with_bias else None,
            act={"d": jnp.float32(0.05), "q_m": jnp.float32(0.35),
                 "t": jnp.float32(1.0)},
            fmt="int4" if pack_weights else "int8", act_pow=False, top=7,
        )

    def ln(n):
        return {"scale": jnp.ones((n,), jnp.float32),
                "bias": jnp.zeros((n,), jnp.float32)}

    art = {
        "patch_embed": qlayer(cfg.patch_size**2 * cfg.in_channels, d),
        "cls_token": jnp.array(
            rng.standard_normal((1, 1, d)).astype(np.float32) * 0.02),
        "pos_embed": jnp.array(
            rng.standard_normal((1, cfg.num_tokens, d)).astype(np.float32) * 0.02),
        "blocks": [
            {
                "norm1": ln(d),
                "qkv": qlayer(d, 3 * d),
                "proj": qlayer(d, d),
                "norm2": ln(d),
                "fc1": qlayer(d, hidden),
                "fc2": qlayer(hidden, d),
            }
            for _ in range(cfg.depth)
        ],
        "norm": ln(d),
    }
    if cfg.num_classes > 0:
        art["head"] = qlayer(d, cfg.num_classes)
    return art
