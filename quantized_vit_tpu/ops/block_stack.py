"""Whole-depth megakernel for batch-1 latency serving.

VERDICT r3 weak #5 / next-round #4: batch-1 measured 0.195-0.223 ms against
a ~0.053 ms weight-bandwidth floor — launch-bound (~38 kernel dispatches x
~3-4 us launch/DMA-setup). This kernel runs the ENTIRE transformer stack in
ONE pallas_call: grid=(depth,), each grid step processes one block whose
weights arrive as blocked operands (Pallas prefetches step i+1's weights
while step i computes — the per-kernel weight-stream ramp disappears along
with the launches). The residual row block (224 x D at batch 1) lives in a
VMEM scratch across steps; per step the kernel mirrors the fused pair
(ops/attention.py:_attn_block_kernel at j_imgs=1 + ops/fused.py:
_fused_mlp_kernel), so numerics are identical to the serving chain.

Packed int4 weights are unpacked INLINE per stripe (each weight is used
exactly once per step, so a persistent unpack scratch would be pure
overhead); int8 weights dot directly.

Constraints (routed around in serve/vit_int4.py): batch 1; uniform static
metadata across blocks (fmt, tops, pow flags — per-layer clip bounds must
be compile-time immediates, quant_layers.py-style per-layer d/t scalars
stay runtime via SMEM arrays indexed by the grid step); weights pre-stacked
once at artifact-prep time (`stack_blocks` — stacking inside jit would cost
a full-weight HBM copy per call).

The reference has no latency serving at all (RESULT_TEST.py batch eval);
this is the BASELINE.md "speed-of-light kernels" mandate applied to the
latency regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .attention import _n_keys, _score_one_head, _softmax_av
from .fused import (_gelu_f32, _gelu_quant_folded, _layernorm_f32,
                    _quantize_f32)


def _unpack4(p):
    """Inline nibble unpack: packed int8 ref values -> (lo, hi) int8."""
    p32 = p.astype(jnp.int32)
    return (((p32 << 28) >> 28).astype(jnp.int8),
            (p32 >> 4).astype(jnp.int8))


def _qdot(lv, w_vals, fmt: str, k_half: int):
    """lv [n, K] int8 x weight block [K(/2), cols]; int32 out."""
    dn = (((1,), (0,)), ((), ()))
    if fmt == "int4":
        lo, hi = _unpack4(w_vals)
        a = jax.lax.dot_general(lv[:, :k_half], lo, dimension_numbers=dn,
                                preferred_element_type=jnp.int32)
        return a + jax.lax.dot_general(lv[:, k_half:], hi,
                                       dimension_numbers=dn,
                                       preferred_element_type=jnp.int32)
    return jax.lax.dot_general(lv, w_vals, dimension_numbers=dn,
                               preferred_element_type=jnp.int32)


def _block_stack_kernel(
    x_ref, wq_ref, qs_ref, qb_ref, ln1g_ref, ln1b_ref, wp_ref, ps_ref,
    pb_ref, ln2g_ref, ln2b_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
    b2_ref, act_d, act_t, out_d, out_t, mlp_d, mlp_t, hid_d, hid_t,
    o_ref, xs_ref, qkv_ref, alv_ref, *,
    heads: int, head_dim: int, sm_scale: float, n_valid: int, fmt: str,
    act_pow: bool, out_pow: bool, mlp_pow: bool, hid_pow: bool,
    act_top: int, out_top: int, mlp_top: int, hid_top: int,
    ln_eps: float, depth: int, qkv_stripes: int, mlp_stripes: int,
    j_imgs: int = 1,
):
    i = pl.program_id(0)
    n, d_model = x_ref.shape  # n = j_imgs * n_img token rows
    n_img = n // j_imgs
    hdim = heads * head_dim
    three = 3 * hdim
    hid = s1_ref.shape[1]
    nk = _n_keys(n_img, n_valid, xs_ref.dtype.itemsize)
    d_half = d_model // 2
    h_half = hdim // 2
    hid_half = hid // 2

    @pl.when(i == 0)
    def _load_x():
        xs_ref[:] = x_ref[:]

    x = xs_ref[:]

    # ---- attention branch: LN1 -> quant -> qkv -> softmax -> alv -> proj
    xx = _layernorm_f32(x, ln1g_ref[:], ln1b_ref[:], ln_eps, k_real=d_model)
    lv = _quantize_f32(xx, act_d[i], act_t[i], act_top, act_pow,
                       folded=not act_pow)

    sub = three // qkv_stripes
    cols = [slice(s * sub, (s + 1) * sub) for s in range(qkv_stripes)]

    def qdot(c):
        return _qdot(lv, wq_ref[:, c], fmt, d_half)

    accs = {0: qdot(cols[0])}
    for s in range(qkv_stripes):
        if s + 1 < qkv_stripes:
            accs[s + 1] = qdot(cols[s + 1])
        y = accs.pop(s).astype(jnp.float32) * qs_ref[:, cols[s]]
        y = y + qb_ref[:, cols[s]]
        qkv_ref[:, cols[s]] = y.astype(qkv_ref.dtype)

    col = None
    if n_valid < nk:
        col = jax.lax.broadcasted_iota(jnp.int32, (n_img, nk), dimension=1)

    def qkv_h(j, h):
        r0 = j * n_img
        q = qkv_ref[r0:r0 + n_img, h * head_dim:(h + 1) * head_dim]
        k = qkv_ref[r0:r0 + nk, hdim + h * head_dim:
                    hdim + (h + 1) * head_dim]
        v = qkv_ref[r0:r0 + nk, 2 * hdim + h * head_dim:
                    2 * hdim + (h + 1) * head_dim]
        return q, k, v

    # software pipeline (as in _attn_qkv_kernel): task t+1's score matmul
    # (MXU) is issued before task t's softmax (VPU) so the units overlap;
    # tasks iterate (image, head) — small batches (2-4 images) just
    # lengthen the loop (VERDICT r4 #5)
    tasks = [(j, h) for j in range(j_imgs) for h in range(heads)]
    q0, k0, v0 = qkv_h(*tasks[0])
    s_next = _score_one_head(q0, k0, sm_scale, False)
    v_cur = v0
    for ti, (j, h) in enumerate(tasks):
        s2_, v_use = s_next, v_cur
        if ti + 1 < len(tasks):
            jn_, hn = tasks[ti + 1]
            q1, k1, v_cur = qkv_h(jn_, hn)
            s_next = _score_one_head(q1, k1, sm_scale, False)
        o_un, p_sum = _softmax_av(s2_, v_use, col, n_valid, False)
        rows = slice(j * n_img, (j + 1) * n_img)
        if not out_pow:
            lvh = jnp.clip(jnp.round(o_un * (1.0 / (p_sum * out_d[i]))),
                           -float(out_top), float(out_top))
            alv_ref[rows, h * head_dim:(h + 1) * head_dim] = lvh.astype(
                jnp.int8)
        else:
            alv_ref[rows, h * head_dim:(h + 1) * head_dim] = _quantize_f32(
                o_un / p_sum, out_d[i], out_t[i], out_top, out_pow)

    acc_p = _qdot(alv_ref[:], wp_ref[:], fmt, h_half)
    # cast to the residual-stream dtype BEFORE the MLP branch — the chain
    # writes the attention output to HBM in float_dtype, so the MLP's LN
    # input and its residual add see the rounded value (bit-parity)
    x2 = (acc_p.astype(jnp.float32) * ps_ref[:] + pb_ref[:]
          + x.astype(jnp.float32)).astype(xs_ref.dtype)

    # ---- MLP branch: LN2 -> quant -> fc1 -> GELU -> quant -> fc2 -> +x2
    xx2 = _layernorm_f32(x2, ln2g_ref[:], ln2b_ref[:],
                         ln_eps, k_real=d_model)
    lv2 = _quantize_f32(xx2, mlp_d[i], mlp_t[i], mlp_top, mlp_pow,
                        folded=not mlp_pow)

    msub = hid // mlp_stripes
    mcols = [slice(s * msub, (s + 1) * msub) for s in range(mlp_stripes)]
    dn = (((1,), (0,)), ((), ()))

    def dot1(c):
        return _qdot(lv2, w1_ref[:, c], fmt, d_half)

    def dot2(hlv_s, rows):
        if fmt == "int4":
            # w2 packing pairs hidden rows (h, h + hid/2): stripes are
            # sized to lie entirely within one nibble plane
            if rows.stop <= hid_half:
                lo, _ = _unpack4(w2_ref[rows, :])
                return jax.lax.dot_general(
                    hlv_s, lo, dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
            hi_rows = slice(rows.start - hid_half, rows.stop - hid_half)
            _, hi = _unpack4(w2_ref[hi_rows, :])
            return jax.lax.dot_general(
                hlv_s, hi, dimension_numbers=dn,
                preferred_element_type=jnp.int32)
        return jax.lax.dot_general(hlv_s, w2_ref[rows, :],
                                   dimension_numbers=dn,
                                   preferred_element_type=jnp.int32)

    m_acc1 = {0: dot1(mcols[0])}
    acc2 = None
    for s in range(mlp_stripes):
        if s + 1 < mlp_stripes:
            m_acc1[s + 1] = dot1(mcols[s + 1])
        y = (m_acc1.pop(s).astype(jnp.float32) * s1_ref[:, mcols[s]]
             + b1_ref[:, mcols[s]])
        if not hid_pow:
            hlv = _gelu_quant_folded(y, hid_d[i], hid_top)
        else:
            hlv = _quantize_f32(_gelu_f32(y), hid_d[i], hid_t[i], hid_top,
                                hid_pow)
        c2 = dot2(hlv, mcols[s])
        acc2 = c2 if acc2 is None else acc2 + c2

    out = (acc2.astype(jnp.float32) * s2_ref[:] + b2_ref[:]
           + x2.astype(jnp.float32))
    new_x = out.astype(xs_ref.dtype)
    xs_ref[:] = new_x
    o_ref[:] = new_x


def vit_block_stack(*args, **kw):
    """Public entry; clip tops must be positive static ints."""
    for k in ("act_top", "out_top", "mlp_top", "hid_top"):
        v = kw.get(k)
        if v is not None and not isinstance(v, int):
            kw[k] = int(v)
        if not (kw.get(k) or 0) >= 1:
            raise ValueError(f"vit_block_stack: positive {k} required")
    return _vit_block_stack(*args, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "sm_scale", "n_valid", "fmt", "act_pow",
                     "out_pow", "mlp_pow", "hid_pow", "act_top", "out_top",
                     "mlp_top", "hid_top", "ln_eps", "out_dtype",
                     "qkv_stripes", "mlp_stripes", "j_imgs", "interpret"),
)
def _vit_block_stack(
    x: jax.Array,
    wq, qs, qb, ln1_g, ln1_b,
    wp, ps, pb, ln2_g, ln2_b,
    w1, s1, b1, w2, s2, b2,
    act_d, act_t, out_d, out_t, mlp_d, mlp_t, hid_d, hid_t,
    *,
    heads: int, sm_scale: float, n_valid: int | None = None,
    fmt: str = "int4",
    act_pow: bool = False, out_pow: bool = False,
    mlp_pow: bool = False, hid_pow: bool = False,
    act_top: int = 127, out_top: int = 127,
    mlp_top: int = 127, hid_top: int = 127,
    ln_eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    qkv_stripes: int | None = None,
    mlp_stripes: int | None = None,
    j_imgs: int = 1,
    interpret: bool = False,
) -> jax.Array:
    """One pallas_call over the whole block stack (module docstring).

    x: [j_imgs * n_img, D] token rows (padded; j_imgs=1 is the batch-1
    latency case, 2-4 serve the continuous batcher's small flushes —
    VERDICT r4 #5). Stacked per-block operands
    (leading axis = depth): wq [L, D(/2), 3*H*hd], qs/qb [L, 1, 3*H*hd],
    ln* [L, 1, D], wp [L, H*hd(/2), D], ps/pb/s2/b2 [L, 1, D],
    w1 [L, D(/2), hid], s1/b1 [L, 1, hid], w2 [L, hid(/2), D]. Per-layer
    quantizer scalars act_d..hid_t: [L] f32 (SMEM, indexed by grid step).
    LN1 gamma/beta must be pre-folded with 1/act_d when act_pow is False,
    LN2 with 1/mlp_d when mlp_pow is False, and s1/b1 with 2^-0.5 when
    hid_pow is False — exactly the folds the per-block kernels' wrappers
    apply (stack_blocks in serve/vit_int4.py does this).

    Returns [n, D] (out_dtype) — the residual stream after the last block.
    """
    n, d_model = x.shape
    depth = wq.shape[0]
    three = qs.shape[2]
    hid = s1.shape[2]
    head_dim = three // (3 * heads)
    hdim = heads * head_dim
    if n_valid is None:
        n_valid = n
    # VMEM feasibility: one block's weights double-buffered + scratches.
    # ViT-B int4 is ~10.5 MB; int8 doubles the weight stream and measured
    # OOM at 17.2 MB — packed int4 IS the latency format (half the HBM
    # weight read on a bandwidth-critical path), so that is no loss.
    wf = 0.5 if fmt == "int4" else 1.0
    w_blk = int((d_model * three + hdim * d_model
                 + d_model * hid + hid * d_model) * wf)
    est = (2 * w_blk + n * d_model * 2 * jnp.dtype(out_dtype).itemsize
           + n * three * jnp.dtype(out_dtype).itemsize + n * hdim
           + n * d_model * 4)
    if est > 15 * 2**20:
        raise ValueError(
            f"block-stack megakernel needs ~{est / 2**20:.1f} MB VMEM at "
            f"these dims (fmt={fmt}); use packed int4 weights "
            "(export pack_weights=True) or the per-block chain path")
    qkv_stripes = qkv_stripes or (3 if three % (3 * 128) == 0 else 1)
    if three % qkv_stripes:
        raise ValueError(f"qkv_stripes={qkv_stripes} !| {three}")
    # int4 w2 stripes must each lie within one nibble plane: an EVEN
    # stripe count puts the plane edge (hid/2) exactly on a stripe edge
    mlp_stripes = mlp_stripes or (4 if hid % 4 == 0
                                  else (2 if hid % 2 == 0 else 1))
    if hid % mlp_stripes or (fmt == "int4" and (mlp_stripes % 2
                                                or hid % 2)):
        raise ValueError(f"bad mlp_stripes={mlp_stripes} for hid={hid} "
                         f"fmt={fmt}")

    x = x.astype(out_dtype)

    def wblk(a, r, c):
        return pl.BlockSpec((1, r, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)

    in_specs = [
        full((n, d_model)),
        wblk(wq, wq.shape[1], three),
        wblk(qs, 1, three), wblk(qb, 1, three),
        wblk(ln1_g, 1, d_model), wblk(ln1_b, 1, d_model),
        wblk(wp, wp.shape[1], d_model),
        wblk(ps, 1, d_model), wblk(pb, 1, d_model),
        wblk(ln2_g, 1, d_model), wblk(ln2_b, 1, d_model),
        wblk(w1, w1.shape[1], hid),
        wblk(s1, 1, hid), wblk(b1, 1, hid),
        wblk(w2, w2.shape[1], d_model),
        wblk(s2, 1, d_model), wblk(b2, 1, d_model),
    ] + [smem()] * 8
    operands = [x, wq, qs, qb, ln1_g, ln1_b, wp, ps, pb, ln2_g, ln2_b,
                w1, s1, b1, w2, s2, b2,
                jnp.asarray(act_d, jnp.float32).reshape(depth),
                jnp.asarray(act_t, jnp.float32).reshape(depth),
                jnp.asarray(out_d, jnp.float32).reshape(depth),
                jnp.asarray(out_t, jnp.float32).reshape(depth),
                jnp.asarray(mlp_d, jnp.float32).reshape(depth),
                jnp.asarray(mlp_t, jnp.float32).reshape(depth),
                jnp.asarray(hid_d, jnp.float32).reshape(depth),
                jnp.asarray(hid_t, jnp.float32).reshape(depth)]

    def squeeze_kernel(x_ref, *rest, **kkw):
        # blocked weight refs arrive with the leading length-1 depth axis;
        # present 2-D sub-refs to the kernel body
        sq = [r.at[0] for r in rest[:16]]
        _block_stack_kernel(x_ref, *sq, *rest[16:], **kkw)

    w_bytes_blk = (wq.shape[1] * three + wp.shape[1] * d_model
                   + w1.shape[1] * hid + w2.shape[1] * d_model)
    return pl.pallas_call(
        functools.partial(
            squeeze_kernel, heads=heads, head_dim=head_dim,
            sm_scale=sm_scale, n_valid=n_valid, fmt=fmt,
            act_pow=act_pow, out_pow=out_pow, mlp_pow=mlp_pow,
            hid_pow=hid_pow, act_top=act_top, out_top=out_top,
            mlp_top=mlp_top, hid_top=hid_top, ln_eps=ln_eps, depth=depth,
            qkv_stripes=qkv_stripes, mlp_stripes=mlp_stripes,
            j_imgs=j_imgs),
        grid=(depth,),
        in_specs=in_specs,
        out_specs=full((n, d_model)),
        out_shape=jax.ShapeDtypeStruct((n, d_model), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((n, d_model), jnp.dtype(out_dtype)),
            pltpu.VMEM((n, three), jnp.dtype(out_dtype)),
            pltpu.VMEM((n, hdim), jnp.int8),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * depth * n * (d_model * three + hdim * d_model
                                   + 2 * d_model * hid)
            + 2 * depth * heads * n * n * head_dim * 2,
            bytes_accessed=depth * w_bytes_blk
            + n * d_model * 2 * jnp.dtype(out_dtype).itemsize,
            transcendentals=depth * (heads * n * n + n * hid),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*operands)
