"""Subnet materialization: slice a group-sparse params pytree into a dense
compressed network with new static shapes.

Reference: only_train_once/subnet_construction/pruning_compression.py:4-391.
The torch version mutates modules in place with index_select and needs the
ViT special cases hard-coded (proj in-dim sync with pruned qkv heads :64-131,
fc2<-fc1 hidden link :227-241, head-idx -> dim-idx expansion :296-316). Here
the same links are declarative: each model's compressor knows its in-dim
edges and emits (new config, new params) — no pickled-module export needed
(predict.py:43); the sliced pytree + config is the artifact.

Redundant groups are found by zero-row-norm scan in group space
(graph.py:1272-1278 -> node_group.py:178-278), identical to the reference's
`set_pruning_redundant_idxes`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..models.ultranet import ULTRANET_LAYERS
from ..models.vit import ViTConfig
from ..opt.groups import (
    NodeGroup,
    Transform,
    get_path,
    group_sq_norms,
    has_path,
    kept_indices_for_axis,
    set_path,
)


def kept_groups(group: NodeGroup, params,
                tol: float = 0.0) -> np.ndarray:
    """Indices of non-zero (kept) groups by L2-norm scan
    (node_group.py:178-278: zero norm => redundant)."""
    norms = np.asarray(jnp.sqrt(group_sq_norms(group, params)))
    return np.nonzero(norms > tol)[0]


def _kept_nonempty(group: NodeGroup, params) -> np.ndarray:
    """kept_groups, but never empty: a block whose groups ALL went to zero
    keeps one (all-zero) group so the compressed architecture stays
    well-formed — the zero rows contribute nothing, so forward equivalence
    is preserved."""
    kept = kept_groups(group, params)
    return kept if len(kept) else np.arange(1)


def _take(arr, idx: np.ndarray, axis: int):
    return jnp.take(jnp.asarray(arr), jnp.asarray(idx), axis=axis)


def _slice_layer_out(params, layer: str, idx: np.ndarray):
    """Slice a Dense/Conv layer's out-dim (kernel last axis + bias)."""
    params = set_path(params, f"{layer}/kernel",
                      _take(get_path(params, f"{layer}/kernel"), idx, -1))
    if has_path(params, f"{layer}/bias"):
        params = set_path(params, f"{layer}/bias",
                          _take(get_path(params, f"{layer}/bias"), idx, 0))
    return params


def _slice_layer_in(params, layer: str, idx: np.ndarray, axis: int = 0):
    """Slice a layer's in-dim (kernel first axis for Dense, axis 2 for
    conv HWIO)."""
    k = get_path(params, f"{layer}/kernel")
    ax = axis if k.ndim == 2 else 2
    return set_path(params, f"{layer}/kernel", _take(k, idx, ax))


# ---------------------------------------------------------------------------
# ViT
# ---------------------------------------------------------------------------


def construct_subnet_vit(
    cfg: ViTConfig,
    params,
    groups: Sequence[NodeGroup],
) -> Tuple[ViTConfig, Any]:
    """Physically slice a group-sparse ViT into a dense sub-network.

    Per block: qkv out rows follow kept heads (QKV_HEADS expansion), proj
    in-dim follows the same heads (the reference's V-slice link,
    pruning_compression.py:243-291); fc1 out rows follow kept hidden units,
    fc2 in-dim follows (fc2<-fc1 link, :227-241). The residual stream and
    head are unprunable so their dims are untouched.
    """
    by_id = {g.id: g for g in groups}
    heads_pb: List[int] = []
    hidden_pb: List[int] = []
    # head_dim is invariant under compression; per-block head counts come
    # from the PARAM SHAPES so already-compressed models re-compress
    head_dim = cfg.embed_dim // cfg.num_heads

    for i in range(cfg.depth):
        attn_g = by_id.get(f"blocks_{i}/attn")
        qkv = f"blocks_{i}/attn/qkv"
        out_dim = get_path(params, f"{qkv}/kernel").shape[-1]
        heads_i = out_dim // (3 * head_dim)
        if attn_g is not None and attn_g.is_prunable:
            kept_h = _kept_nonempty(attn_g, params)
        else:
            kept_h = np.arange(heads_i)
        heads_pb.append(len(kept_h))
        out_idx = kept_indices_for_axis(kept_h, Transform.QKV_HEADS,
                                        out_dim, heads_i)
        params = _slice_layer_out(params, qkv, out_idx)
        # proj in-dim <- kept heads (V component rows)
        in_dim = get_path(params, f"blocks_{i}/attn/proj/kernel").shape[0]
        in_idx = kept_indices_for_axis(kept_h, Transform.HEADS, in_dim,
                                       heads_i)
        params = _slice_layer_in(params, f"blocks_{i}/attn/proj", in_idx)

        mlp_g = by_id.get(f"blocks_{i}/mlp")
        if mlp_g is not None and mlp_g.is_prunable:
            kept_m = _kept_nonempty(mlp_g, params)
        else:
            kept_m = np.arange(int(cfg.embed_dim * cfg.mlp_ratio))
        hidden_pb.append(len(kept_m))
        params = _slice_layer_out(params, f"blocks_{i}/mlp/fc1", kept_m)
        params = _slice_layer_in(params, f"blocks_{i}/mlp/fc2", kept_m)

    new_cfg = dataclasses.replace(
        cfg,
        heads_per_block=tuple(heads_pb),
        hidden_per_block=tuple(hidden_pb),
    )
    return new_cfg, params


# ---------------------------------------------------------------------------
# ResNet (residual CNN)
# ---------------------------------------------------------------------------


def _slice_bn(tree, bn: str, idx: np.ndarray):
    for nm in ("scale", "bias", "mean", "var"):
        if tree is not None and has_path(tree, f"{bn}/{nm}"):
            tree = set_path(tree, f"{bn}/{nm}",
                            _take(get_path(tree, f"{bn}/{nm}"), idx, 0))
    return tree


def construct_subnet_resnet(
    cfg,
    params,
    groups: Sequence[NodeGroup],
    batch_stats: Optional[Any] = None,
):
    """Slice a group-sparse ResNet into a dense subnet.

    In-dim links (the declarative version of pruning_compression.py's
    pass-2 DFS): conv2.in <- block's conv1 group; conv1.in/down_conv.in of
    a stage's first block <- previous stage's stream (or stage-0's own
    stream, which contains the stem); conv1.in of later blocks <- own
    stream; head.in <- last stream. BN running stats (batch_stats
    collection) slice with their conv's out-dim.
    """
    by_id = {g.id: g for g in groups}

    def kept(gid, full):
        g = by_id.get(gid)
        if g is not None and g.is_prunable:
            return _kept_nonempty(g, params)
        return np.arange(full)

    stream_kept = [kept(f"stream_{s}", w) for s, w in enumerate(cfg.widths)]
    new_widths = tuple(len(k) for k in stream_kept)
    inner: List[List[int]] = []

    # stem: out <- stream_0
    params = _slice_layer_out(params, "stem_conv", stream_kept[0])
    params = _slice_bn(params, "stem_bn", stream_kept[0])
    batch_stats = _slice_bn(batch_stats, "stem_bn", stream_kept[0])

    for s, n_blocks in enumerate(cfg.stage_sizes):
        inner.append([])
        in_stream = stream_kept[s - 1] if s > 0 else stream_kept[0]
        for b in range(n_blocks):
            blk = f"stage{s}_block{b}"
            blk_in = in_stream if b == 0 else stream_kept[s]
            kept_inner = kept(blk, cfg.block_inner(s, b))
            inner[-1].append(len(kept_inner))
            params = _slice_layer_in(params, f"{blk}/conv1", blk_in)
            params = _slice_layer_out(params, f"{blk}/conv1", kept_inner)
            params = _slice_bn(params, f"{blk}/bn1", kept_inner)
            batch_stats = _slice_bn(batch_stats, f"{blk}/bn1", kept_inner)
            params = _slice_layer_in(params, f"{blk}/conv2", kept_inner)
            params = _slice_layer_out(params, f"{blk}/conv2", stream_kept[s])
            params = _slice_bn(params, f"{blk}/bn2", stream_kept[s])
            batch_stats = _slice_bn(batch_stats, f"{blk}/bn2", stream_kept[s])
            if has_path(params, f"{blk}/down_conv/kernel"):
                params = _slice_layer_in(params, f"{blk}/down_conv", blk_in)
                params = _slice_layer_out(params, f"{blk}/down_conv",
                                          stream_kept[s])
                params = _slice_bn(params, f"{blk}/down_bn", stream_kept[s])
                batch_stats = _slice_bn(batch_stats, f"{blk}/down_bn",
                                        stream_kept[s])

    params = _slice_layer_in(params, "head", stream_kept[-1])

    new_cfg = dataclasses.replace(
        cfg,
        widths=new_widths,
        stem_width=new_widths[0],
        inner_widths=tuple(tuple(x) for x in inner),
    )
    return new_cfg, params, batch_stats


def construct_subnet_mobilenet(
    cfg,
    params,
    groups: Sequence[NodeGroup],
    batch_stats: Optional[Any] = None,
):
    """Slice a group-sparse MobileNet into a dense subnet.

    Depthwise-merge semantics (pruning_dependency.py:203-238): slicing
    group i's channels cuts the producing conv's out-dim + BN, the next
    depthwise kernel's CHANNEL axis (last axis of [k, k, 1, C]) + its BN,
    and the next pointwise kernel's in-dim. head.in <- last pw group.
    """
    by_id = {g.id: g for g in groups}

    def kept(gid, full):
        g = by_id.get(gid)
        if g is not None and g.is_prunable:
            return _kept_nonempty(g, params)
        return np.arange(full)

    def slice_channel_group(producer, bn, dw_idx, idx):
        nonlocal params, batch_stats
        params = _slice_layer_out(params, producer, idx)
        params = _slice_bn(params, bn, idx)
        batch_stats = _slice_bn(batch_stats, bn, idx)
        if dw_idx is not None:
            # depthwise kernel channel axis is the out axis
            params = _slice_layer_out(params, f"dw_{dw_idx}", idx)
            params = _slice_bn(params, f"dw_bn_{dw_idx}", idx)
            batch_stats = _slice_bn(batch_stats, f"dw_bn_{dw_idx}", idx)

    n = len(cfg.widths)
    stem_kept = kept("stem", cfg.stem_width)
    slice_channel_group("stem_conv", "stem_bn", 0, stem_kept)
    params = _slice_layer_in(params, "pw_0", stem_kept)

    pw_kept = []
    for i in range(n):
        idx = kept(f"pw_{i}", cfg.widths[i])
        pw_kept.append(idx)
        nxt = i + 1 if i + 1 < n else None
        slice_channel_group(f"pw_{i}", f"pw_bn_{i}", nxt, idx)
        if nxt is not None:
            params = _slice_layer_in(params, f"pw_{nxt}", idx)
    params = _slice_layer_in(params, "head", pw_kept[-1])

    new_cfg = dataclasses.replace(
        cfg,
        stem_width=len(stem_kept),
        widths=tuple(len(k) for k in pw_kept),
    )
    return new_cfg, params, batch_stats


# ---------------------------------------------------------------------------
# UltraNet
# ---------------------------------------------------------------------------


def construct_subnet_ultranet(
    params,
    groups: Sequence[NodeGroup],
    batch_stats: Optional[Any] = None,
) -> Tuple[Tuple[int, ...], Any, Optional[Any]]:
    """Slice UltraNet conv channels: conv_i out + bn_i (scale/bias + running
    stats) + conv_{i+1} in-dim. Returns (channels tuple, params,
    batch_stats)."""
    by_id = {g.id: g for g in groups}
    n = len(ULTRANET_LAYERS)
    channels: List[int] = []
    prev_idx: Optional[np.ndarray] = None
    for i in range(n + 1):
        if prev_idx is not None:
            params = _slice_layer_in(params, f"conv_{i}", prev_idx)
        if i == n:
            break
        g = by_id.get(f"conv_{i}")
        feat = get_path(params, f"conv_{i}/kernel").shape[-1]
        if g is not None and g.is_prunable:
            idx = _kept_nonempty(g, params)
        else:
            idx = np.arange(feat)
        channels.append(len(idx))
        params = _slice_layer_out(params, f"conv_{i}", idx)
        for nm in ("scale", "bias"):
            if has_path(params, f"bn_{i}/{nm}"):
                params = set_path(params, f"bn_{i}/{nm}",
                                  _take(get_path(params, f"bn_{i}/{nm}"),
                                        idx, 0))
        if batch_stats is not None:
            for nm in ("mean", "var"):
                if has_path(batch_stats, f"bn_{i}/{nm}"):
                    batch_stats = set_path(
                        batch_stats, f"bn_{i}/{nm}",
                        _take(get_path(batch_stats, f"bn_{i}/{nm}"), idx, 0))
        prev_idx = idx
    return tuple(channels), params, batch_stats


# ---------------------------------------------------------------------------
# Separate-q/k/v Transformer encoder
# ---------------------------------------------------------------------------


def construct_subnet_transformer(
    cfg,
    params,
    groups: Sequence[NodeGroup],
):
    """Physically slice a group-sparse TransformerEncoder (separate q/k/v).

    Per block: q, k, v out rows all follow the SAME kept heads (HEADS
    expansion — the reference's BaseMultiHeadAttentionOTO head-idx -> dim-idx
    expansion, operator.py:920-950), proj's in-dim follows those heads, and
    fc2's in-dim follows fc1's kept hidden units (the fc2<-fc1 link,
    pruning_compression.py:227-241). Under grouped-query attention the
    prunable unit is the KV head: q and proj expand each kept kv group to
    its q_per_kv*head_dim run, k/v to head_dim. Returns (new config, new
    params) — ``heads_per_block`` stays in QUERY heads.
    """
    by_id = {g.id: g for g in groups}
    heads_pb: List[int] = []
    hidden_pb: List[int] = []
    kv0 = cfg.kv_heads if hasattr(cfg, "kv_heads") else cfg.num_heads
    g_ratio = cfg.num_heads // kv0
    # head_dim is invariant; per-block kv counts come from the PARAM
    # SHAPES so already-compressed models re-compress correctly
    head_dim = cfg.embed_dim // cfg.num_heads

    for i in range(cfg.depth):
        attn_g = by_id.get(f"blocks_{i}/attn")
        kv_i = get_path(
            params, f"blocks_{i}/attn/k/kernel").shape[-1] // head_dim
        if attn_g is not None and attn_g.is_prunable:
            kept_h = _kept_nonempty(attn_g, params)  # kv-head indices
        else:
            kept_h = np.arange(kv_i)
        heads_pb.append(len(kept_h) * g_ratio)
        for nm in ("q", "k", "v"):
            layer = f"blocks_{i}/attn/{nm}"
            out_dim = get_path(params, f"{layer}/kernel").shape[-1]
            out_idx = kept_indices_for_axis(kept_h, Transform.HEADS,
                                            out_dim, kv_i)
            params = _slice_layer_out(params, layer, out_idx)
        in_dim = get_path(params, f"blocks_{i}/attn/proj/kernel").shape[0]
        in_idx = kept_indices_for_axis(kept_h, Transform.HEADS, in_dim,
                                       kv_i)
        params = _slice_layer_in(params, f"blocks_{i}/attn/proj", in_idx)

        mlp_g = by_id.get(f"blocks_{i}/mlp")
        if mlp_g is not None and mlp_g.is_prunable:
            kept_m = _kept_nonempty(mlp_g, params)
        else:
            kept_m = np.arange(int(cfg.embed_dim * cfg.mlp_ratio))
        hidden_pb.append(len(kept_m))
        params = _slice_layer_out(params, f"blocks_{i}/fc1", kept_m)
        if has_path(params, f"blocks_{i}/gate/kernel"):
            # SwiGLU: gate rows live and die with fc1 (up) rows
            params = _slice_layer_out(params, f"blocks_{i}/gate", kept_m)
        params = _slice_layer_in(params, f"blocks_{i}/fc2", kept_m)

    new_cfg = dataclasses.replace(
        cfg,
        heads_per_block=tuple(heads_pb),
        hidden_per_block=tuple(hidden_pb),
    )
    return new_cfg, params


# ---------------------------------------------------------------------------
# Conv autoencoder (ConvTranspose + GroupNorm spread)
# ---------------------------------------------------------------------------


def construct_subnet_autoencoder(
    cfg,
    params,
    groups: Sequence[NodeGroup],
):
    """Physically slice a group-sparse ConvAutoencoder.

    Channels drop in whole GroupNorm groups (the SPREAD expansion,
    pruning_dependency.py:426-538): kept group indices expand to contiguous
    channel runs via ``kept_indices_for_axis(..., num_groups=G)``. Each
    layer's in-dim follows the previous layer in the encoder->decoder chain;
    the 1x1 output conv (unprunable) only has its in-dim sliced. The
    compressed config carries the surviving per-stage norm-group counts so
    GroupNorm statistics stay bit-identical. Returns (new config, params).
    """
    by_id = {g.id: g for g in groups}

    enc_widths: List[int] = []
    dec_widths: List[int] = []
    enc_groups: List[int] = []
    dec_groups: List[int] = []
    prev_idx: Optional[np.ndarray] = None

    def process(layer: str, gn: str, norm_groups: int, p, prev_idx):
        g = by_id.get(layer)
        width = get_path(p, f"{layer}/kernel").shape[-1]
        if g is not None and g.is_prunable:
            kg = _kept_nonempty(g, p)
        else:
            kg = np.arange(norm_groups)
        idx = kept_indices_for_axis(kg, Transform.OUT, width,
                                    num_groups=norm_groups)
        if prev_idx is not None:
            p = _slice_layer_in(p, layer, prev_idx)
        p = _slice_layer_out(p, layer, idx)
        for nm in ("scale", "bias"):
            if has_path(p, f"{gn}/{nm}"):
                p = set_path(p, f"{gn}/{nm}",
                             _take(get_path(p, f"{gn}/{nm}"), idx, 0))
        return p, idx, len(kg)

    skip = bool(getattr(cfg, "skip_concat", False))
    enc_idx: List[np.ndarray] = []
    for i in range(len(cfg.widths)):
        params, prev_idx, n_kept = process(
            f"enc_{i}", f"enc_gn_{i}", cfg.enc_groups(i), params, prev_idx)
        enc_widths.append(len(prev_idx))
        enc_groups.append(n_kept)
        enc_idx.append(prev_idx)
    n_enc = len(cfg.widths)
    for i in range(len(cfg.decoder_widths)):
        params, prev_idx, n_kept = process(
            f"dec_{i}", f"dec_gn_{i}", cfg.dec_groups(i), params, prev_idx)
        dec_widths.append(len(prev_idx))
        dec_groups.append(n_kept)
        mirror = n_enc - 2 - i
        if skip and mirror >= 0:
            # concat-fed in-dim: [kept(dec_i), offset + kept(enc_mirror)]
            # — the reference's auxiliary-group offset bookkeeping
            # (node_group.py:241-254). The offset is THIS decoder stage's
            # original (pre-slice) width, the concat segment boundary.
            offset = cfg.decoder_widths[i]
            prev_idx = np.concatenate([prev_idx, offset + enc_idx[mirror]])
    params = _slice_layer_in(params, "out_conv", prev_idx)

    new_cfg = dataclasses.replace(
        cfg,
        widths=tuple(enc_widths),
        dec_widths=tuple(dec_widths),
        enc_norm_groups=tuple(enc_groups),
        dec_norm_groups=tuple(dec_groups),
    )
    return new_cfg, params
