"""Analytic cost model: MACs / BOPs / params / weight size / avg bit width.

Reference: the per-op formulas in only_train_once/operation/operator.py
(conv MACs :274-288, linear MACs :510-515, BOPs = MACs * w_bit * a_bit
:147-151) aggregated by graph.py:1409-1651 and surfaced through the OTO
facade (__init__.py:415-441). Here the walk is over the actual params
pytree, so pruned (resliced) models report their reduced cost directly —
the same numbers train.py:552-611 prints for full vs compressed.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.ultranet import ULTRANET_LAYERS
from ..models.vit import ViTConfig
from ..opt.groups import get_path, has_path

FLOAT_BITS = 32.0


def _leaf_sizes(tree, prefix="") -> Dict[str, int]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_leaf_sizes(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = int(np.prod(np.shape(tree)))
    return out


def _layer_bits(params, layer: str) -> Tuple[float, float]:
    """(w_bit, a_bit) from the layer's learned quant scalars, 32 if absent
    (operator.py:165-171 default)."""
    from ..quant.bitwidth import bit_width

    if not has_path(params, f"{layer}/d_quant_wt"):
        return FLOAT_BITS, FLOAT_BITS
    d = get_path(params, f"{layer}/d_quant_wt")
    q = get_path(params, f"{layer}/q_m_wt")
    t = (get_path(params, f"{layer}/t_quant_wt")
         if has_path(params, f"{layer}/t_quant_wt") else None)
    w_bit = float(bit_width(d, q, t)[0])
    if has_path(params, f"{layer}/d_quant_act"):
        da = get_path(params, f"{layer}/d_quant_act")
        qa = get_path(params, f"{layer}/q_m_act")
        ta = (get_path(params, f"{layer}/t_quant_act")
              if has_path(params, f"{layer}/t_quant_act") else None)
        a_bit = float(bit_width(da, qa, ta)[0])
    else:
        a_bit = FLOAT_BITS
    return w_bit, a_bit


def _accumulate(report: Dict[str, Any], layer: str, macs: float,
                w_bit: float, a_bit: float, weight_numel: int):
    report["per_layer"][layer] = {
        "macs": macs, "bops": macs * w_bit * a_bit,
        "w_bit": w_bit, "a_bit": a_bit, "params": weight_numel,
    }
    report["total_macs"] += macs
    report["total_bops"] += macs * w_bit * a_bit
    report["quantized_weight_bits"] += weight_numel * w_bit


def _finish(report, params):
    sizes = _leaf_sizes(params)
    quant_names = ("d_quant", "q_m_", "t_quant")
    num_params = sum(v for k, v in sizes.items()
                     if not any(q in k for q in quant_names))
    counted = sum(report["per_layer"][l]["params"] for l in report["per_layer"])
    # Params outside quantized layers (LN, biases, embeddings) count at 32b
    report["num_params"] = num_params
    report["weight_size_bits"] = (
        report["quantized_weight_bits"] + (num_params - counted) * FLOAT_BITS)
    report["average_bit_width"] = report["weight_size_bits"] / max(num_params, 1)
    del report["quantized_weight_bits"]
    return report


def vit_cost_report(cfg: ViTConfig, params) -> Dict[str, Any]:
    """Per-sample MACs/BOPs for a (possibly pruned) ViT params tree."""
    report = {"per_layer": {}, "total_macs": 0.0, "total_bops": 0.0,
              "quantized_weight_bits": 0.0}
    g = cfg.img_size // cfg.patch_size
    tokens = g * g + 1

    k = get_path(params, "patch_embed/proj/kernel")
    kh, kw, cin, cout = k.shape
    macs = g * g * kh * kw * cin * cout
    w_bit, a_bit = _layer_bits(params, "patch_embed/proj")
    _accumulate(report, "patch_embed/proj", macs, w_bit, a_bit,
                int(np.prod(k.shape)))

    for i in range(cfg.depth):
        for name in (f"blocks_{i}/attn/qkv", f"blocks_{i}/attn/proj",
                     f"blocks_{i}/mlp/fc1", f"blocks_{i}/mlp/fc2"):
            kk = get_path(params, f"{name}/kernel")
            fin, fout = kk.shape
            macs = tokens * fin * fout
            w_bit, a_bit = _layer_bits(params, name)
            _accumulate(report, name, macs, w_bit, a_bit,
                        int(np.prod(kk.shape)))
        # attention score + AV einsums (float, unquantized in the reference
        # — SURVEY.md §3.4; the serving path quantizes them separately)
        qkv_k = get_path(params, f"blocks_{i}/attn/qkv/kernel")
        total_qkv_out = qkv_k.shape[1]
        dim_per_comp = total_qkv_out // 3
        att_macs = 2.0 * tokens * tokens * dim_per_comp
        _accumulate(report, f"blocks_{i}/attn/einsum", att_macs,
                    FLOAT_BITS, FLOAT_BITS, 0)

    if has_path(params, "pre_logits"):
        kk = get_path(params, "pre_logits/kernel")
        _accumulate(report, "pre_logits", float(kk.shape[0] * kk.shape[1]),
                    *_layer_bits(params, "pre_logits"),
                    int(np.prod(kk.shape)))
    if has_path(params, "head"):
        kk = get_path(params, "head/kernel")
        _accumulate(report, "head", float(kk.shape[0] * kk.shape[1]),
                    *_layer_bits(params, "head"), int(np.prod(kk.shape)))
    return _finish(report, params)


def resnet_cost_report(cfg, params,
                       img_hw: Tuple[int, int] = (32, 32)) -> Dict[str, Any]:
    """Per-sample MACs/BOPs for a (possibly pruned) ResNet params tree
    (conv MAC formula: operator.py:274-288)."""
    report = {"per_layer": {}, "total_macs": 0.0, "total_bops": 0.0,
              "quantized_weight_bits": 0.0}
    h, w = img_hw

    def conv(name, h, w, stride=1):
        if not has_path(params, f"{name}/kernel"):
            return h, w
        k = get_path(params, f"{name}/kernel")
        kh, kw, cin, cout = k.shape
        ho, wo = h // stride, w // stride
        macs = ho * wo * kh * kw * cin * cout
        _accumulate(report, name, float(macs),
                    *_layer_bits(params, name), int(np.prod(k.shape)))
        return ho, wo

    h, w = conv("stem_conv", h, w)
    for s, n_blocks in enumerate(cfg.stage_sizes):
        for b in range(n_blocks):
            blk = f"stage{s}_block{b}"
            stride = 2 if (s > 0 and b == 0) else 1
            conv(f"{blk}/down_conv", h, w, stride)
            h2, w2 = conv(f"{blk}/conv1", h, w, stride)
            conv(f"{blk}/conv2", h2, w2, 1)
            h, w = h2, w2
    kk = get_path(params, "head/kernel")
    _accumulate(report, "head", float(kk.shape[0] * kk.shape[1]),
                *_layer_bits(params, "head"), int(np.prod(kk.shape)))
    return _finish(report, params)


def mobilenet_cost_report(cfg, params,
                          img_hw: Tuple[int, int] = (32, 32)
                          ) -> Dict[str, Any]:
    """Per-sample MACs/BOPs for a (possibly pruned) MobileNet params tree.
    Depthwise conv MACs = H·W·k²·C (group count = C, one input channel per
    filter — the conv MAC formula of operator.py:274-288 with groups)."""
    report = {"per_layer": {}, "total_macs": 0.0, "total_bops": 0.0,
              "quantized_weight_bits": 0.0}
    h, w = img_hw

    def conv(name, h, w, stride=1, depthwise=False):
        k = get_path(params, f"{name}/kernel")
        kh, kw, cin, cout = k.shape   # depthwise: cin == 1
        ho, wo = h // stride, w // stride
        macs = ho * wo * kh * kw * cin * cout
        _accumulate(report, name, float(macs),
                    *_layer_bits(params, name), int(np.prod(k.shape)))
        return ho, wo

    h, w = conv("stem_conv", h, w)
    for i, stride in enumerate(cfg.strides):
        h, w = conv(f"dw_{i}", h, w, stride, depthwise=True)
        conv(f"pw_{i}", h, w)
    kk = get_path(params, "head/kernel")
    _accumulate(report, "head", float(kk.shape[0] * kk.shape[1]),
                *_layer_bits(params, "head"), int(np.prod(kk.shape)))
    return _finish(report, params)


def ultranet_cost_report(params, img_hw: Tuple[int, int] = (160, 320),
                         w_bit: int = 4, a_bit: int = 4) -> Dict[str, Any]:
    """Per-sample MACs/BOPs for (possibly pruned) UltraNet.

    First layer input is 8-bit (ultranet_param_gen.py:15 `in_bit` table),
    later activations a_bit.
    """
    report = {"per_layer": {}, "total_macs": 0.0, "total_bops": 0.0,
              "quantized_weight_bits": 0.0}
    h, w = img_hw
    n = len(ULTRANET_LAYERS)
    for i in range(n + 1):
        k = get_path(params, f"conv_{i}/kernel")
        kh, kw, cin, cout = k.shape
        macs = h * w * kh * kw * cin * cout
        in_bits = 8 if i == 0 else a_bit
        _accumulate(report, f"conv_{i}", float(macs), float(w_bit),
                    float(in_bits), int(np.prod(k.shape)))
        if i < n and ULTRANET_LAYERS[i][2]:
            h, w = h // 2, w // 2
    return _finish(report, params)


def transformer_cost_report(cfg, params,
                            seq_len: Optional[int] = None) -> Dict[str, Any]:
    """Per-sample MACs/BOPs for a (possibly pruned) separate-q/k/v
    TransformerEncoder params tree (linear MAC formula operator.py:510-515;
    embeddings cost no MACs, matching EmbeddingOTO which defines none)."""
    report = {"per_layer": {}, "total_macs": 0.0, "total_bops": 0.0,
              "quantized_weight_bits": 0.0}
    tokens = seq_len if seq_len is not None else cfg.max_len

    for i in range(cfg.depth):
        names = [f"blocks_{i}/attn/{nm}" for nm in ("q", "k", "v")]
        names += [f"blocks_{i}/attn/proj", f"blocks_{i}/fc1",
                  f"blocks_{i}/fc2"]
        if has_path(params, f"blocks_{i}/gate"):
            names.append(f"blocks_{i}/gate")  # SwiGLU
        for name in names:
            kk = get_path(params, f"{name}/kernel")
            fin, fout = kk.shape
            macs = tokens * fin * fout
            w_bit, a_bit = _layer_bits(params, name)
            _accumulate(report, name, float(macs), w_bit, a_bit,
                        int(np.prod(kk.shape)))
        # score + AV einsums (float)
        q_out = get_path(params, f"blocks_{i}/attn/q/kernel").shape[1]
        att_macs = 2.0 * tokens * tokens * q_out
        _accumulate(report, f"blocks_{i}/attn/einsum", att_macs,
                    FLOAT_BITS, FLOAT_BITS, 0)

    if has_path(params, "head"):
        kk = get_path(params, "head/kernel")
        _accumulate(report, "head", float(kk.shape[0] * kk.shape[1]),
                    *_layer_bits(params, "head"), int(np.prod(kk.shape)))
    return _finish(report, params)


def autoencoder_cost_report(cfg, params,
                            img_hw: Tuple[int, int] = (32, 32)
                            ) -> Dict[str, Any]:
    """Per-sample MACs/BOPs for a (possibly pruned) ConvAutoencoder.

    Conv MACs use the output spatial size (operator.py:274-288); transposed
    convs apply the full kernel once per INPUT pixel
    (ConvTranspose2dOTO, operator.py:291-349), so their MACs use the input
    spatial size.
    """
    report = {"per_layer": {}, "total_macs": 0.0, "total_bops": 0.0,
              "quantized_weight_bits": 0.0}
    h, w = img_hw

    def layer(name, macs_hw):
        k = get_path(params, f"{name}/kernel")
        kh, kw, cin, cout = k.shape
        macs = macs_hw[0] * macs_hw[1] * kh * kw * cin * cout
        _accumulate(report, name, float(macs),
                    *_layer_bits(params, name), int(np.prod(k.shape)))

    for i in range(len(cfg.widths)):
        h, w = h // 2, w // 2
        layer(f"enc_{i}", (h, w))
    for i in range(len(cfg.decoder_widths)):
        layer(f"dec_{i}", (h, w))      # input spatial size
        h, w = h * 2, w * 2
    layer("out_conv", (h, w))
    return _finish(report, params)
