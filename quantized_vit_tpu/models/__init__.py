"""Model zoo: quantized flax layers, ViT family, UltraNet, ResNet."""

from .layers import (
    QuantConfig,
    QuantDense,
    QuantConv,
    init_quant_params_tree,
    collect_quant_params,
    bitwidth_dict,
    QUANT_PARAM_NAMES,
)
from .vit import (
    ViTConfig,
    VisionTransformer,
    vit_base_patch16_224,
    vit_base_patch16_224_in21k,
    vit_base_patch32_224,
    vit_base_patch32_224_in21k,
    vit_large_patch16_224,
    vit_large_patch16_224_in21k,
    vit_large_patch32_224_in21k,
    vit_huge_patch14_224_in21k,
)
from .ultranet import (
    UltraNet,
    UltraNetInt,
    DoReFaConv,
    yolo_decode,
    ULTRANET_LAYERS,
    ULTRANET_ANCHORS,
)
from .resnet import (
    ResNet,
    ResNetConfig,
    resnet8,
    resnet20,
)
from .transformer import (
    SeparateQKVAttention,
    TransformerConfig,
    TransformerEncoder,
    transformer_encoder_base,
    transformer_encoder_tiny,
)
from .lora import (
    LoraDense,
    lora_grad_mask,
    merge_lora,
)

__all__ = [
    "QuantConfig",
    "QuantDense",
    "QuantConv",
    "init_quant_params_tree",
    "collect_quant_params",
    "bitwidth_dict",
    "QUANT_PARAM_NAMES",
    "ViTConfig",
    "VisionTransformer",
    "vit_base_patch16_224",
    "vit_base_patch16_224_in21k",
    "vit_base_patch32_224",
    "vit_base_patch32_224_in21k",
    "vit_large_patch16_224",
    "vit_large_patch16_224_in21k",
    "vit_large_patch32_224_in21k",
    "vit_huge_patch14_224_in21k",
    "UltraNet",
    "UltraNetInt",
    "DoReFaConv",
    "yolo_decode",
    "ULTRANET_LAYERS",
    "ULTRANET_ANCHORS",
    "ResNet",
    "ResNetConfig",
    "resnet8",
    "resnet20",
    "TransformerConfig",
    "TransformerEncoder",
    "SeparateQKVAttention",
    "transformer_encoder_tiny",
    "transformer_encoder_base",
    "LoraDense",
    "lora_grad_mask",
    "merge_lora",
]
