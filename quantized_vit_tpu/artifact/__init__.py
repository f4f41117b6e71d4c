"""Artifact pipeline: the TPU replacement for the reference's FPGA export.

The reference's deployment path (`4-bit quantization/torch_export.py` →
`qnn_param_reader.py` → `qnn_mem_process.py` → `ultranet_param_gen.py`)
packs 4-bit weights into PE×SIMD-tiled C++ HLS headers. Here the deployment
target is a TPU: artifacts are npz arrays + a JSON manifest, weights ship as
packed-int4 lanes consumed directly by the Pallas kernels, and the loader
reapplies `NamedSharding` from the partition-rule table when given a mesh
(the GSPMD analogue of the PE×SIMD tiling).
"""

from .io import save_artifact_tree, load_artifact_tree
from .ultranet import (
    UltraNetExportConfig,
    generate_ultranet_config,
    export_ultranet_int,
    save_ultranet_artifact,
    load_ultranet_artifact,
)
from .hls import (
    export_ultranet_hls,
    inc_bias_tiles,
    int_bit_width,
    pack_words,
    tile_pe,
)
from .vit import save_vit_int4_artifact, load_vit_int4_artifact
from .native import (
    native_available,
    pack_int4_host,
    unpack_int4_host,
    quantize_levels_host,
)

__all__ = [
    "native_available",
    "pack_int4_host",
    "unpack_int4_host",
    "quantize_levels_host",
    "save_artifact_tree",
    "load_artifact_tree",
    "UltraNetExportConfig",
    "generate_ultranet_config",
    "export_ultranet_int",
    "save_ultranet_artifact",
    "load_ultranet_artifact",
    "save_vit_int4_artifact",
    "load_vit_int4_artifact",
    "export_ultranet_hls",
    "pack_words",
    "tile_pe",
    "inc_bias_tiles",
    "int_bit_width",
]
