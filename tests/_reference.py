"""Load single-file modules from the read-only reference repo for parity tests.

The reference (/root/reference, PyTorch) is the behavioral oracle: tests
quantize the same tensors through both implementations and assert numerical
parity. Loading is by file path with a synthetic module name so we never
import the reference as a package (and never execute its drivers). All tests
using this helper are skipped when the reference isn't mounted.
"""

import importlib.util
import os
import sys

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def load_reference_module(rel_path: str, name: str):
    """Load e.g. 'QViT_with_GETA/only_train_once/quantization/quant_layers.py'."""
    path = os.path.join(REFERENCE_ROOT, rel_path)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
