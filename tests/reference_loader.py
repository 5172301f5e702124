"""Load reference modules standalone for numerical parity testing.

The reference (torch, CPU) is the parity oracle: BASELINE.json requires
rendered RGB and pixel gradients allclose to it at fixed inputs.  We import
individual files directly (bypassing the package __init__, which pulls in
tensorboard/distributed) and call them on CPU tensors.
"""

import importlib.util
import sys
from pathlib import Path

_REF = Path("/root/reference")


def load_reference_module(name: str, relpath: str):
    spec = importlib.util.spec_from_file_location(name, _REF / relpath)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
