"""Native (C++) host-runtime tier: build + loader with numpy fallback.

``python -m im2im_uq_tpu.native`` compiles the extension in place;
``get_patchops()`` returns the module or None (callers fall back to numpy).
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_patchops.so")


def build(verbose: bool = True) -> str:
    """Compile patchops.cpp → _patchops.so with the active interpreter's ABI."""
    import numpy as np

    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        os.path.join(_DIR, "patchops.cpp"),
        "-o",
        _SO,
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return _SO


_patchops_mod = None
_tried = False


def get_patchops():
    """The built extension module, or None when unavailable."""
    global _patchops_mod, _tried
    if _tried:
        return _patchops_mod
    _tried = True
    try:
        import importlib

        _patchops_mod = importlib.import_module("im2im_uq_tpu.native._patchops")
    except ImportError:
        _patchops_mod = None
    return _patchops_mod


if __name__ == "__main__":
    build()
