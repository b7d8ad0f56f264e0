"""Build the native extension in-place.

Usage: python -m street_crafter_tpu.native.build
Compiles native.cpp into _native.*.so next to this file (g++, CPython +
numpy C APIs — no pybind11 needed).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build(verbose: bool = True) -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native.cpp")
    import numpy as np
    ext = sysconfig.get_config_var("EXT_SUFFIX")
    out = os.path.join(here, f"_native{ext}")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{sysconfig.get_paths()['include']}",
        f"-I{np.get_include()}",
        src, "-o", out,
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    build()
