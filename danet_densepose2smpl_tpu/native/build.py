"""On-demand g++ compilation + ctypes loading for native components."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_CACHE: dict = {}


def load_library(name: str) -> ctypes.CDLL | None:
    """Compile native/<name>.cpp (cached by source hash) and dlopen it.
    Returns None if no C++ toolchain is available."""
    if name in _CACHE:
        return _CACHE[name]

    src = os.path.join(os.path.dirname(__file__), f"{name}.cpp")
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    out_dir = os.path.join(tempfile.gettempdir(), "danet_native")
    os.makedirs(out_dir, exist_ok=True)
    so_path = os.path.join(out_dir, f"lib{name}-{digest}.so")

    if not os.path.exists(so_path):
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", src, "-o", so_path + ".tmp"],
                check=True, capture_output=True,
            )
            os.replace(so_path + ".tmp", so_path)
        except (subprocess.CalledProcessError, FileNotFoundError):
            _CACHE[name] = None
            return None

    lib = ctypes.CDLL(so_path)
    _CACHE[name] = lib
    return lib
