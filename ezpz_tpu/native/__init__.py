"""Native (C++) host-side components.

``load_fastparse()`` returns the compiled parser module, building it with
g++ on first use (cached as ``_fastparse.<abi>.so`` next to the source), or
``None`` when no toolchain is available — callers fall back to the Python
parser.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastparse.cpp")
_cached = None
_tried = False


def _so_path() -> str:
    tag = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_HERE, f"_fastparse{tag}")


def build(verbose: bool = False) -> Optional[str]:
    """Compile the extension; returns the .so path or None on failure."""
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC",
        f"-I{include}", _SRC, "-o", so,
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return None
    if res.returncode != 0:
        if verbose:
            sys.stderr.write(res.stderr)
        return None
    return so


def load_fastparse():
    """The compiled module, or None (then use the Python parser)."""
    global _cached, _tried
    if _tried:
        return _cached
    _tried = True
    so = build()
    if so is None:
        return None
    try:
        spec = importlib.util.spec_from_file_location("ezpz_tpu.native._fastparse", so)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)  # type: ignore[union-attr]
        _cached = mod
    except Exception:
        _cached = None
    return _cached


if __name__ == "__main__":
    path = build(verbose=True)
    print("built:", path)
