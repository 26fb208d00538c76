"""Native (C++) runtime components.

The reference's data layer rides native code it never owns — mxnet RecordIO
+ imdecode for FR training (`FR_training/utils/dataset.py:16-120`,
`FR_training/utils/verification.py:246-288`) and Rust `tokenizers` behind HF
AutoTokenizer. This package owns the TPU framework's equivalents as a small
C extension (`loader.cpp`): pread-based RecordIO batch extraction and
thread-parallel libjpeg decode→resize→normalize straight into a
pre-allocated float32 host batch, GIL released.

Build model: compiled on first use with g++ (baked into the image) and
cached next to the source; everything degrades gracefully to the pure-Python
implementations (`data/recordio.py`) when a toolchain or libjpeg is absent,
so the framework never hard-requires the extension.
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_LOCK = threading.Lock()
_mod = None
_build_error: str | None = None


def _so_path() -> str:
    tag = sysconfig.get_config_var("SOABI") or "so"
    return os.path.join(_DIR, f"_fpg_loader.{tag}.so")


def _build() -> str:
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    include = sysconfig.get_paths()["include"]
    # per-PID temp: concurrent first-use builds from multiple processes must
    # not interleave writes to one tmp file (os.replace stays atomic)
    tmp = f"{so}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", _SRC, "-o", tmp, "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    os.replace(tmp, so)
    return so


def load():
    """Returns the compiled `_fpg_loader` module, or None if unavailable."""
    global _mod, _build_error
    if _mod is not None:
        return _mod
    if _build_error is not None:
        return None
    with _LOCK:
        if _mod is not None:
            return _mod
        try:
            so = _build()
            import importlib.util

            spec = importlib.util.spec_from_file_location("_fpg_loader", so)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _mod = mod
        except Exception as e:  # no g++ / libjpeg / load failure → fallback
            _build_error = f"{type(e).__name__}: {e}"
            return None
    return _mod


def available() -> bool:
    return load() is not None


def build_error() -> str | None:
    """The reason the native loader is unavailable (None if fine/unbuilt)."""
    load()
    return _build_error
