"""Native (C++) component loader: builds and binds native/*.cpp via ctypes.

The reference's runtime is entirely native C++ (SURVEY.md §2); here native
code backs the host-side pieces that benefit from it — currently the
binned-SAH BVH builder (native/sah_builder.cpp), the counterpart of the
driver-side acceleration-structure build the reference calls into
(Core/AccelerationStructure.cpp). Compiled on first use with g++ -O3 and
cached next to the source; falls back gracefully (callers use the Morton
builder) if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import stat
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_CACHE: dict = {}


def _cache_dir() -> Path:
    """User-private cache directory: a world-writable fixed /tmp path would
    let another local user pre-plant a malicious .so that CDLL would load."""
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    d = Path(base) / "stratum_tpu" / "native"
    d.mkdir(parents=True, exist_ok=True)
    os.chmod(d, 0o700)
    return d


def _owned_private(path: Path) -> bool:
    st = os.stat(path)
    return st.st_uid == os.getuid() and not (
        st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)
    )


def _build_library(name: str) -> ctypes.CDLL | None:
    src = _NATIVE_DIR / f"{name}.cpp"
    if not src.exists():
        return None
    # tag by source AND host CPU: -march=native binaries from a different
    # host (VM migration) can SIGILL here, so a migrated box must rebuild
    try:
        cpu = subprocess.run(
            ["grep", "-m1", "flags", "/proc/cpuinfo"],
            capture_output=True, text=True, timeout=5,
        ).stdout
    except Exception:
        cpu = ""
    tag = hashlib.sha1(src.read_bytes() + cpu.encode()).hexdigest()[:12]
    out = _cache_dir() / f"stratum_{name}_{tag}.so"
    if not (out.exists() and _owned_private(out)):
        # compile to a private temp file, then atomic rename into place
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(out.parent))
        os.close(fd)
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC",
            "-std=c++17", "-pthread", str(src), "-o", tmp,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.chmod(tmp, 0o500)
            os.rename(tmp, out)
        except Exception:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return None
    if not _owned_private(out):
        return None
    try:
        return ctypes.CDLL(str(out))
    except OSError:
        return None


def load(name: str) -> ctypes.CDLL | None:
    if name not in _CACHE:
        _CACHE[name] = _build_library(name)
    return _CACHE[name]


def sah_order(positions: np.ndarray, indices: np.ndarray, leaf_size: int):
    """Binned-SAH triangle ordering + leaf offsets via the native builder.

    Returns (order [T] int32, leaf_offsets [L+1] int32) or None if the
    native library is unavailable.
    """
    lib = load("sah_builder")
    if lib is None:
        return None
    fn = lib.sah_build
    fn.restype = ctypes.c_int
    pos = np.ascontiguousarray(positions, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    t = idx.shape[0]
    order = np.empty(t, np.int32)
    offsets = np.empty(t + 1, np.int32)
    nl = ctypes.c_int(0)
    rc = fn(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(pos.shape[0]),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_int(t),
        ctypes.c_int(leaf_size),
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(nl),
    )
    if rc != 0:
        return None
    return order, offsets[: nl.value + 1]
