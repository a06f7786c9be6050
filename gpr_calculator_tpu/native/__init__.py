"""Native (C++) host runtime components, built on demand with g++.

The compiled library is cached next to the sources; if no compiler is
available the callers fall back to NumPy implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

_HERE = Path(__file__).parent
_LIB = None
_TRIED = False


def _host_tag() -> str:
    """ISA fingerprint for the -march=native cache guard.

    platform.processor() is empty on typical Linux, so the tag also
    hashes the CPU feature flags (/proc/cpuinfo): a .so built with
    AVX-512 on one host must NOT be loaded on a host without it --
    that SIGILLs uncatchably.  Missing /proc falls back to the model
    name via platform alone (conservative: any doubt -> rebuild)."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha256(flags.encode()).hexdigest()[:16]
    return f"{platform.machine()}-{platform.processor()}-{digest}"


def _build() -> Path | None:
    src = _HERE / "neighbor.cpp"
    out = _HERE / "_libgprnative.so"
    tag = _HERE / "_libgprnative.host"
    if not src.exists():
        # never trust an orphaned .so (it may be from another machine:
        # -march=native binaries SIGILL on a lesser ISA, uncatchably)
        return None
    if (out.exists() and out.stat().st_mtime >= src.stat().st_mtime
            and tag.exists() and tag.read_text() == _host_tag()):
        return out
    try:
        with tempfile.TemporaryDirectory() as td:
            tmp_out = Path(td) / "lib.so"
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", str(src), "-o", str(tmp_out)],
                check=True, capture_output=True, timeout=120)
            tmp_out.replace(out)
        tag.write_text(_host_tag())
        return out
    except Exception:
        return None


def get_lib():
    """Return the loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.neighbor_build.restype = ctypes.c_longlong
        lib.neighbor_build.argtypes = [
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_double,
            ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_longlong),
            ctypes.POINTER(ctypes.c_double),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB
