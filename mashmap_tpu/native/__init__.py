"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime around the compute core is C++ (kseq FASTA
parser, gzstream, pthread pool). The TPU rebuild keeps the same split:
JAX/XLA for the compute path, small C++ pieces for the IO-bound runtime,
compiled on first use into the user cache directory with the system
toolchain and loaded through the C ABI (no pybind11 dependency). Every
native component has a pure-Python fallback so the package works even
without a compiler.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
from typing import Iterator, Optional, Tuple

logger = logging.getLogger("mashmap_tpu.native")

_HERE = os.path.dirname(__file__)
_FAILED = object()
_lib = None


def _cache_dir() -> str:
    return os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "mashmap_tpu")


def _build(src: str, out: str, extra: Tuple[str, ...] = ()) -> bool:
    try:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               src, "-o", out, *extra]
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=300)
        if r.returncode != 0:
            logger.warning("native build failed: %s", r.stderr[-800:])
            return False
        return True
    except Exception as e:  # compiler missing etc.
        logger.warning("native build unavailable: %s", e)
        return False


def _load_fastaread() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is _FAILED:
        return None
    if _lib is not None:
        return _lib
    if os.environ.get("MASHMAP_TPU_NO_NATIVE"):
        _lib = _FAILED
        return None
    src = os.path.join(_HERE, "fastaread.cpp")
    with open(src, "rb") as fh:
        tag = hashlib.sha256(fh.read()).hexdigest()[:16]
    out = os.path.join(_cache_dir(), f"libfastaread-{tag}.so")
    if not os.path.exists(out):
        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = out + f".tmp{os.getpid()}"
        if not _build(src, tmp, ("-lz",)):
            _lib = _FAILED
            return None
        os.replace(tmp, out)
    try:
        lib = ctypes.CDLL(out)
    except OSError as e:
        logger.warning("native fastaread load failed: %s", e)
        _lib = _FAILED
        return None
    lib.fr_open.restype = ctypes.c_void_p
    lib.fr_open.argtypes = [ctypes.c_char_p]
    lib.fr_next.restype = ctypes.c_int
    lib.fr_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_long)]
    lib.fr_close.restype = None
    lib.fr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_fastaread() is not None


def read_records(path: str) -> Iterator[Tuple[str, str]]:
    """Yield (name, sanitized_sequence) via the native parser.

    Raises ValueError on malformed input; RuntimeError when the native
    library is unavailable (callers fall back to the Python parser).
    """
    lib = _load_fastaread()
    if lib is None:
        raise RuntimeError("native fastaread unavailable")
    h = lib.fr_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    name_p = ctypes.c_char_p()
    name_n = ctypes.c_long()
    seq_p = ctypes.c_char_p()
    seq_n = ctypes.c_long()
    try:
        while True:
            rc = lib.fr_next(h, ctypes.byref(name_p), ctypes.byref(name_n),
                             ctypes.byref(seq_p), ctypes.byref(seq_n))
            if rc == 0:
                return
            if rc < 0:
                raise ValueError(
                    f"unknown file format for {path!r} (not FASTA/FASTQ)")
            name = ctypes.string_at(name_p, name_n.value).decode("ascii")
            seq = ctypes.string_at(seq_p, seq_n.value).decode("ascii")
            yield name, seq
    finally:
        lib.fr_close(h)
