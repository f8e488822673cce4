"""Loader for the subnode_ext CPython extension (builds on first use,
hash-keyed like the ctypes FFI in __init__.py).  Returns None when no
compiler/headers are available — callers fall back to the pure-Python
SubNode path transparently."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sysconfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "subnode_ext.c")
_LIB = os.path.join(_HERE, "subnode_ext.so")
_HASH = _LIB + ".srchash"

_mod = None
_tried = False


def _src_hash() -> str:
    """Source hash + interpreter ABI tag: unlike the ctypes FFI this
    is a CPython extension, so a stale .so built for a different
    interpreter ABI must force a rebuild after a Python upgrade."""
    abi = sysconfig.get_config_var("SOABI") or "unknown-abi"
    with open(_SRC, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest() + "|" + abi


def _stale() -> bool:
    if not os.path.exists(_LIB):
        return True
    try:
        with open(_HASH) as fh:
            return fh.read().strip() != _src_hash()
    except OSError:
        return True


def _build() -> bool:
    inc = sysconfig.get_paths()["include"]
    cmd = ["gcc", "-O2", "-shared", "-fPIC", f"-I{inc}", _SRC,
           "-o", _LIB]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=120)
        if res.returncode != 0:
            return False
        with open(_HASH, "w") as fh:
            fh.write(_src_hash())
        return True
    except Exception:
        return False


def get_module():
    """The compiled subnode_ext module, or None."""
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if _stale() and not _build():
        return None
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location("subnode_ext",
                                                      _LIB)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:
        _mod = None
    return _mod
