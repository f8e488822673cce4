"""Gate for the streaming Pallas kernels (ops/pallas_kernels.py).

KREEQ_TPU_PALLAS semantics:
  "1"    — always use the Pallas paths (caller has verified them).
  "auto" — use them iff an on-device exactness self-check passes
           (ops/pallas_selfcheck.py), cached per (jax, jaxlib,
           device kind) fingerprint so the check runs once, not per
           CLI invocation.
  unset / anything else — XLA paths only (the conservative default;
           see KNOWN_GAPS.md "Pallas on this environment").

The auto check runs in-process: by the time any gated getter is
called the backend is already initialized, and the self-check catches
kernel failures, so a broken Mosaic toolchain degrades to the XLA
path instead of an error.
"""

from __future__ import annotations

import json
import os

_cached: bool | None = None


def _cache_path() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.expanduser("~/.cache"))
    return os.path.join(base, "kreeq_tpu", "pallas_auto.json")


def _fingerprint() -> str:
    """Identify the kernel toolchain, not just the pip jax version.

    The Mosaic compiler lives in jaxlib + the PJRT plugin (libtpu),
    which this environment can swap under an unchanged jax version —
    exactly the skew KNOWN_GAPS.md documents — so the cached verdict
    must key on all of them.  platform_version comes from the PJRT
    client (for libtpu it embeds the build identifier).  The KERNEL
    SOURCE hash is included too: an edited kernel must re-earn its
    on-device verdict (interpret-mode exactness does not imply real
    Mosaic exactness — the round-2 precision bug)."""
    import hashlib

    import jax

    try:
        import jaxlib.version
        jaxlib_v = jaxlib.version.__version__
    except Exception:
        jaxlib_v = "unknown"
    dev = jax.devices()[0]
    try:
        plugin_v = dev.client.platform_version
    except Exception:
        plugin_v = "unknown"
    try:
        from ..ops import pallas_kernels
        with open(pallas_kernels.__file__, "rb") as f:
            ksrc = hashlib.sha256(f.read()).hexdigest()[:16]
    except Exception:
        ksrc = "unknown"
    # kernel-shaping env knobs are part of the toolchain identity: a
    # leaked KREEQ_TPU_MERGE_DEBUG letter (documented results-are-
    # WRONG) or a changed tile width / SMEM budget must re-earn (or
    # fail) the on-device verdict instead of riding a cached OK
    knobs = ",".join(
        f"{k}={os.environ.get(k, '')}" for k in
        ("KREEQ_TPU_MERGE_DEBUG", "KREEQ_TPU_MERGE_TILE",
         "KREEQ_TPU_MERGE_SMEM_BUDGET", "KREEQ_TPU_COUNT_TILE"))
    return "|".join((jax.__version__, jaxlib_v, plugin_v,
                     getattr(dev, "device_kind", ""), dev.platform,
                     ksrc, knobs))


def _auto_check() -> bool:
    from ..ops.pallas_selfcheck import selfcheck

    fp = _fingerprint()
    path = _cache_path()
    try:
        with open(path) as f:
            cached = json.load(f)
        if cached.get("fingerprint") == fp:
            return bool(cached["ok"])
    except (OSError, ValueError, KeyError):
        pass
    ok = selfcheck()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"fingerprint": fp, "ok": ok}, f)
        os.replace(tmp, path)
    except OSError:
        pass  # cache is an optimization only
    return ok


def pallas_enabled() -> bool:
    """True when the Pallas kernel paths should be used."""
    global _cached
    v = os.environ.get("KREEQ_TPU_PALLAS", "")
    if v == "1":
        return True
    if v != "auto":
        return False
    if _cached is None:
        _cached = _auto_check()
    return _cached
