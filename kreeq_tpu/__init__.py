"""kreeq-tpu: a TPU-native k-mer quality-evaluation engine.

A from-scratch re-architecture of the capabilities of vgl-hub/kreeq
(reference: /root/reference) for TPU hardware.  The compute path
(canonical k-mer extraction, counting, probing) runs as JAX/XLA
programs — sorted-array tables + vectorized searchsorted probes replace
the reference's 128-way parallel hash maps (reference:
include/kreeq.h:138-148), and device collectives replace its
file-based `union` merge (reference: src/graph-builder.cpp:297-351).

Keys are 64-bit reversible 2-bit packings of canonical k-mers
(first base in the low bits; A=0 C=1 G=2 T=3; canonical = min of the
packing of the k-mer and of its reverse complement), byte-compatible
with the on-disk `.kreeq` databases produced by the reference
(validated against testFiles/test1.kreeq).
"""

import os as _os

import jax as _jax

# 64-bit keys (k <= 32 -> up to 64-bit packed k-mers) require x64 mode.
# Must be set before any JAX computation runs.
_jax.config.update("jax_enable_x64", True)

# Optional platform override (e.g. KREEQ_TPU_PLATFORM=cpu for small
# inputs where accelerator dispatch latency dominates).  Set via
# jax.config, not JAX_PLATFORMS: environments whose startup hooks
# import jax before this package read the env var too early.
_platform = _os.environ.get("KREEQ_TPU_PLATFORM")
if _platform:
    _jax.config.update("jax_platforms", _platform)

# Persistent compilation cache: kernel shapes are stable across runs
# (fixed chunk sizes, power-of-two merge buckets), so repeat runs skip
# XLA compilation entirely.
if not _os.environ.get("KREEQ_TPU_NO_COMPILE_CACHE"):
    _cache = _os.environ.get(
        "KREEQ_TPU_COMPILE_CACHE",
        _os.path.expanduser("~/.cache/kreeq_tpu_jax"))
    try:
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           1.0)
    except (OSError, AttributeError):
        pass

__version__ = "0.1.0"
