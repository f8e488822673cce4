"""Probe whether forcing an older Mosaic IR serialization version
unlocks Pallas on the tunneled TPU.

Diagnosis: jax's get_ir_version() only falls back to an older IR
version when is_cloud_tpu_older_than(2025-11-05) is True, but that
check requires 'TFRT TPU' in backend.platform_version — the axon
tunnel backend doesn't match, so the client serializes at the newest
IR version and the Nov-12-2025 libtpu fails with
"failed to legalize operation 'func.return'".

Run on a live TPU:  python scripts/probe_mosaic_version.py
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax._src import tpu_custom_call as tcc
from jax.experimental import pallas as pl


def trivial(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2


def try_version(v):
    orig = tcc.get_ir_version
    tcc.get_ir_version = (lambda ctx: v) if v is not None else orig
    try:
        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        f = pl.pallas_call(
            trivial, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))
        y = jax.jit(f)(x)
        ok = bool(np.allclose(np.asarray(y), np.asarray(x) * 2))
        return "OK" if ok else "WRONG RESULT"
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        return f"FAIL: {type(e).__name__}: {msg}"
    finally:
        tcc.get_ir_version = orig


if __name__ == "__main__":
    dev = jax.devices()[0]
    print("device:", dev, file=sys.stderr)
    print("platform_version:",
          repr(jax.lib.xla_bridge.get_backend().platform_version),
          file=sys.stderr)
    for v in [None, 8, 7, 6, 9, 10]:
        print(f"ir_version={v}: {try_version(v)}", flush=True)
