"""AOT-compile the Pallas kernels against a v5e compile-only topology.

No TPU hardware needed: the local libtpu builds a compile-only PJRT
client (jax.experimental.topologies), which runs the full Mosaic
legalization pipeline.  This is how the round-2 root cause was found:
the long-standing "failed to legalize operation 'func.return'" was NOT
toolchain version skew — the package enables jax x64 globally, under
which Python int constants inside kernel bodies (and index maps)
promote to i64, a type Mosaic cannot legalize on TPU.  Both kernels
now trace under jax.enable_x64(False) and compile cleanly.

Run:  python scripts/aot_compile_kernels.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import topologies  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402
from jax.sharding import Mesh, NamedSharding  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import kreeq_tpu  # noqa: E402,F401  (enables x64 — part of the test)
from kreeq_tpu.ops import pallas_kernels as PK  # noqa: E402


def main() -> int:
    topo = topologies.get_topology_desc("v5e-4", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(4,), ("x",))
    ns = NamedSharding(mesh, P())
    rc = 0

    largs = [jax.ShapeDtypeStruct((8 * PK.TILE, 1), jnp.int32, sharding=ns)
             for _ in range(3)]
    fs = shard_map(lambda a, b, c: PK._run_pallas(a, b, c, 8), mesh=mesh,
                   in_specs=(P(), P(), P()), out_specs=(P(), P()),
                   check_rep=False)
    try:
        jax.jit(fs).lower(*largs).compile()
        print("count kernel: COMPILE OK")
    except Exception as e:  # noqa: BLE001
        print(f"count kernel FAIL: {type(e).__name__}: {str(e)[:300]}")
        rc = 1

    qt, dmax, tch = 4, 2, 8

    def probe_fn(base, nch, qhi, qlo, thi, tlo, pay):
        return PK._probe_run(qhi, qlo, thi, tlo, pay, qt, dmax,
                             base=base, nch=nch)

    pargs = [
        jax.ShapeDtypeStruct((qt,), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((qt,), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((qt * PK.TILE, 1), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((qt * PK.TILE, 1), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((1, tch * PK.TILE), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((1, tch * PK.TILE), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((PK.PCOL, tch * PK.TILE), jnp.int32,
                             sharding=ns),
    ]
    ps = shard_map(probe_fn, mesh=mesh, in_specs=(P(),) * 7, out_specs=P(),
                   check_rep=False)
    try:
        jax.jit(ps).lower(*pargs).compile()
        print("probe kernel: COMPILE OK")
    except Exception as e:  # noqa: BLE001
        print(f"probe kernel FAIL: {type(e).__name__}: {str(e)[:300]}")
        rc = 1

    na_t, mdmax, nbt = 8, 2, 8

    def merge_fn(*a):
        return PK._merge_run(*a, na_t, mdmax)

    margs = [jax.ShapeDtypeStruct((na_t,), jnp.int32, sharding=ns)] * 4 + [
        jax.ShapeDtypeStruct((1, na_t * PK.TILE), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((1, na_t * PK.TILE), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((PK.PCOL, na_t * PK.TILE), jnp.int32,
                             sharding=ns),
        jax.ShapeDtypeStruct((1, nbt * PK.TILE), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((1, nbt * PK.TILE), jnp.int32, sharding=ns),
        jax.ShapeDtypeStruct((PK.PCOL, nbt * PK.TILE), jnp.int32,
                             sharding=ns),
    ]
    ms = shard_map(merge_fn, mesh=mesh, in_specs=(P(),) * 10,
                   out_specs=(P(), P()), check_rep=False)
    try:
        jax.jit(ms).lower(*margs).compile()
        print("merge kernel: COMPILE OK")
    except Exception as e:  # noqa: BLE001
        print(f"merge kernel FAIL: {type(e).__name__}: {str(e)[:300]}")
        rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
