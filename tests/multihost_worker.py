"""Subprocess worker for the multi-host distributed-build tests.

Usage: python multihost_worker.py <pid> <nprocs> <port> <outdir> <k>
       <chunk> <read-files...>

Runs a 4-virtual-CPU-device JAX process, joins the 2-process gloo
cluster, builds the distributed k-mer table from this host's file
shard, and dumps the full gathered table to <outdir>/table_<pid>.npz.
"""

import os
import sys

pid = int(sys.argv[1])
nprocs = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]
k = int(sys.argv[5])
chunk = int(sys.argv[6])
files = sys.argv[7:]

flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"])
os.environ["KREEQ_TPU_NO_COMPILE_CACHE"] = "1"
os.environ["KREEQ_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
os.environ["KREEQ_TPU_NUM_PROCESSES"] = str(nprocs)
os.environ["KREEQ_TPU_PROCESS_ID"] = str(pid)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from kreeq_tpu.parallel.multihost import (build_table_distributed,  # noqa: E402
                                          maybe_initialize,
                                          shard_read_files)

assert maybe_initialize(), "distributed init did not trigger"
assert jax.process_count() == nprocs, jax.process_count()
assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

mine = shard_read_files(files, nprocs, pid)
table = build_table_distributed(mine, k, chunk=chunk)
np.savez(os.path.join(outdir, f"table_{pid}.npz"), keys=table.keys,
         cov=table.cov, fw=table.fw, bw=table.bw)
print(f"worker {pid}: {len(table)} distinct kmers", flush=True)
