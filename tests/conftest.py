import os
import sys

# Tests run on a virtual 8-device CPU mesh: sharding/collective code paths
# compile and execute without TPU hardware.  Must be set before jax import;
# direct assignment (the ambient environment pre-sets JAX_PLATFORMS).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "validateFiles"))
