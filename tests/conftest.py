import os

# Tests run on a virtual 8-device CPU mesh; the real TPU is only used by
# bench.py.  The axon sitecustomize forces jax_platforms="axon,cpu" at
# interpreter startup, so override the config (backend init is lazy —
# this runs before any test touches a device).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
