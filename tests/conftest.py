"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
logic is exercised without TPU hardware (standard JAX trick, see SURVEY.md §4).

Must run before jax is imported anywhere.
"""

import os

# Force CPU: the session env points JAX at a tunneled TPU (JAX_PLATFORMS=axon)
# which is reserved for benchmarking; unit tests run on a virtual 8-device
# CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon TPU plugin in this image ignores JAX_PLATFORMS from the
# environment; the config API wins, so force it here too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it
