"""Test harness config: force CPU with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(``--xla_force_host_platform_device_count``), the JAX equivalent of a fake
backend; bench.py separately runs on real TPU hardware.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
