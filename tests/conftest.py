"""Test configuration: force a virtual 8-device CPU mesh + float64.

Multi-chip sharding is validated the standard way — N virtual CPU devices
(SURVEY.md §4e) — and float64 is enabled so the reference-tolerance
integrator paths are testable. Must run before any JAX backend init, hence
at conftest import time.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(__file__))
