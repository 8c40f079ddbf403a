"""Test config: force an 8-device CPU mesh (SURVEY.md §4 distributed strategy).

Tests run on CPU for determinism and to emulate a multi-chip mesh via
``--xla_force_host_platform_device_count=8``; TPU execution is covered by
bench.py and the driver's compile checks.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
