"""Test configuration: run everything on a virtual 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on
XLA's forced host-platform device count (SURVEY.md §4d).

NOTE: this environment's site hook registers a remote 'axon' TPU backend and
forces jax_platforms='axon,cpu' at import, overriding JAX_PLATFORMS env —
we must force the config back to cpu *after* importing jax but before any
backend initialization.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
