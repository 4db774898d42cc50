"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's "multi-node without a cluster" stand-in (its ZMQ farm
smoke tests run on one machine, ``zmq_parallel_cmp/simple_task_vent.py``):
we emulate an 8-chip TPU slice with XLA host devices so sharding/collective
code paths are exercised in CI without hardware.

NOTE: must configure platforms BEFORE the first JAX computation; the axon TPU
plugin registers itself via sitecustomize, so we override through jax.config
(env vars alone are not honored once the plugin has registered).
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
