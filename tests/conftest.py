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


def pytest_collection_modifyitems(config, items):
    """Run the associative-scan Riccati tests FIRST.

    XLA's CPU backend intermittently segfaults while compiling the
    associative_scan interleave/pad ops late in a long test process
    (observed repeatedly at the same test after ~97 prior tests'
    executables accumulated; the same compile always succeeds in
    isolation and passed in full runs where it happened to come early —
    a state-dependent LLVM JIT crash, not a library bug).  Hoisting
    these compiles to process start matches the condition under which
    they are reliable."""
    front = [it for it in items if "test_lqr" in it.nodeid]
    rest = [it for it in items if "test_lqr" not in it.nodeid]
    items[:] = front + rest
