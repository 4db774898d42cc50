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
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_collection_modifyitems(config, items):
    """Run the associative-scan Riccati tests FIRST.

    XLA's CPU backend intermittently segfaults while compiling a program
    late in a long test process — reproducibly at the ~98th test
    REGARDLESS of which test that is (moved with reordering; every
    crashing compile succeeds in isolation).  Two mitigations: hoist the
    most crash-prone compiles (associative scan) to process start, and
    periodically drop the jit executable caches (fixture below) so the
    CPU JIT's cumulative state never reaches the crash regime.

    Retirement condition: this is scaffolding around an XLA-CPU JIT
    fragility, not a framework bug (minimal repro: a long-lived process
    that jit-compiles ~100 distinct programs including an
    associative_scan; the segfault is inside XLA:CPU compilation, not at
    execution).  When a jax/jaxlib upgrade makes the full suite pass with
    this file's reordering + cache-clearing removed, delete both hooks."""
    front = [it for it in items if "test_lqr" in it.nodeid]
    rest = [it for it in items if "test_lqr" not in it.nodeid]
    items[:] = front + rest


_TEST_COUNT = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jit_cache_clear():
    yield
    _TEST_COUNT["n"] += 1
    if _TEST_COUNT["n"] % 20 == 0:
        jax.clear_caches()
