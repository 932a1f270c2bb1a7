"""Test harness config: force CPU with 8 virtual devices BEFORE jax loads,
so multi-device mesh/sharding tests run anywhere (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # 8 virtual devices time-share this host's core(s): one replica's conv
    # can take minutes before its peers reach the all-reduce rendezvous, and
    # XLA's stuck-collective watchdog then ABORTS the process (observed:
    # xla::cpu::InProcessCommunicator::AllReduce -> AwaitAndLogIfStuck ->
    # SIGABRT on a 1-core container). Give the watchdog test-scale budgets.
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
               " --xla_cpu_collective_timeout_seconds=3600")
if "xla_cpu_use_xnnpack" not in _flags:
    # Anti-thread-thrash set for few-core hosts (measured in
    # __graft_entry__._force_host_devices): XNNPACK's pthreadpool, XLA's
    # parallel LLVM codegen, and Eigen's spinning threadpool burn most of
    # the wall clock in `sys` when 8 virtual devices share one core.
    _flags += (" --xla_cpu_use_xnnpack=false"
               " --xla_cpu_parallel_codegen_split_count=1"
               " --xla_cpu_multi_thread_eigen=false")
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU plugin with
# JAX_PLATFORMS=axon; override at the config level (must run before any
# backend initialization) so tests genuinely run on the 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache (shared with __graft_entry__'s CPU phases):
# repeat suite runs skip the XLA CPU compiles, which dominate per-test cost
# (measured: flax init of the danet fixture = 1.0s pure trace + ~20s XLA CPU
# compile of its op-by-op eager executables). Two hard-won details:
#   * CPU entries get their OWN dir — XLA:CPU AOT results encode the build
#     host's CPU features and refuse to load on another machine generation,
#     so sharing .jax_cache with the (portable) remote-TPU entries left the
#     suite reading poison and caching nothing.
#   * threshold 0.0 — flax's eager init compiles thousands of sub-second
#     op executables that a 1.0s threshold never persists; caching them cut
#     the fixture init 20.6s -> 7.7s warm (measured on this container).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# One core, one computation at a time: the async dispatch thread only adds
# scheduling churn (same motive as the XLA flags above).
jax.config.update("jax_cpu_enable_async_dispatch", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy compile/CPU tests (full backbones, multi-device steps); "
        "deselect with `-m 'not slow'` for the fast suite — measured on this "
        "1-core container: 157s with a warm .jax_cache_cpu, ~500s on the "
        "cold run that populates it. The cost is XLA CPU compile, NOT flax "
        "tracing (danet fixture: 1.0s pure trace vs ~20s eager op compiles; "
        "the r3 'tracing floor' claim was an artifact of a poisoned shared "
        "cache — see the cache comment above). Multi-core hosts are "
        "proportionally faster. Slow tier: see TESTS.md",
    )


@pytest.fixture
def rng():
    return np.random.RandomState(0)
