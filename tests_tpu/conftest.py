"""On-device (TPU) smoke-test configuration.

This directory is the `tpu`-marked smoke set promised by the marker in
pyproject.toml: it lowers and compiles (NOT interpret-mode) every Pallas
kernel at its eligibility band edges on the live axon TPU, catching the
regression class CPU interpret tests cannot see (e.g. the round-4
batched-EKF predict kernel compiled fine on CPU interpret and VMEM-OOMed
on the v5e).

Run it with:

    python -m pytest tests_tpu -n 0 -q

from /root/repo with the DEFAULT shell env (PYTHONPATH=/root/.axon_site and
JAX_PLATFORMS=axon must stay set — stripping them breaks TPU access,
CLAUDE.md). ``-n 0`` is required: the default pyproject addopts spawn 4
xdist workers, and four processes contending for the single tunneled chip
wedge it. Every test here carries @pytest.mark.tpu via this conftest, and
the default `tests/` run never collects this directory (testpaths).

If the tunnel is down (jax.devices() can block for hours — CLAUDE.md), the
whole session SKIPS: liveness is probed in a subprocess with a timeout,
exactly like bench.py.
"""
import subprocess
import sys

import pytest


def _tpu_alive(timeout_s: float = 180.0) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform != 'cpu'"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


_ALIVE = None


def pytest_collection_modifyitems(config, items):
    global _ALIVE
    for item in items:
        item.add_marker(pytest.mark.tpu)
    if not items:
        return
    if _ALIVE is None:
        _ALIVE = _tpu_alive()
    if not _ALIVE:
        skip = pytest.mark.skip(reason="TPU tunnel down (subprocess probe)")
        for item in items:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def tpu_backend():
    import jax

    assert jax.default_backend() == "tpu", (
        f"expected the axon TPU backend, got {jax.default_backend()} — "
        "run from /root/repo with the default shell env"
    )
    return jax.devices()[0]
