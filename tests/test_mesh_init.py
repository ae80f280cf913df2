"""Host-side unit tests for the multi-host entry point.

``initialize_distributed`` (parallel/mesh.py) is the one piece of the
multi-node row (SURVEY.md §2.4) that cannot be exercised on this box with
real processes — but its env parsing, pod detection and single-process
fallback are pure host Python: tested here with monkeypatched env and a
recorded ``jax.distributed.initialize``.
"""

import jax
import pytest

from lbm_ferrofluid_tpu.parallel.mesh import (
    auto_mesh_shape,
    initialize_distributed,
    make_mesh,
)

_ENV_KEYS = (
    "JAX_COORDINATOR_ADDRESS",
    "JAX_NUM_PROCESSES",
    "JAX_PROCESS_ID",
    "TPU_WORKER_HOSTNAMES",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


@pytest.fixture
def dist_env(monkeypatch):
    """Clean slate env + recorded jax.distributed.initialize/process_count."""
    for k in _ENV_KEYS:
        monkeypatch.delenv(k, raising=False)
    calls = []

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.append(dict(coordinator_address=coordinator_address,
                          num_processes=num_processes, process_id=process_id))

    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    return monkeypatch, calls


def test_single_process_fallback(dist_env):
    _, calls = dist_env
    assert initialize_distributed() == 1
    assert calls == []


def test_single_host_tunneled_chip_does_not_initialize(dist_env):
    # the tunneled dev chip also exports TPU_WORKER_HOSTNAMES (one host)
    mp, calls = dist_env
    mp.setenv("TPU_WORKER_HOSTNAMES", "t1v-n-abc-w-0")
    assert initialize_distributed() == 1
    assert calls == []


def test_pod_autodetect_from_worker_hostnames(dist_env):
    mp, calls = dist_env
    mp.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1,host-2,host-3")
    assert initialize_distributed() == 4
    assert calls == [dict(coordinator_address=None, num_processes=None,
                          process_id=None)]  # pod: jax auto-detects


def test_pod_autodetect_from_megascale(dist_env):
    mp, calls = dist_env
    mp.setenv("MEGASCALE_COORDINATOR_ADDRESS", "coord:1234")
    assert initialize_distributed() == 4
    assert len(calls) == 1


def test_env_var_cluster_config(dist_env):
    mp, calls = dist_env
    mp.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:9876")
    mp.setenv("JAX_NUM_PROCESSES", "2")
    mp.setenv("JAX_PROCESS_ID", "1")
    assert initialize_distributed() == 4
    assert calls == [dict(coordinator_address="10.0.0.1:9876",
                          num_processes=2, process_id=1)]


def test_explicit_args_override_env(dist_env):
    mp, calls = dist_env
    mp.setenv("JAX_COORDINATOR_ADDRESS", "ignored:1")
    mp.setenv("JAX_NUM_PROCESSES", "8")
    assert initialize_distributed("10.1.1.1:2222", 2, 0) == 4
    assert calls == [dict(coordinator_address="10.1.1.1:2222",
                          num_processes=2, process_id=0)]


@pytest.mark.parametrize("n,axes,expect", [
    (8, 2, (2, 4)),
    (8, 3, (2, 2, 2)),
    (1, 2, (1, 1)),
    (7, 2, (1, 7)),
    (12, 2, (2, 6)),
    (6, 3, (1, 2, 3)),
])
def test_auto_mesh_shape(n, axes, expect):
    shape = auto_mesh_shape(n, axes)
    assert shape == expect
    assert len(shape) == axes
    prod = 1
    for s in shape:
        prod *= s
    assert prod == n
    assert tuple(sorted(shape)) == shape  # larger factors last


def test_make_mesh_shape_mismatch_raises():
    with pytest.raises(ValueError):
        make_mesh(("z", "y"), (3, 5), devices=jax.devices()[:8])


def test_make_mesh_auto_factor():
    mesh = make_mesh(("batch", "z"), None, devices=jax.devices()[:8])
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "batch": 2, "z": 4}
