"""parallel/distributed.py logic (no pod needed): single-host no-op,
env-var resolution, and explicit-arg passthrough into
jax.distributed.initialize (captured via monkeypatch — the only part a
podless environment cannot execute is the actual DCN handshake)."""

import jax

from hosnerf_tpu.parallel import distributed


def test_single_host_is_noop(monkeypatch):
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    distributed.initialize()
    assert called == []
    distributed.initialize(num_processes=1)
    assert called == []


def test_env_var_resolution(monkeypatch):
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    distributed.initialize()
    assert called == [{"coordinator_address": "10.0.0.1:1234",
                       "num_processes": 4, "process_id": 2}]


def test_explicit_args_win(monkeypatch):
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "ignored:1")
    distributed.initialize(coordinator_address="host:9999",
                           num_processes=2, process_id=1)
    assert called == [{"coordinator_address": "host:9999",
                       "num_processes": 2, "process_id": 1}]


def test_is_primary_single_process():
    assert distributed.is_primary() is True
