"""REAL multi-process distributed execution (SURVEY §5.8).

The rest of the suite validates sharding on a single process with 8
virtual devices; this test spawns an actual 2-process jax.distributed
cluster (CPU backend, gloo collectives — the TPU-pod bring-up path with
the transport swapped) and drives the framework's own entry points:
``initialize_multihost`` with explicit coordinator/process args,
``make_mesh`` spanning both processes' devices, and the sharded temporal
train step whose gradient all-reduce crosses the process boundary.

Asserts: both ranks finish, agree bit-for-bit on the loss (the all-reduce
makes training state identical on every rank), see the global device
count, rank 0 alone reports primary (checkpoint-writer election), and the
2-process loss matches a single-process run of the same math.
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "_mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.heavy
def test_two_process_distributed_training_matches_single_process():
    addr = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # Each rank gets ONE local CPU device (the parent's conftest forces 8
    # virtual devices for THIS process only; the flag must not leak).
    env["XLA_FLAGS"] = ""
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), addr],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
            assert p.returncode == 0, out
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    lines = {}
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("proc"):
                lines[ln.split()[0]] = ln
    assert set(lines) == {"proc0", "proc1"}, outs
    assert "primary=True" in lines["proc0"]
    assert "primary=False" in lines["proc1"]
    # Global view: 2 devices total, 1 addressable per rank.
    assert "devices=2/1" in lines["proc0"], lines["proc0"]

    def loss_of(ln):
        return float(ln.split("loss=")[1].split()[0])

    # The gradient all-reduce keeps training state identical on every
    # rank — the printed losses must agree exactly.
    assert loss_of(lines["proc0"]) == loss_of(lines["proc1"])

    # And the distributed run computes the same math as one process:
    # replay the worker's 3 steps single-device (same seeds, f32, CPU).
    from sea_tpu.configs.base import TemporalModelConfig, TrainConfig
    from sea_tpu.models.temporal import init_temporal
    from sea_tpu.train.optim import make_optimizer
    from sea_tpu.train.train_temporal import make_train_step

    cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                              num_fields=2, scale_ratio=2, dropout=0.0)
    params = init_temporal(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainConfig(learning_rate=1e-3))
    opt = tx.init(params)
    step = make_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    src = jax.random.normal(key, (4, 6, 2, 16))
    tgt = src * 0.5
    ib = jax.random.normal(jax.random.fold_in(key, 1), (4, 6, 1))
    for i in range(3):
        params, opt, stats = step(params, opt, src, tgt, ib,
                                  jax.random.PRNGKey(2 + i))
    single = float(stats["loss"])
    dist = loss_of(lines["proc0"])
    assert abs(single - dist) <= 1e-5 * max(1.0, abs(single)), (single, dist)
