"""Worker process for tests/test_multiprocess.py (not a pytest module).

Runs ONE rank of a real 2-process jax.distributed cluster on the CPU
backend (gloo collectives) and drives the framework's own multihost
path end to end: initialize_multihost -> make_mesh spanning both
processes' devices -> sharded temporal train step (gradient all-reduce
crosses the process boundary). Prints one line the parent asserts on:

    proc<i> primary=<bool> loss=<f> devices=<global>/<local>

Usage: python _mp_worker.py <process_id> <coordinator_addr>
"""

import sys

pid = int(sys.argv[1])
addr = sys.argv[2]

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Same forcing as tests/conftest.py (the session env pins a TPU tunnel);
# gloo is the CPU cross-process collectives implementation.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

from sea_tpu.parallel.multihost import initialize_multihost, is_primary

initialize_multihost(addr, 2, pid)
assert jax.process_count() == 2, jax.process_count()

import numpy as np

from sea_tpu.configs.base import TemporalModelConfig, TrainConfig
from sea_tpu.models.temporal import init_temporal
from sea_tpu.parallel.mesh import make_mesh
from sea_tpu.parallel.train_step import make_sharded_temporal_train_step
from sea_tpu.train.optim import make_optimizer

cfg = TemporalModelConfig(num_layers=1, embed_dim=16, n_heads=2,
                          num_fields=2, scale_ratio=2, dropout=0.0)
params = init_temporal(jax.random.PRNGKey(0), cfg)
tx = make_optimizer(TrainConfig(learning_rate=1e-3))
mesh = make_mesh(n_data=2)
step, p, o, place = make_sharded_temporal_train_step(mesh, cfg, tx, params)

key = jax.random.PRNGKey(1)
src = jax.random.normal(key, (4, 6, 2, 16))
tgt = src * 0.5
ib = jax.random.normal(jax.random.fold_in(key, 1), (4, 6, 1))
src, tgt, ib = place(np.asarray(src), np.asarray(tgt), np.asarray(ib))
for i in range(3):
    p, o, stats = step(p, o, src, tgt, ib, jax.random.PRNGKey(2 + i))
loss = float(jax.device_get(stats["loss"]))
print(f"proc{pid} primary={is_primary()} loss={loss:.8f} "
      f"devices={jax.device_count()}/{jax.local_device_count()}",
      flush=True)
