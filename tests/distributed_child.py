"""Child process for the multi-process jax.distributed test.

Each process owns 2 virtual CPU devices; together they form a 2-process,
4-device global "data" mesh running ONE production train step (jnp MLP path;
the Pallas kernel needs a TPU). All inputs are identical across processes and
placed replicated via make_array_from_process_local_data; per-ray tensors are
resharded over the global mesh inside the step (train/step.py), so the
gradient all-reduce crosses the process boundary through gloo collectives.

Usage: python distributed_child.py <process_id> <num_processes> <port>
Prints "LOSS <pid> <value>" on success; the parent asserts both processes
print the same value.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=pid,
)

import numpy as np  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _bench_config, _random_batch  # noqa: E402
from benerf_tpu.parallel import mesh as mesh_mod  # noqa: E402
from benerf_tpu.train import step as step_mod  # noqa: E402

assert jax.process_count() == nproc, jax.process_count()
ndev = len(jax.devices())
assert ndev == 2 * nproc, jax.devices()

mesh = Mesh(np.array(jax.devices()), (mesh_mod.DATA_AXIS,))
rep = NamedSharding(mesh, P())

cfg = _bench_config(
    N_samples=4,
    N_importance=4,
    sampling_event_rays=4 * ndev,
    sampling_rgb_rays=2 * ndev,
    num_interpolated_pose=2,
    event_width=32,
    event_height=24,
    use_pallas=False,
)
H, W = 24, 32
batch = _random_batch(cfg, H, W, n_events=2_000, seed=0)
state = step_mod.init_state(cfg, jax.random.PRNGKey(0))
key = jax.random.PRNGKey(1)


def to_global(x):
    return jax.make_array_from_process_local_data(rep, np.asarray(x))


batch = jax.tree.map(to_global, batch)
state = jax.tree.map(to_global, state)
key = to_global(key)

fn = step_mod.make_train_step(cfg, H, W, mesh=mesh)
with mesh:
    state, metrics = fn(state, batch, key)
    jax.block_until_ready(metrics["loss"])

loss = float(metrics["loss"])
assert np.isfinite(loss)
print(f"LOSS {pid} {loss:.9f}", flush=True)
