"""Multi-host launch test: two OS processes form one JAX runtime over the
CPU backend (the torchrun-equivalent path, reference train.py:74-82 ->
parallel/distributed.py). Each process owns 2 virtual devices; the global
mesh spans 4; a psum over the env axis must see all shards."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ.pop("JAX_PLATFORMS", None)
import jax
jax.config.update("jax_platforms", "cpu")
from thormang_isaacgym_tpu.parallel.distributed import maybe_initialize
cfg = dict(multi_host=True, coordinator=sys.argv[1],
           num_processes=2, process_id=int(sys.argv[2]))
info = maybe_initialize(cfg)
assert info["initialized"] and info["num_processes"] == 2
assert len(jax.devices()) == 4, jax.devices()

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()), ("env",))
def body(x):
    return jax.lax.psum(x.sum(), "env")
fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=P("env"),
                           out_specs=P()))
# each process supplies its local half of the global array
global_shape = (8,)
local = np.arange(8, dtype=np.float32).reshape(4, 2)[
    info["process_id"] * 2: info["process_id"] * 2 + 2].reshape(-1)
arrs = [jax.device_put(local.reshape(2, 2)[i], d)
        for i, d in enumerate(mesh.local_devices)]
x = jax.make_array_from_single_device_arrays(
    global_shape, NamedSharding(mesh, P("env")), arrs)
out = float(fn(x))
assert out == float(np.arange(8).sum()), out
print("MULTIHOST_OK", info["process_id"])
"""


def test_two_process_cpu_multihost(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coord, str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=280)[0] for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "MULTIHOST_OK" in out


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port
