"""Multi-host launch — the torchrun/NCCL equivalent.

The reference launches one process per GPU via `torchrun --nnodes --
nproc_per_node` with `LOCAL_RANK` device pinning and per-rank seed offsets
(`/root/reference/isaacgymenvs/train.py:74-82`, `cfg/config.yaml:39-40`);
rl_games all-reduces gradients over NCCL. TPU-native: single-program
multi-host JAX — every host runs the SAME program, `jax.distributed.
initialize` wires the hosts into one runtime, the global device mesh spans
all hosts, and the learner's gradient `pmean` rides ICI within a slice /
DCN across slices (parallel/mesh.py). No per-rank code paths.

Launch (per host):
  python -m thormang_isaacgym_tpu.runtime.train task=... multi_host=true \
      coordinator=<host0>:1234 num_processes=N process_id=<rank>

On TPU pods the three values come from the environment automatically
(jax.distributed.initialize() with no args); the explicit form serves CPU
fleets and tests.
"""
from __future__ import annotations

import os

import jax


def maybe_initialize(cfg: dict) -> dict:
    """Initialize jax.distributed when multi-host is requested.

    Returns a small info dict {initialized, process_id, num_processes}.
    Seeds: the caller should fold `process_id` into data-generation keys
    the same way the reference offsets per-rank seeds (`train.py:81`
    `cfg.seed += rank`) — parallel/mesh.py already folds the shard index
    into rollout keys, so identical per-host seeds are correct here.
    """
    if not (cfg.get("multi_host") or os.environ.get("THORMANG_MULTI_HOST")):
        return {"initialized": False, "process_id": 0, "num_processes": 1}
    kw = {}
    if cfg.get("coordinator"):
        kw["coordinator_address"] = str(cfg["coordinator"])
    if cfg.get("num_processes"):
        kw["num_processes"] = int(cfg["num_processes"])
    if cfg.get("process_id") is not None:
        kw["process_id"] = int(cfg["process_id"])
    jax.distributed.initialize(**kw)
    return {
        "initialized": True,
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
    }


def host_local_batch(global_batch: int) -> int:
    """Env count owned by this host (envs shard across all devices; each
    host steps only its local shard — the same host-local-sim property as
    the reference's rank-local sims)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
