"""Tree level-scheduling for the dynamics sweeps.

The three ABA sweeps are sequential in tree *depth*, not in body count:
every joint at the same depth is independent. Grouping bodies by depth turns
39 per-joint op-chains into ~10 per-level vectorized ops — fewer, wider XLA
ops (VPU-friendly, less HBM round-tripping, ~4x smaller compile graph).
Index arrays are static numpy, so gathers/scatters lower to efficient XLA
gather/scatter-add with constant indices.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from thormang_isaacgym_tpu.models.robot import RobotModel


@lru_cache(maxsize=64)
def body_levels(model: RobotModel):
    """Returns (levels, depth) where levels is a tuple of int32 arrays of
    body indices (>=1) grouped by depth, shallow first."""
    nb = model.nb
    parent = model.parent
    depth = np.zeros(nb, np.int32)
    for i in range(nb):
        if parent[i] >= 0:
            depth[i] = depth[parent[i]] + 1
    levels = []
    for d in range(1, depth.max() + 1 if nb > 1 else 1):
        idx = np.nonzero(depth == d)[0].astype(np.int32)
        if idx.size:
            levels.append(idx)
    return tuple(levels), depth


@lru_cache(maxsize=64)
def level_structure(model: RobotModel):
    """Banded tree structure exploiting BFS body ordering.

    Bodies are emitted in BFS order by the URDF compiler, so each depth
    level is a CONTIGUOUS index range and every parent of a level-k body
    lies in level k-1. This lets the dynamics sweeps use static slices plus
    tiny one-hot matmuls for parent gather/scatter-add — no XLA scatter ops
    (which lower catastrophically on TPU) anywhere in the hot path.

    Returns a list of per-level dicts:
      start, end           — global body-index range [start, end)
      parent_local (n_k,)  — parent's position within level k-1's range
      gather (n_k, n_prev) — one-hot: x_parent = gather @ x_prev
      scatter (n_prev, n_k)— transpose: accumulate into parents
    Level 0 in this list is depth-1 (children of the root).
    """
    levels, depth = body_levels(model)
    parent = np.array(model.parent, np.int32)
    out = []
    prev_start, prev_end = 0, model.n_roots  # the root "level" (all actors)
    for L in levels:
        start, end = int(L.min()), int(L.max()) + 1
        assert np.array_equal(L, np.arange(start, end)), \
            "bodies not BFS-contiguous; regenerate model"
        p = parent[L]
        assert (p >= prev_start).all() and (p < prev_end).all()
        p_local = (p - prev_start).astype(np.int32)
        n_prev = prev_end - prev_start
        gather = np.zeros((len(L), n_prev), np.float32)
        gather[np.arange(len(L)), p_local] = 1.0
        out.append(dict(start=start, end=end, parent_local=p_local,
                        gather=gather, scatter=gather.T.copy()))
        prev_start, prev_end = start, end
    return out


@lru_cache(maxsize=64)
def static_arrays(model: RobotModel):
    """Static per-joint arrays used by the vectorized sweeps."""
    from thormang_isaacgym_tpu.models.robot import REVOLUTE

    nj = model.nj
    parent = np.array(model.parent, np.int32)
    axis = np.array(model.joint_axis, np.float32).reshape(-1, 3)
    jtype = np.array(model.joint_type, np.int32)
    is_rev = (jtype == REVOLUTE).astype(np.float32)[:, None]
    # joint motion subspace S (nj, 6): angular part for revolute, linear for
    # prismatic
    S = np.concatenate([axis * is_rev, axis * (1.0 - is_rev)], axis=1).astype(np.float32)
    return parent, axis, is_rev, S
