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
    for i in range(1, nb):
        depth[i] = depth[parent[i]] + 1
    levels = []
    for d in range(1, depth.max() + 1 if nb > 1 else 1):
        idx = np.nonzero(depth == d)[0].astype(np.int32)
        if idx.size:
            levels.append(idx)
    return tuple(levels), depth


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
