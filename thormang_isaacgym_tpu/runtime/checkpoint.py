"""Checkpoint save/restore — the rl_games runs/<name>/nn/*.pth equivalent
(`/root/reference/isaacgymenvs/cfg/train/GogoroPPO.yaml:69-71`, restore at
`train.py:156-160`).

The full TrainState pytree (policy + optimizer + normalizers + adaptive LR)
is saved leaf-by-leaf (npz); restore rebuilds against a template pytree of
the same structure, so any registered dataclass works without bespoke
serializers. Env state is reproducible from the seed (stateless PRNG
streams), so policy checkpoints are sufficient for resume — a capability
upgrade over the reference, where PhysX state is unrecoverable
(SURVEY.md §5).
"""
from __future__ import annotations

import io
import os

import jax
import numpy as np


def save_train_state(path: str, ts) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    leaves = jax.tree.leaves(jax.device_get(ts))
    buf = io.BytesIO()
    np.savez(buf, *[np.asarray(l) for l in leaves])
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_train_state(path: str, template):
    with open(path, "rb") as f:
        npz = np.load(io.BytesIO(f.read()))
    loaded = [npz[f"arr_{i}"] for i in range(len(npz.files))]
    t_leaves, treedef = jax.tree.flatten(template)
    if len(loaded) != len(t_leaves):
        raise ValueError(
            f"checkpoint has {len(loaded)} leaves, template expects "
            f"{len(t_leaves)} — config/model mismatch")
    cast = [np.asarray(l).astype(np.asarray(t).dtype).reshape(np.shape(t))
            for l, t in zip(loaded, t_leaves)]
    return jax.tree.unflatten(treedef, cast)
