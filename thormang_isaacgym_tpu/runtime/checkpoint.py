"""Checkpoint save/restore — the rl_games runs/<name>/nn/*.pth equivalent
(`/root/reference/isaacgymenvs/cfg/train/GogoroPPO.yaml:69-71`, restore at
`train.py:156-160`).

The full TrainState pytree (policy + optimizer + normalizers + adaptive LR)
serializes with flax; env state is reproducible from the seed (stateless PRNG
streams), so policy checkpoints are sufficient for resume — a capability
upgrade over the reference, where PhysX state is unrecoverable (SURVEY.md §5).
"""
from __future__ import annotations

import os

import flax.serialization
import jax


def save_train_state(path: str, ts) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # pull to host
    ts_host = jax.device_get(ts)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(ts_host))


def load_train_state(path: str, template):
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)
