"""Export parity tests: numpy reference MLP must bit-match the JAX policy
(the reference's export.py ONNX parity-set mechanism, export.py:175-200)."""
import json
import os

import jax
import numpy as np

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig
from thormang_isaacgym_tpu.runtime.export import export_policy, numpy_policy_forward


def test_export_and_numpy_parity(tmp_path):
    env = tgx.make("Cartpole", num_envs=2, seed=0)
    ppo = PPO(env, PPOConfig(units=(32, 32), mixed_precision=False))
    ts = ppo.init(jax.random.key(0))
    out = export_policy(ppo, ts, str(tmp_path), "cartpole", num_parity=32)

    weights = dict(np.load(tmp_path / "cartpole_weights.npz"))
    meta = json.loads((tmp_path / "cartpole_meta.json").read_text())
    obs = np.load(tmp_path / "cartpole_parity_obs.npy")
    expected = np.load(tmp_path / "cartpole_parity_out.npy")

    got = numpy_policy_forward(weights, meta, obs)
    np.testing.assert_allclose(got, expected, atol=1e-5)
    assert out.shape == (32, 1)
    # portable graph artifact exists
    assert (tmp_path / "cartpole_policy.stablehlo.txt").exists()
