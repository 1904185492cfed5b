"""LSTM policy + seq-minibatch PPO (rl_games rnn block parity:
`cfg/train/AnymalTerrainPPO_LSTM.yaml`, `HumanoidPPO.yaml:68-75`,
`seq_length` truncated BPTT)."""
import jax
import jax.numpy as jnp
import numpy as np

import thormang_isaacgym_tpu as tgx
from thormang_isaacgym_tpu.learn.networks import ActorCriticRNN
from thormang_isaacgym_tpu.learn.ppo import PPO, PPOConfig


def test_rnn_network_step():
    net = ActorCriticRNN(num_actions=3, units=(16,), rnn_units=8,
                         rnn_layers=2, layer_norm=True, concat_input=True)
    carry = net.zero_carry(4)
    params = net.init(jax.random.key(0), jnp.zeros((4, 5)), carry)
    mu, ls, v, carry2 = net.apply(params, jnp.ones((4, 5)), carry)
    assert mu.shape == (4, 3) and v.shape == (4,)
    assert len(carry2) == 2 and carry2[0][0].shape == (4, 8)
    # hidden state actually carries information
    mu2, *_ = net.apply(params, jnp.ones((4, 5)), carry2)
    assert not np.allclose(np.asarray(mu), np.asarray(mu2))


def test_from_rlgames_rnn_block():
    cfg = PPOConfig.from_rlgames({
        "params": {
            "network": {"mlp": {"units": [64, 32]},
                        "rnn": {"name": "lstm", "units": 32, "layers": 1,
                                "before_mlp": False, "concat_input": True,
                                "layer_norm": True}},
            "config": {"seq_length": 4, "horizon_length": 8},
        }})
    assert cfg.rnn_units == 32 and cfg.seq_len == 4
    assert cfg.rnn_concat_input and cfg.rnn_layer_norm


def test_lstm_ppo_trains():
    env = tgx.make("Cartpole", num_envs=16, seed=0)
    cfg = PPOConfig(horizon_length=8, minibatch_size=64, mini_epochs=2,
                    units=(32,), rnn_units=16, seq_len=4,
                    mixed_precision=False)
    ppo = PPO(env, cfg)
    key = jax.random.key(0)
    ts = ppo.init(key)
    env_state = env.reset(key)
    for i in range(3):
        key, sub = jax.random.split(key)
        ts, env_state, metrics = ppo._train_iter(ts, env_state, sub)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # lstm params exist in the train state
    paths = [str(k) for k, _ in
             jax.tree_util.tree_flatten_with_path(ts.params)[0]]
    assert any("lstm" in p for p in paths), "no lstm params found"
