"""
PPO on vectorized driving environments, fully on-device
(counterpart of the reference `examples/rl_example.py`).

The reference collects rollouts with a Python loop into a RolloutStorage
(`rl_example.py:28-129`); here the entire rollout (env transitions including
BEV rendering), GAE computation, and PPO epochs compile into jitted
functions, so the training loop never leaves the accelerator.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torchdrivesim_tpu.models import ActorCritic


def gae(rewards, values, dones, last_value, gamma=0.99, lam=0.95):
    """Generalized advantage estimation over a T-major rollout
    (math of `rl_example.py:91-96`), as a reverse lax.scan."""
    def body(carry, inp):
        adv_next, value_next = carry
        reward, value, done = inp
        not_done = 1.0 - done
        delta = reward + gamma * value_next * not_done - value
        adv = delta + gamma * lam * not_done * adv_next
        return (adv, value), adv
    (_, _), advs = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (rewards, values, dones), reverse=True)
    return advs


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--envs', type=int, default=16)
    parser.add_argument('--rollout', type=int, default=16)
    parser.add_argument('--iterations', type=int, default=10)
    parser.add_argument('--epochs', type=int, default=2)
    parser.add_argument('--res', type=int, default=64)
    parser.add_argument('--lr', type=float, default=3e-4)
    parser.add_argument('--clip', type=float, default=0.2)
    parser.add_argument('--map', default='carla_Town02')
    args = parser.parse_args()

    from examples.gym_env import GymEnvConfig, VectorizedGymEnv

    env_cfg = GymEnvConfig(map_name=args.map, agent_count=4, res=args.res)
    venv = VectorizedGymEnv(env_cfg, batch_size=args.envs)
    step_fn = venv.make_step_fn()
    b = args.envs

    model = ActorCritic(action_size=2, features=(16, 32))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, args.res, args.res)))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    def policy_sample(params, obs, key):
        mean, log_std, value = model.apply(params, obs)
        std = jnp.exp(log_std)
        action = mean + std * jax.random.normal(key, mean.shape)
        logp = jnp.sum(-0.5 * ((action - mean) / std) ** 2
                       - log_std - 0.5 * np.log(2 * np.pi), axis=-1)
        return action, logp, value

    @jax.jit
    def collect(params, state, key):
        """Roll the policy through the env for T steps, on-device."""
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            # observe current state by rendering (one frame lookahead style)
            _, obs, _, _ = step_fn(state, jnp.zeros((b, 2)))
            action, logp, value = policy_sample(params, obs, sub)
            state, obs_next, reward, done = step_fn(state, jnp.tanh(action))
            return (state, key), (obs, action, logp, value, reward,
                                  done.astype(jnp.float32))
        (state, key), traj = jax.lax.scan(body, (state, key), None,
                                          length=args.rollout)
        obs, actions, logps, values, rewards, dones = traj
        _, last_obs, _, _ = step_fn(state, jnp.zeros((b, 2)))
        _, _, last_value = model.apply(params, last_obs)
        advs = gae(rewards, values, dones, last_value)
        returns = advs + values
        return state, key, (obs, actions, logps, advs, returns)

    @jax.jit
    def ppo_update(params, opt_state, batch):
        obs, actions, logps_old, advs, returns = batch
        t, b_ = obs.shape[0], obs.shape[1]
        flat = lambda x: x.reshape((t * b_,) + x.shape[2:])
        obs, actions = flat(obs), flat(actions)
        logps_old, advs, returns = flat(logps_old), flat(advs), flat(returns)
        advs = (advs - advs.mean()) / (advs.std() + 1e-8)

        def loss_fn(params):
            mean, log_std, value = model.apply(params, obs)
            std = jnp.exp(log_std)
            logp = jnp.sum(-0.5 * ((actions - mean) / std) ** 2
                           - log_std - 0.5 * np.log(2 * np.pi), axis=-1)
            ratio = jnp.exp(logp - logps_old)
            pg = -jnp.mean(jnp.minimum(
                ratio * advs,
                jnp.clip(ratio, 1 - args.clip, 1 + args.clip) * advs))
            v_loss = jnp.mean((value - returns) ** 2)
            entropy = jnp.mean(jnp.sum(log_std + 0.5 * np.log(2 * np.pi * np.e),
                                       axis=-1))
            return pg + 0.5 * v_loss - 0.01 * entropy, (pg, v_loss)

        (loss, (pg, v_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, pg, v_loss

    state = venv.initial_state
    key = jax.random.PRNGKey(0)
    for it in range(args.iterations):
        t0 = time.perf_counter()
        state, key, batch = collect(params, state, key)
        mean_reward = float(batch[4].mean())  # returns
        for _ in range(args.epochs):
            params, opt_state, loss, pg, v_loss = ppo_update(
                params, opt_state, batch)
        steps = args.envs * args.rollout
        dt = time.perf_counter() - t0
        print(f"iter {it}: return {mean_reward:.3f} loss {float(loss):.3f} "
              f"({steps/dt:.0f} env-steps/s)")
    print("done")


if __name__ == '__main__':
    main()
