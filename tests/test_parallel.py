"""
Sharding tests on the virtual 8-device CPU mesh: batch-sharded rollouts must
produce identical results to unsharded execution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torchdrivesim_tpu.parallel import (
    BATCH_AXIS, batch_sharding, make_mesh, replicate_tree, shard_batched_tree,
)


@pytest.mark.integration
def test_sharded_rollout_matches_unsharded():
    from tests.test_simulator import _build_simulator
    sim = _build_simulator()
    sim = sim.extend(4, in_place=False)   # batch 8 = device count
    assert sim.batch_size == 8

    actions = jnp.asarray(
        np.random.RandomState(0).uniform(-0.3, 0.3, (12, 8, 2, 2)),
        dtype=jnp.float32)

    def rollout(state, actions):
        def body(s, a):
            s = sim.functional_step(s, a)
            return s, s.agent_state
        return jax.lax.scan(body, state, actions)

    final_plain, traj_plain = jax.jit(rollout)(sim.state, actions)

    mesh = make_mesh(8)
    state_sharded = shard_batched_tree(sim.state, mesh)
    actions_sharded = jax.device_put(
        actions, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec(None, BATCH_AXIS)))
    final_shard, traj_shard = jax.jit(rollout)(state_sharded, actions_sharded)

    np.testing.assert_allclose(np.asarray(traj_shard),
                               np.asarray(traj_plain), atol=1e-5)
    # verify the state actually sharded over the batch axis
    shards = final_shard.agent_state.sharding
    assert len(shards.device_set) == 8


def test_shard_batched_tree_placement():
    mesh = make_mesh(8)
    tree = {'batched': jnp.zeros((16, 3)), 'scalar': jnp.asarray(1.0),
            'odd': jnp.zeros((3, 2))}
    placed = shard_batched_tree(tree, mesh)
    assert len(placed['batched'].sharding.device_set) == 8
    # non-divisible and scalar leaves replicate
    assert placed['scalar'].sharding.is_fully_replicated
    assert placed['odd'].sharding.is_fully_replicated


def test_replicated_policy_gradients_reduce_over_batch():
    import optax
    from torchdrivesim_tpu.models import BirdviewCNNPolicy
    mesh = make_mesh(8)
    policy = BirdviewCNNPolicy(action_size=2, features=(4,))
    params = policy.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 16, 16)))
    params = replicate_tree(params, mesh)
    obs = jax.device_put(jnp.ones((16, 3, 16, 16)), batch_sharding(mesh))
    target = jax.device_put(jnp.zeros((16, 2)), batch_sharding(mesh))

    @jax.jit
    def loss_and_grad(params, obs, target):
        def loss(p):
            return jnp.mean((policy.apply(p, obs) - target) ** 2)
        return jax.value_and_grad(loss)(params)

    val, grads = loss_and_grad(params, obs, target)
    assert np.isfinite(float(val))
    # gradients are replicated (psum over the sharded batch happened inside)
    leaf = jax.tree.leaves(grads)[0]
    assert leaf.sharding.is_fully_replicated
