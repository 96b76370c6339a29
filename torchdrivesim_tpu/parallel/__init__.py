"""
Device-mesh sharding for batched simulation.

The reference is single-device; its only parallel axis is the leading batch
dimension (`SURVEY.md §2.5`). On TPU that axis becomes a sharded axis over a
``jax.sharding.Mesh``: scene tensors, agent tensors, and rendered images all
shard over ``batch``; XLA inserts any needed collectives over ICI, and
multi-host scaling uses standard ``jax.distributed`` initialization.

No tensor/pipeline parallelism is defined because the workload has no large
weight matrices to split -- the simulation is embarrassingly batch-parallel.
The policy networks trained through the simulator (IL/RL examples) are small
CNNs; they are replicated and their gradients reduced over ``batch`` (plain
data parallelism), which is the communication-optimal layout here.
"""
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = 'batch'


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """A 1-D device mesh over the batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (batch) dimension across devices."""
    return NamedSharding(mesh, P(BATCH_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batched_tree(tree, mesh: Mesh):
    """
    Place a PyTree on the mesh: arrays with a leading batch dimension shard
    over ``batch``; scalars and rank-0 leaves replicate. The batch size must
    divide the device count evenly.
    """
    batch = batch_sharding(mesh)
    repl = replicated_sharding(mesh)
    n = mesh.devices.size

    def place(x):
        if hasattr(x, 'ndim') and x.ndim > 0 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, batch)
        return jax.device_put(x, repl)

    return jax.tree.map(place, tree)


def replicate_tree(tree, mesh: Mesh):
    """Replicate every leaf of a PyTree on all mesh devices."""
    repl = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)


def shard_simulator(sim, mesh: Mesh):
    """
    Prepare a :class:`~torchdrivesim_tpu.simulator.Simulator` for sharded
    execution over ``mesh``'s batch axis: shards the state PyTree across the
    devices and points the renderer's Pallas fast paths at the mesh so they
    run under ``jax.shard_map`` (XLA's SPMD partitioner cannot split an
    opaque ``pallas_call`` on its own -- under plain jit it would all-gather
    the inputs and render the FULL batch on every device). The plain-XLA
    parts of the step need no annotation; the partitioner propagates the
    batch sharding through them.

    Mutates and returns ``sim``. Requires ``sim.batch_size`` to be a
    multiple of the device count.
    """
    n = mesh.devices.size
    if sim.batch_size % n != 0:
        raise ValueError(
            f"batch size {sim.batch_size} is not divisible by the "
            f"{n}-device mesh; extend the batch or shrink the mesh")
    if hasattr(sim.renderer, 'shard_mesh'):
        sim.renderer.shard_mesh = mesh
    sim.state = shard_batched_tree(sim.state, mesh)
    return sim
