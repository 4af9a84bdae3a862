"""Multi-chip scale-out: chains sharded over a device mesh.

The reference's only parallel axis is independent Markov chains over a
32-core thread pool with AtomicFloat film splats (reference
src/parallel.cpp:82-155, src/mlt.cpp:60-196). TPU-native equivalent:

  * the chain batch axis is sharded over a 1-D `jax.sharding.Mesh`
    ("chains"); every per-chain computation is embarrassingly parallel so
    the only collectives are a `psum` of the per-device film accumulators
    and of the bootstrap normalization statistics — riding ICI, exactly
    where the reference uses shared-memory atomics;
  * the scene (SoA arrays, textures, envmap CDFs) is replicated.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_chain_mesh(devices=None):
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), ('chains',))


def shard_chains(mesh, tree):
    """Shard the leading (chain) axis of every leaf over the mesh.

    Single-process: a plain device_put resharding. Multi-process: each
    process holds its LOCAL chains (the distributed bootstrap made
    per-host seeds), so the global array is assembled from process-local
    data — the global chain count is process_count * local count."""
    multiproc = jax.process_count() > 1

    def shard(x):
        spec = P('chains') if getattr(x, 'ndim', 0) >= 1 else P()
        sharding = NamedSharding(mesh, spec)
        if multiproc and getattr(x, 'ndim', 0) >= 1:
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape)
        return jax.device_put(x, sharding)
    return jax.tree.map(shard, tree)


def replicate(mesh, tree):
    def rep(x):
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(rep, tree)


# NOTE: film partitioning is not a wrapper concern — the drivers pass
# film_shards to mlt.make_mlt_step, which lands every splat in its lane's
# per-device partial film ([S, H, W, 3] co-sharded with the chains) so the
# cross-device film reduce happens ONCE per run, not per step (see
# parallel/multihost.py render_mlt_multihost and __graft_entry__).
