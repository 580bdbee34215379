"""Mesh construction and batch/parameter shardings (pure-DP layout).

DP maps NCCL DDP (SURVEY.md §2.4): batch axis sharded over the ``data``
mesh axis, parameters replicated; the gradient all-reduce becomes an
XLA psum over ICI inserted automatically by jit.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name='data'):
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(local_batch, axis_name='data'):
    """Mesh over the largest device prefix that evenly divides the
    per-host batch (keeps sharding legal for small debug batches).

    Softer than the reference's hard divisibility error
    (odtk/main.py:170-171): non-divisible batches run on fewer chips
    with a warning instead of aborting.
    """
    devices = jax.devices()
    if jax.process_count() > 1:
        # divisibility enforced upstream: train()/infer() call
        # host_local_batch_size(batch) before building the mesh, which
        # raises the reference's clean startup error (main.py:170-171)
        # instead of letting shard_batch fail mid-iteration
        return make_mesh(devices, axis_name)
    n = len(jax.local_devices())
    while n > 1 and local_batch % n != 0:
        n -= 1
    if n < len(devices):
        import warnings
        warnings.warn(
            f'batch size {local_batch} is not a multiple of the device '
            f'count {len(devices)}; using {n} device(s). Make the batch '
            f'a multiple of the device count to use every chip.')
    return make_mesh(devices[:n], axis_name)


def batch_sharding(mesh, ndim=1, axis_name='data'):
    """Shard dim 0 on the data axis, replicate the rest."""
    spec = P(axis_name, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, *arrays, axis_name='data'):
    """Build global device arrays from process-local numpy batches.

    Single-process: equivalent to device_put with a batch sharding.
    Multi-host: each process contributes its local shard of the global
    batch (the DistributedSampler equivalent, data.py:202).
    """
    out = []
    for arr in arrays:
        sharding = batch_sharding(mesh, np.ndim(arr), axis_name)
        if jax.process_count() > 1:
            out.append(jax.make_array_from_process_local_data(sharding, arr))
        else:
            out.append(jax.device_put(arr, sharding))
    return out if len(out) > 1 else out[0]


def host_local_array(x):
    """This host's rows of a batch-sharded global array, as numpy.

    Multi-host jit outputs span non-addressable devices, so np.asarray/
    device_get raise; each host fetches its addressable shards (in
    batch order — they correspond to the rows this host fed via
    shard_batch) and all_gather_host reassembles the global result
    (odtk/infer.py:98-102 gathers the same way over gloo). Single-host
    arrays pass straight through."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        shards = sorted(x.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    return np.asarray(x)


def host_local_batch_size(global_batch):
    """Per-host batch; errors unless evenly divisible (main.py:170-171).

    Multi-host also requires the per-host batch to divide over the local
    chips (sharding a global array needs equal per-device rows on every
    host); single-host keeps make_mesh_for_batch's softer
    fewer-devices-with-a-warning fallback for debug batches.
    """
    world = jax.process_count()
    if global_batch % world != 0:
        raise RuntimeError(
            'Batch size should be a multiple of the number of hosts')
    local = global_batch // world
    if world > 1:
        n_local_dev = max(1, len(jax.local_devices()))
        if local % n_local_dev != 0:
            raise RuntimeError(
                'Per-host batch size should be a multiple of the local '
                'device count')
    return local
