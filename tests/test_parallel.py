"""Mesh construction and multi-host batch-divisibility guards."""

from unittest import mock

import jax
import pytest

from odtk_tpu.parallel import (host_local_batch_size, make_mesh_for_batch,
                               shard_batch)


def test_host_local_batch_single_host_passthrough():
    # single host: any batch is valid (make_mesh_for_batch shrinks the
    # mesh to a divisor of the batch), so no divisibility error
    assert host_local_batch_size(8) == 8
    assert host_local_batch_size(3) == 3


def test_host_local_batch_multi_host_guards():
    """The reference errors cleanly at startup on misconfigured
    multi-host batches (main.py:170-171); host_local_batch_size is that
    guard, called by train()/infer() before the mesh is built."""
    with mock.patch.object(jax, 'process_count', return_value=4), \
            mock.patch.object(jax, 'local_devices',
                              return_value=[object()] * 2):
        assert host_local_batch_size(8) == 2
        with pytest.raises(RuntimeError, match='multiple of the number'):
            host_local_batch_size(6)
    with mock.patch.object(jax, 'process_count', return_value=2), \
            mock.patch.object(jax, 'local_devices',
                              return_value=[object()] * 8):
        assert host_local_batch_size(16) == 8
        with pytest.raises(RuntimeError, match='local\\s+device count'):
            host_local_batch_size(4)    # 2 per host, 8 local chips


def test_make_mesh_for_batch_shrinks_to_divisor():
    # 8 virtual devices (conftest); batch 6 -> largest divisor mesh
    mesh = make_mesh_for_batch(6)
    n = mesh.devices.size
    assert 6 % n == 0 and n >= 1


def test_shard_batch_places_rows():
    import numpy as np
    mesh = make_mesh_for_batch(8)
    arr = shard_batch(mesh, np.arange(8 * 3, dtype=np.float32)
                      .reshape(8, 3))
    assert arr.shape == (8, 3)
    assert arr.sharding.is_fully_replicated or \
        arr.sharding.shard_shape(arr.shape)[0] == 8 // mesh.devices.size
