#!/usr/bin/env python3
"""Multi-host DP smoke: N processes x M virtual CPU devices, one train step.

Validates the jax.distributed bootstrap (parallel.init_distributed),
cross-process global-batch assembly (shard_batch /
make_array_from_process_local_data) and eval result gathering
(all_gather_host) without TPU pods — the multi-host path of
SURVEY.md §2.4's DP strategy.

Run:  python extras/test_multihost.py            # spawns 2 workers
      python extras/test_multihost.py worker <i> # (internal)
"""

import os
import subprocess
import sys

NUM_PROCS = 2
DEVS_PER_PROC = 2
PORT = 29611


def worker(idx):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', DEVS_PER_PROC)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
    from odtk_tpu.parallel import (init_distributed, world_info, make_mesh,
                                   shard_batch, all_gather_host,
                                   host_local_batch_size)
    init_distributed(f'127.0.0.1:{PORT}', NUM_PROCS, idx)
    rank, world = world_info()
    assert world == NUM_PROCS, world
    assert len(jax.devices()) == NUM_PROCS * DEVS_PER_PROC

    import numpy as np
    import jax.numpy as jnp
    from odtk_tpu.model import Model
    from odtk_tpu.train import make_optimizer, make_train_step

    global_batch = 4
    local = host_local_batch_size(global_batch)
    assert local == 2

    model = Model(backbones='ResNet18FPN', classes=3)
    model.initialize(rng=0, image_size=(128, 128))
    mesh = make_mesh()
    tx = make_optimizer(0.01, 10, [100], 0.1)
    params = model.variables['params']
    opt = tx.init(params)
    step = make_train_step(model, tx, mesh)

    rng = np.random.RandomState(rank)
    data = rng.randn(local, 128, 128, 3).astype(np.float32) * 0.1
    tgt = np.full((local, 8, 5), -1.0, np.float32)
    tgt[:, 0] = [10, 10, 60, 60, 1]
    images, tgts = shard_batch(mesh, data, tgt)
    assert images.shape[0] == global_batch      # global logical batch

    params, opt, cl, bl = step(params, opt, model.variables['frozen'],
                               images, tgts)
    cl = float(cl)
    assert np.isfinite(cl)

    gathered = all_gather_host(np.asarray([rank], np.int32))
    assert sorted(np.asarray(gathered).reshape(-1).tolist()) == [0, 1]
    print(f'[proc {rank}] step OK cls_loss={cl:.4f} gather OK', flush=True)

    # ---- eval leg: the real infer() path with per-host dataset
    # sharding, all_gather_host result gathering, and master-side
    # image-id dedup + COCO eval (reference: odtk/infer.py:98-102).
    import json
    import tempfile
    from odtk_tpu.infer import infer as run_infer

    img_dir = os.environ['ODTK_SMOKE_IMAGES']
    anns = os.environ['ODTK_SMOKE_ANNS']
    det_file = os.path.join(tempfile.gettempdir(),
                            f'odtk_multihost_dets_{PORT}.json')
    # tiny threshold: a fresh π=0.01-prior model scores everything
    # ~0.01, so detections survive and the dedup path has real work
    emodel = Model(backbones='ResNet18FPN', classes=3,
                   config={'threshold': 1e-6})
    emodel.initialize(rng=0, image_size=(128, 128))
    stats = run_infer(emodel, img_dir, det_file, resize=128, max_size=160,
                      batch_size=4, annotations=anns, verbose=(rank == 0))
    if rank == 0:
        assert stats is not None and len(stats) == 12, stats
        assert np.all(np.asarray(stats) >= -1) and np.isfinite(stats).all()
        with open(det_file) as f:
            dets = json.load(f)['annotations']
        with open(anns) as f:
            n_images = len(json.load(f)['images'])
        covered = {d['image_id'] for d in dets}
        # every image evaluated exactly once across the two hosts:
        # dedup must collapse the wraparound-padded duplicates, and the
        # gather must deliver BOTH hosts' shards to the master
        assert len(covered) == n_images, (len(covered), n_images)
        per_img = {}
        for d in dets:
            per_img[d['image_id']] = per_img.get(d['image_id'], 0) + 1
        assert max(per_img.values()) <= emodel.detections * 3, per_img
        print(f'[proc 0] eval OK: {len(covered)} images, '
              f'AP={stats[0]:.3f}', flush=True)
    else:
        assert stats == 0                      # non-master returns early
        print(f'[proc {rank}] eval leg OK (non-master)', flush=True)


def main():
    import tempfile
    root = tempfile.mkdtemp(prefix='odtk_multihost_')
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tests'))
    from synth import make_dataset
    img_dir, anns = make_dataset(root, n_images=8, size=(160, 200),
                                 max_boxes=3, fmt='jpg')
    env = dict(os.environ, JAX_PLATFORMS='cpu',
               ODTK_SMOKE_IMAGES=img_dir, ODTK_SMOKE_ANNS=anns)
    procs = [subprocess.Popen(
        [sys.executable, __file__, 'worker', str(i)], env=env)
        for i in range(NUM_PROCS)]
    codes = [p.wait(timeout=600) for p in procs]
    if any(codes):
        raise SystemExit(f'multihost smoke FAILED: exit codes {codes}')
    print('MULTIHOST SMOKE PASSED')


if __name__ == '__main__':
    if len(sys.argv) > 1 and sys.argv[1] == 'worker':
        worker(int(sys.argv[2]))
    else:
        main()
