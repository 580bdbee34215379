"""Checkpoint save/load with the reference schema.

Schema (compat contract, odtk/model.py:217-258):
  {backbone: [names], classes, state_dict, ratios, scales, [angles],
   iteration, optimizer, scheduler}
Presence of 'angles' implies a rotated-bbox model on load.

Two on-disk formats by extension:
  * ``.pth`` / ``.torch`` — torch.save with real torch tensors in
    state_dict (torch-style names, OIHW kernels): round-trips with the
    reference toolkit and torchvision-pretrained files.
  * anything else (default ``.ckpt``) — msgpack via flax.serialization;
    no torch dependency at load time.

Training state ('optimizer' = optax state, 'scheduler' = plain dict) is
framework-specific in both formats, same as the reference's
torch-optimizer blobs.
"""

import os

import jax
import numpy as np
from flax import serialization

from .torch_import import state_dict_to_variables, variables_to_state_dict


def _is_torch_format(path):
    return os.path.splitext(path)[1] in ('.pth', '.torch')


def _meta(model):
    meta = {
        'backbone': list(model.backbones),
        'classes': int(model.classes),
        'ratios': [float(r) for r in model.ratios],
        'scales': [float(s) for s in model.scales],
    }
    if model.rotated_bbox and model.angles:
        meta['angles'] = [float(a) for a in model.angles]
    return meta


def save(model, state):
    """Write checkpoint to state['path'] (cf. odtk/model.py:217-232)."""
    path = state['path']
    checkpoint = _meta(model)
    checkpoint['state_dict'] = variables_to_state_dict(model.variables)
    for key in ('iteration', 'optimizer', 'scheduler'):
        if key in state:
            checkpoint[key] = state[key]

    if _is_torch_format(path):
        import torch
        checkpoint['state_dict'] = {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in checkpoint['state_dict'].items()}
        if 'optimizer' in checkpoint:
            checkpoint['optimizer'] = serialization.msgpack_serialize(
                serialization.to_state_dict(checkpoint['optimizer']))
        tmp = path + '.tmp'
        torch.save(checkpoint, tmp)
        os.replace(tmp, path)
    else:
        if 'optimizer' in checkpoint:
            checkpoint['optimizer'] = serialization.msgpack_serialize(
                serialization.to_state_dict(
                    jax.tree.map(np.asarray, checkpoint['optimizer'])))
        blob = serialization.msgpack_serialize(_plain(checkpoint))
        tmp = path + '.tmp'
        with open(tmp, 'wb') as f:
            f.write(blob)
        os.replace(tmp, path)


def _plain(obj):
    if isinstance(obj, dict):
        return {str(k): _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if hasattr(obj, 'shape'):
        return np.asarray(obj)
    return obj


def load(filename, rotated_bbox=False, dtype=None):
    """Rebuild a Model from checkpoint metadata (odtk/model.py:234-258).

    Returns (model, state) where state carries iteration/optimizer
    (still serialized msgpack bytes — the train loop restores it against
    its optax template)/scheduler.
    """
    from ..model import Model

    if not os.path.isfile(filename):
        raise ValueError('No checkpoint {}'.format(filename))

    if _is_torch_format(filename):
        import torch
        checkpoint = torch.load(filename, map_location='cpu',
                                weights_only=False)
        state_dict = {k: np.asarray(v.detach().numpy() if hasattr(v, 'detach')
                                    else v)
                      for k, v in checkpoint['state_dict'].items()}
    else:
        with open(filename, 'rb') as f:
            checkpoint = serialization.msgpack_restore(f.read())
        state_dict = {k: np.asarray(v)
                      for k, v in checkpoint['state_dict'].items()}

    kwargs = {}
    for key in ('ratios', 'scales', 'angles'):
        if key in checkpoint:
            kwargs[key] = checkpoint[key]
    if 'angles' in checkpoint or rotated_bbox:
        kwargs['rotated_bbox'] = True
    if dtype is not None:
        kwargs['dtype'] = dtype

    model = Model(backbones=checkpoint['backbone'],
                  classes=int(checkpoint['classes']), **kwargs)
    template = model.initialize(rng=0)
    variables, report = state_dict_to_variables(state_dict, template)
    if report['missing']:
        unfilled = [m for m in report['missing'] if m[0] == 'unfilled']
        mismatch = [m for m in report['missing'] if m[0] == 'shape-mismatch']
        if mismatch:
            raise ValueError(f'Checkpoint shape mismatches: {mismatch[:5]}')
        if unfilled:
            raise ValueError(
                f'Checkpoint missing {len(unfilled)} tensors, e.g. '
                f'{unfilled[:3]}')
    model.variables = variables

    state = {}
    for key in ('iteration', 'optimizer', 'scheduler'):
        if key in checkpoint:
            state[key] = checkpoint[key]
    return model, state


def peek_iteration(filename):
    """Read just the recorded training iteration from a checkpoint
    (0 if absent), without building the model."""
    if _is_torch_format(filename):
        import torch
        checkpoint = torch.load(filename, map_location='cpu',
                                weights_only=False)
    else:
        with open(filename, 'rb') as f:
            checkpoint = serialization.msgpack_restore(f.read())
    return int(checkpoint.get('iteration', 0))


def restore_opt_state(blob, template):
    """Deserialize an optimizer-state blob against an optax template.

    A structure mismatch (e.g. a checkpoint written by a different
    optimizer form) falls back to the fresh template with a warning —
    resuming with reset momentum beats refusing to resume at all."""
    if blob is None:
        return template
    restored = serialization.msgpack_restore(bytes(blob))
    try:
        return serialization.from_state_dict(template, restored)
    except (ValueError, KeyError) as e:  # incompatible optimizer layout
        import warnings
        warnings.warn('optimizer state in checkpoint does not match the '
                      f'current optimizer ({e}); starting it fresh')
        return template
