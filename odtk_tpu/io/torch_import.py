"""Bidirectional torch-state_dict <-> flax-variables name/layout mapping.

The checkpoint compatibility contract (SURVEY.md §3.5, odtk/model.py:217-258)
is expressed in torch naming: ``backbones.<Net>.features.layer1.0.conv1.weight``
etc. Our flax modules use the same hierarchy with numeric Sequential
indices flattened into the parent name (``layer1_0``), so the mapping is
a single reversible rule plus conv-kernel transposition:

  torch 'a.b.0.c.weight'      <->  flax path ('a', 'b_0', 'c') leaf kernel
  conv weight  [O, I/g, kh, kw]  <->  kernel [kh, kw, I/g, O]
  batchnorm    weight/bias/running_mean/running_var
               <->  frozen collection scale/bias/mean/var

This also covers plain torchvision backbone checkpoints (no
``backbones.<Net>.features`` prefix) via ``prefix=``.
"""

import numpy as np


def _merge_tokens(tokens):
    """['layer1', '0', 'conv1'] -> ['layer1_0', 'conv1'];
    the 'backbones.<Name>' prefix merges unconditionally."""
    out = []
    for i, t in enumerate(tokens):
        if out and (t.isdigit() or (len(out) == 1 and out[0] == 'backbones')):
            out[-1] = out[-1] + '_' + t
        else:
            out.append(t)
    return out


def _split_token(token):
    """'layer1_0' -> ['layer1', '0']; 'backbones_X' -> ['backbones', 'X'].

    The backbone NAME is one torch token even when it contains
    underscores and digits ('backbones.ResNeXt50_32x4dFPN.features...'),
    so it must come back out whole — splitting it per the numeric-
    Sequential rule mangled every ResNeXt checkpoint key."""
    if token.startswith('backbones_'):
        return ['backbones', token[len('backbones_'):]]
    parts = token.split('_')
    out = [parts[0]]
    for p in parts[1:]:
        if p.isdigit():
            out.append(p)
        else:
            out[-1] = out[-1] + '_' + p
    return out


def state_dict_to_variables(state_dict, template, partial=False):
    """Fill a flax variables template {'params':…, 'frozen':…} from a
    torch-style state_dict of numpy arrays. Returns (variables, report)
    where report lists unmatched torch keys and unfilled flax paths.
    With partial=True, unfilled template slots keep their init values
    (backbone-only loads)."""
    # Group torch keys by module path to detect batchnorm modules
    modules = {}
    for k, v in state_dict.items():
        if k.endswith('num_batches_tracked'):
            continue
        path, leaf = k.rsplit('.', 1)
        modules.setdefault(path, {})[leaf] = np.asarray(v)

    flat = {}
    for path, leaves in modules.items():
        fpath = tuple(_merge_tokens(path.split('.')))
        is_bn = 'running_mean' in leaves
        for leaf, arr in leaves.items():
            if is_bn:
                name = {'weight': 'scale', 'bias': 'bias',
                        'running_mean': 'mean', 'running_var': 'var'}[leaf]
                flat[('frozen',) + fpath + (name,)] = arr
            elif leaf == 'weight' and arr.ndim == 4:
                flat[('params',) + fpath + ('kernel',)] = arr.transpose(2, 3, 1, 0)
            elif leaf == 'weight' and arr.ndim == 2:   # linear (unused heads)
                flat[('params',) + fpath + ('kernel',)] = arr.T
            else:
                flat[('params',) + fpath + (leaf,)] = arr

    filled, missing = [], []

    def fill(tree, prefix):
        for k, v in tree.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                fill(v, p)
            elif p in flat:
                src = flat[p]
                if src.shape != v.shape:
                    missing.append(('shape-mismatch', p, src.shape, v.shape))
                else:
                    tree[k] = src.astype(np.asarray(v).dtype)
                    filled.append(p)
            else:
                missing.append(('unfilled', p))

    import jax
    template = jax.tree.map(lambda x: x, template)  # shallow copy pytree
    template = _to_mutable(template)
    for coll in list(template):
        fill(template[coll], (coll,))
    unmatched = [k for k in flat if k not in set(filled)]
    return template, {'missing': missing, 'unmatched': unmatched}


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    try:  # FrozenDict
        return {k: _to_mutable(v) for k, v in tree.items()}
    except AttributeError:
        return tree


def load_backbone_weights(model, backbone_name, path):
    """Initialize one backbone from a torchvision-format .pth state_dict
    (the model-zoo init of odtk/backbones/resnet.py:20-22, from a local
    file — this environment has no download path).

    Plain torchvision keys ('conv1.weight', 'layer1.0....',
    'features.3.conv.0.0....') are prefixed to our
    'backbones.<Name>.features.' namespace; classifier heads ('fc.*',
    'classifier.*') are dropped like the reference's unused_modules.
    Returns the fill report.
    """
    import torch
    raw = torch.load(path, map_location='cpu', weights_only=False)
    if isinstance(raw, dict) and 'state_dict' in raw:
        raw = raw['state_dict']
    prefix = f'backbones.{backbone_name}.features.'
    sd = {}
    for k, v in raw.items():
        if k.startswith(('fc.', 'classifier.')):
            continue
        arr = v.detach().numpy() if hasattr(v, 'detach') else np.asarray(v)
        sd[prefix + k] = arr
    filled, report = state_dict_to_variables(sd, model.variables,
                                             partial=True)
    if report['unmatched']:
        raise ValueError(
            f'{len(report["unmatched"])} tensors in {path} did not match '
            f'the {backbone_name} backbone, e.g. {report["unmatched"][:3]}')
    model.variables = filled
    return report


def variables_to_state_dict(variables):
    """flax variables -> torch-style {name: numpy array} state_dict."""
    out = {}

    def walk(tree, tokens, coll):
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, 'items'):
                walk(v, tokens + [k], coll)
                continue
            arr = np.asarray(v)
            toks = []
            for t in tokens:
                toks.extend(_split_token(t))
            if coll == 'frozen':
                leaf = {'scale': 'weight', 'bias': 'bias',
                        'mean': 'running_mean', 'var': 'running_var'}[k]
            elif k == 'kernel' and arr.ndim == 4:
                leaf, arr = 'weight', arr.transpose(3, 2, 0, 1)
            elif k == 'kernel' and arr.ndim == 2:
                leaf, arr = 'weight', arr.T
            else:
                leaf = k
            out['.'.join(toks + [leaf])] = np.ascontiguousarray(arr)

    for coll, tree in variables.items():
        walk(tree, [], coll)
    return out
