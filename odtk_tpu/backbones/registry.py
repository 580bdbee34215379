"""Tiny named-constructor registry (mirrors odtk/backbones/utils.py:4-9)."""

REGISTRY = {}


def register(fn):
    REGISTRY[fn.__name__] = fn
    return fn


def build(arch, **kwargs):
    if arch not in REGISTRY:
        raise KeyError(f'Unknown backbone {arch!r}; available: {available()}')
    return REGISTRY[arch](**kwargs)


def available():
    return sorted(REGISTRY)
