"""Backbone registry — named constructors mirroring the reference set
(odtk/backbones/fpn.py:63-93, resnet.py:41-47): ResNet{18,34,50,101,152}FPN,
ResNeXt{50_32x4d,101_32x8d}FPN, MobileNetV2FPN, ResNet{18,34}C4.
"""

from .registry import register, build, available
from . import fpn as _fpn      # noqa: F401  (registers FPN nets)
from . import resnet as _rn    # noqa: F401  (registers C4 nets)

# re-export constructors for getattr()-style access like the reference
from .registry import REGISTRY as _REG
globals().update(_REG)

__all__ = ['register', 'build', 'available'] + list(_REG)
