"""In-graph color math for the transfer-thin feeds.

The host→device link is the scarce resource on tunnel/DCN-fed chips
(measured 41 MB/s on the axon tunnel vs 66 ms/step of compute), so the
loaders ship raw u8 pixels or YUV420 planes and the pixel math that
the reference does on the host/DALI (normalize, color jitter,
colorspace) runs here, inside the training/inference graph, fused by
XLA into the consumers. Kept dependency-free of model/train so every
workflow can import it.
"""

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def apply_color_affine(images_u8, colors, sizes):
    """Per-image color affine on u8 pixels + pad masking.

    ``colors`` [B, 3, 4]: each image's folded jitter+normalize affine
    (data/coco.color_affine) — [:, :, :3] the matrix, [:, :, 3] the
    offset. ``sizes`` [B, 2]: valid (h, w) extents; canvas padding is
    zeroed in NORMALIZED space, exactly like the f32 feed's collation.
    Written as 3 unrolled multiply-adds (K=3 'matmul' on the VPU, fused
    with the u8 cast and the clip/mask) rather than an einsum the
    compiler might route through a 3/128-utilized MXU pass.
    """
    x = images_u8.astype(jnp.float32)
    t = colors[:, :, :3][:, None, None]        # [B, 1, 1, 3(c), 3(d)]
    y = (x[..., 0:1] * t[..., 0, :] + x[..., 1:2] * t[..., 1, :]
         + x[..., 2:3] * t[..., 2, :]) + colors[:, None, None, :, 3]
    lo = jnp.asarray((0.0 - IMAGENET_MEAN) / IMAGENET_STD)
    hi = jnp.asarray((1.0 - IMAGENET_MEAN) / IMAGENET_STD)
    y = jnp.clip(y, lo, hi)
    return _mask_valid(y, images_u8.shape[1:3], sizes)


def apply_color_affine_yuv(y_u8, cbcr_u8, colors, sizes):
    """YUV420 feed assembly: nearest-upsample the chroma plane 2x,
    stack with luma, and run the SAME per-image affine — the loader
    already folded YCbCr->RGB into ``colors`` (fold_yuv_affine), so
    colorspace conversion costs nothing extra in-graph. 1.5 B/px over
    the link: half the u8 feed, 8x less than f32."""
    c = jnp.repeat(jnp.repeat(cbcr_u8, 2, axis=1), 2, axis=2)
    yuv = jnp.concatenate([y_u8[..., None], c], axis=-1)
    return apply_color_affine(yuv, colors, sizes)


def eval_normalize_yuv(y_u8, cbcr_u8, sizes):
    """Constant normalization for the yuv420 EVAL feed: assemble the
    planes and run one constant affine with YCbCr->RGB folded in
    (1.5 B/px over the link — half the u8 eval feed). Slightly lossy
    vs u8 (chroma 2x2-averaged, like the JPEG itself); measured AP
    deltas are recorded in INFERENCE.md."""
    # fold rgb-normalize through the YUV->RGB matrix at trace time
    from ..data.loader import fold_yuv_affine

    t = np.diag(1.0 / (255.0 * IMAGENET_STD)).astype(np.float32)
    off = (-IMAGENET_MEAN / IMAGENET_STD).astype(np.float32)
    colors = fold_yuv_affine(
        np.concatenate([t, off[:, None]], axis=1)[None])
    b = y_u8.shape[0]
    colors = jnp.broadcast_to(jnp.asarray(colors), (b, 3, 4))
    return apply_color_affine_yuv(y_u8, cbcr_u8, colors, sizes)


def eval_normalize_u8(images_u8, sizes):
    """Constant ImageNet normalization for the u8 EVAL feed: u8 pixels
    -> (x/255 - mean)/std with canvas padding zeroed (identical to the
    f32 eval loader's output). No jitter, so the affine is one shared
    constant — no per-image colors cross the link."""
    x = images_u8.astype(jnp.float32)
    scale = jnp.asarray(1.0 / (255.0 * IMAGENET_STD))
    off = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD)
    return _mask_valid(x * scale + off, images_u8.shape[1:3], sizes)


def _mask_valid(y, hw, sizes):
    h, w = hw
    valid = ((jnp.arange(h)[None, :, None] < sizes[:, 0, None, None])
             & (jnp.arange(w)[None, None, :] < sizes[:, 1, None, None]))
    return y * valid[..., None].astype(y.dtype)
