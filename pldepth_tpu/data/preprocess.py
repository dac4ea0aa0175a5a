"""On-device batch preprocessing: normalization + augmentation.

Runs inside the jitted train step (HBM-resident, fused by XLA) instead of the
reference's host-side ``tf.data`` maps (pldepth/PLDepth.py:169-173,
pldepth/data/providers/hourglass_provider.py:34-51).

Normalization families:

* ``effnet`` — ImageNet mean/std channel normalization of [0,1] inputs (the
  torch/imagenet convention EfficientNet was trained with).
  NOTE a deliberate deviation: the reference feeds [0,1] images into a Keras
  EfficientNet whose internal Rescaling layer divides by 255 *again*
  (DAO /255 at pldepth/data/data_meta.py:39-43 + Keras-internal rescale),
  i.e. it trains on inputs in [0, 0.004]. That double-rescale is an artifact,
  not a feature; we normalize once, correctly.
* ``caffe`` — Keras ResNet50 preprocess_input semantics: RGB->BGR, x*255
  minus ImageNet channel means (pldepth/models/redweb.py:409).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CAFFE_MEAN_BGR = (103.939, 116.779, 123.68)


def normalize_images(images: jax.Array, mode: str) -> jax.Array:
    """Normalize a [0,1]-ranged NHWC image batch for the given backbone."""
    images = images.astype(jnp.float32)
    if mode == "effnet":
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        return (images - mean) / std
    if mode == "caffe":
        bgr = images[..., ::-1] * 255.0
        return bgr - jnp.asarray(CAFFE_MEAN_BGR, jnp.float32)
    if mode == "none":
        return images
    raise ValueError(f"unknown normalization mode {mode!r}")


def random_flip_batch(key: jax.Array, images, gts, masks):
    """Per-sample horizontal flip (reference augment_fn,
    hourglass_provider.py:34-51), vectorized over the batch on device."""
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0],))

    def sel(flag, flipped, orig):
        shape = (-1,) + (1,) * (orig.ndim - 1)
        return jnp.where(flag.reshape(shape), flipped, orig)

    images = sel(flip, images[:, :, ::-1, :], images)
    gts = sel(flip, gts[:, :, ::-1], gts)
    masks = sel(flip, masks[:, :, ::-1], masks)
    return images, gts, masks
