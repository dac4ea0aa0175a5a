"""pldepth_tpu — a TPU-native JAX framework for listwise-ranking monocular depth.

A from-scratch rebuild of the capabilities of the PLDepth reference
(monocular relative depth estimation trained with Plackett-Luce / ListMLE
ranking losses; reference: Lienen et al., CVPR 2021), designed TPU-first:

* the data path decodes on the host once and does everything else
  (resize, augmentation, ranking sampling, gathers) on device inside one
  jitted train step (the reference ran its samplers as per-image Python
  inside ``tf.numpy_function`` — its main bottleneck),
* the Plackett-Luce ListMLE loss is a fused Pallas TPU kernel with a
  custom VJP (reference: ``tensorflow_ranking`` graph ops),
* the EfficientNet / ResNet fully-fledged encoder-decoders are Flax
  modules compiled by XLA in bfloat16 on the MXU,
* scaling is expressed with ``jax.sharding`` over a device mesh (the
  reference was strictly single-device Keras ``fit``).

Package map (see SURVEY.md for the reference inventory each part covers):

=================  ==========================================================
``core``           config dataclasses + CLI plumbing, RNG, mesh setup
``data``           host decode (jpg/png/npy/mat/h5), dataset registry,
                   packed-cache format + native reader, device preprocessing
``sampling``       vectorized on-device depth-to-ranking samplers
``ops``            Pallas/XLA compute kernels (ListMLE, resize, edges)
``models``         Flax encoders (EfficientNet-B0..B7, ResNet-50) + decoders
``train``          the single Trainer, schedules, checkpointing
``eval``           ordinal error / WHDR, NDCG, depth-edge metrics, zero-shot
``active``         edge-disagreement active learning
``sweep``          hyperparameter search adapters
``obs``            logging / profiling
=================  ==========================================================
"""

__version__ = "0.1.0"
