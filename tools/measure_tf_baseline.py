"""Measure the TF2-CPU reference baseline denominator (run once).

BASELINE.md: "measure the TF2 reference's train images/sec/chip on CPU for
ff_effnet, K=5, 448^2, batch 4 as the denominator". The reference itself
cannot run here (tensorflow_ranking and its datasets are absent), so this
script reconstructs its training step at the same config from the public
description (SURVEY.md §3.1-3.3) — without copying code:

* Keras EfficientNetB0(include_top=False) + the 5-stage skip-concat decoder
  (conv/BN/ReLU/upsample-x2, concat block6a/4a/3a expand activations, 1-ch
  head), BN-only-trainable encoder.
* ListMLE loss on gathered ranked pixels (sort by label + reverse
  logcumsumexp), Adam(amsgrad).
* Host-side per-image numpy info-score sampler (oversample 5x, chi^2 scoring)
  — the reference's tf.numpy_function bottleneck — timed and included in the
  per-step cost, exactly as it lands on the input pipeline's critical path
  when host threads can't hide it (single-GPU reference machines had it
  partially hidden; on CPU training it is fully exposed).

Writes baseline_measured.json {tf2_cpu_images_per_sec, parts...}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def numpy_info_score_sampler(gt, mask, rpi=100, k=5, factor=5, tau=0.03):
    """Reference-semantics host sampler (sampling.py:211-239), per image."""
    h, w = gt.shape
    ys, xs = np.nonzero(mask > 0)
    n = len(ys)
    cand = rpi * factor
    sel = np.random.randint(0, n, size=(cand, k))
    px, py = ys[sel], xs[sel]
    depths = gt[px, py]
    flat = (px * w + py).astype(np.float32)
    order = np.argsort(-depths, axis=1)
    depths = np.take_along_axis(depths, order, axis=1)
    flat = np.take_along_axis(flat, order, axis=1)
    lo, hi = gt.min() + 0.001, gt.max()
    expected = np.linspace(lo, hi, k + 1)[1:]
    score = -np.square(depths - expected).sum(axis=1) / expected.sum()
    ratio = (depths[:, :-1] + 1e-10) / (depths[:, 1:] + 1e-10)
    eq = (ratio < 1 + tau) & (ratio > 1 / (1 + tau))
    score -= 1000.0 * eq.sum(axis=1)
    top = np.argsort(-score)[:rpi]
    return np.stack([flat[top], depths[top]], axis=-1)


def build_effnet_model(tf, size):
    """Reconstruction of the reference ff_effnet graph (pl_hourglass.py:
    44-100) from its public description — without copying code."""
    from tensorflow.keras import layers

    inp = layers.Input((size, size, 3))
    enc = tf.keras.applications.EfficientNetB0(include_top=False, input_tensor=inp, weights=None)
    for layer in enc.layers:
        layer.trainable = isinstance(layer, layers.BatchNormalization)
    x = enc.output
    taps = [
        enc.get_layer("block6a_expand_activation").output,
        enc.get_layer("block4a_expand_activation").output,
        enc.get_layer("block3a_expand_activation").output,
        None,
        None,
    ]
    chans = [672, 240, 144, 32, 32]
    for tap, ch in zip(taps, chans):
        x = layers.Conv2D(ch, 3, padding="same")(x)
        x = layers.BatchNormalization()(x)
        x = layers.ReLU()(x)
        x = layers.UpSampling2D(interpolation="bilinear")(x)
        if tap is not None:
            x = layers.Concatenate()([x, tap])
    out = layers.Conv2D(1, 3, padding="same")(x)
    return tf.keras.Model(inp, out)


def build_redweb_model(size):
    """The reference ff_redweb graph itself (ResNet-50 + FeatureFusion
    decoder, redweb.py:402-434), built via tools/ref_models.py's import
    shims — the most faithful denominator available: the graph code IS the
    reference's, only the undownloadable ImageNet weights are random."""
    import ref_models

    model, _pre = ref_models.build_reference_model("ff_redweb", size)
    return model


def main():
    import tensorflow as tf

    tf.config.threading.set_intra_op_parallelism_threads(8)
    tf.config.threading.set_inter_op_parallelism_threads(8)

    size = int(os.environ.get("BASE_IMAGE_SIZE", 448))
    batch = int(os.environ.get("BASE_BATCH", 4))
    rpi, k = 100, 5
    steps = int(os.environ.get("BASE_STEPS", 3))
    model_name = os.environ.get("BASE_MODEL", "ff_effnet")

    if model_name == "ff_redweb":
        model = build_redweb_model(size)
    else:
        model = build_effnet_model(tf, size)

    if os.environ.get("BASE_MODE") == "infer":
        # Serving denominator: the reference's own pattern is per-image
        # model.predict in eval/active loops (test_data_eval.py:73-80,
        # active_learning_method.py:101) — measure exactly that.
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (1, size, size, 3)).astype(np.float32)
        _ = model.predict(img, verbose=0)  # build/compile
        n_i = int(os.environ.get("BASE_INFER_STEPS", 5))
        t0 = time.time()
        for _ in range(n_i):
            _ = model.predict(img, verbose=0)
        per_img = (time.time() - t0) / n_i
        result = {
            "images_per_sec": 1.0 / per_img,
            "per_image_s": per_img,
            "config": {"size": size, "model": model_name, "mode": "infer"},
        }
        path = os.path.abspath(os.path.join(
            os.path.dirname(__file__), "..", "baseline_measured.json"))
        out = {}
        if os.path.exists(path):
            with open(path) as f:
                out = json.load(f)
        out[f"tf2_cpu_infer_images_per_sec_{model_name}"] = result["images_per_sec"]
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps({"model": model_name, **result}))
        return

    opt = tf.keras.optimizers.Adam(1e-3, amsgrad=True)

    def listmle(labels, logits):
        # labels (B, RPI, K, 2); logits (B, H, W, 1)
        flat = tf.reshape(logits, [batch, -1])
        idx = tf.cast(labels[..., 0], tf.int32)
        scores = tf.gather(flat, tf.reshape(idx, [batch, -1]), batch_dims=1)
        scores = tf.reshape(scores, [-1, k])
        lse = tf.math.cumulative_logsumexp(scores[:, ::-1], axis=1)[:, ::-1]
        return tf.reduce_mean(tf.reduce_sum(lse - scores, axis=1))

    @tf.function
    def train_step(images, rankings):
        with tf.GradientTape() as tape:
            pred = model(images, training=True)
            loss = listmle(rankings, pred)
        tvars = model.trainable_variables
        grads = tape.gradient(loss, tvars)
        opt.apply_gradients(zip(grads, tvars))
        return loss

    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    gts = rng.uniform(0.05, 1, (batch, size, size)).astype(np.float32)
    masks = np.ones((batch, size, size), np.float32)

    # host sampling cost (per reference: inside tf.numpy_function per image)
    t0 = time.time()
    n_s = 3
    for _ in range(n_s):
        rankings = np.stack(
            [numpy_info_score_sampler(g, m, rpi, k) for g, m in zip(gts, masks)]
        ).astype(np.float32)
    sample_time = (time.time() - t0) / n_s

    # compile
    loss = train_step(tf.constant(images), tf.constant(rankings))
    t0 = time.time()
    for _ in range(steps):
        loss = train_step(tf.constant(images), tf.constant(rankings))
    _ = float(loss)
    step_time = (time.time() - t0) / steps

    ips = batch / (step_time + sample_time)
    result = {
        "images_per_sec": ips,
        "step_time_s": step_time,
        "host_sampling_time_s_per_batch": sample_time,
        "config": {"size": size, "batch": batch, "rpi": rpi, "k": k,
                   "model": model_name},
    }
    path = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "baseline_measured.json")
    )
    # merge: per-model denominators live side by side (bench.py reads the
    # top-level ff_effnet key; the ff_redweb one gives BASELINE config #2
    # its vs_baseline ratio)
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    if model_name == "ff_effnet":
        out.update(
            {
                "tf2_cpu_images_per_sec": ips,
                "step_time_s": step_time,
                "host_sampling_time_s_per_batch": sample_time,
                "config": result["config"],
            }
        )
    else:
        out[f"tf2_cpu_images_per_sec_{model_name}"] = ips
        out[f"detail_{model_name}"] = result
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"model": model_name, **result}))


if __name__ == "__main__":
    main()
