"""int8 PTQ accuracy on a TRAINED model (vs the random-init worst case).

Loads trained weights, runs bn_fold and int8 serving on held-out
synthetic images, and reports prediction agreement plus the metric that
matters: ordinal error of each graph against ground truth.

Run from the repo root:
  python -u tools/drive_quant_acc.py <weights.npz> [n_images]
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from pldepth_tpu.core.cache import enable_compilation_cache
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import SyntheticDepthDataset
    from pldepth_tpu.eval.metrics import ordinal_error
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import load_weights_npz

    enable_compilation_cache()
    weights = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    size = int(os.environ.get("QA_SIZE", 448))
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=size, batch_size=8,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
    )
    t = Trainer(cfg, steps_per_epoch=1)
    state = t.init_state()
    if weights != "none":
        state = load_weights_npz(weights, state)

    # held-out images: a seed the training run never saw
    ds = SyntheticDepthDataset(n=n, image_size=size, seed=123)
    imgs = np.stack([ds[i]["image"] for i in range(n)])
    gts = np.stack([ds[i]["gt"] for i in range(n)])

    qvars = t.prepare_quant(state, imgs[: cfg.batch_size])
    p_f, p_q = [], []
    for s in range(0, n, cfg.batch_size):
        chunk = imgs[s : s + cfg.batch_size]
        p_f.append(np.asarray(jax.device_get(
            t.jit_predict(fused="bn_fold")(state, chunk)), np.float32))
        p_q.append(np.asarray(jax.device_get(
            t.jit_predict(fused="quant")(qvars, chunk)), np.float32))
    p_f, p_q = np.concatenate(p_f), np.concatenate(p_q)

    pearson = float(np.corrcoef(p_f.ravel(), p_q.ravel())[0, 1])
    denom = max(float(np.abs(p_f).max()), 1e-9)
    max_rel = float(np.abs(p_f - p_q).max() / denom)
    err_f = float(np.mean([
        ordinal_error(p_f[i], gts[i]) for i in range(n)
    ]))
    err_q = float(np.mean([
        ordinal_error(p_q[i], gts[i]) for i in range(n)
    ]))
    print(json.dumps({
        "n_images": n, "pearson": round(pearson, 5),
        "max_rel": round(max_rel, 4),
        "ordinal_err_bnfold": round(err_f, 5),
        "ordinal_err_int8": round(err_q, 5),
    }))


if __name__ == "__main__":
    main()
