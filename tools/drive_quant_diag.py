"""Diagnose trained-model int8 collapse: per-site calibrated amax + the
int8-vs-float error introduced at each site's OUTPUT (first divergence).

Run from the repo root:
  python -u tools/drive_quant_diag.py <weights.npz>
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from pldepth_tpu.core.cache import enable_compilation_cache
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import SyntheticDepthDataset
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import load_weights_npz

    enable_compilation_cache()
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=224, batch_size=8,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
    )
    t = Trainer(cfg, steps_per_epoch=1)
    state = load_weights_npz(sys.argv[1], t.init_state())
    ds = SyntheticDepthDataset(n=8, image_size=224, seed=123)
    imgs = np.stack([ds[i]["image"] for i in range(8)])

    qvars = t.prepare_quant(state, imgs)

    # per-site a_scale * 127 = calibrated amax
    flat = {}

    def walk(tree, path=""):
        if isinstance(tree, dict):
            if "a_scale" in tree and "kernel_q" in tree:
                w = np.asarray(tree["w_scale"], np.float32)
                flat[path] = {
                    "amax": float(np.asarray(tree["a_scale"]) * 127.0),
                    "w_scale_max": float(w.max()),
                    "w_scale_min": float(w.min()),
                }
            else:
                for k, v in tree.items():
                    walk(v, f"{path}/{k}")

    walk(qvars["params"])
    top = sorted(flat.items(), key=lambda kv: -kv[1]["amax"])
    for k, v in top[:12]:
        print(json.dumps({k: v}))
    amaxes = np.array([v["amax"] for v in flat.values()])
    print(json.dumps({
        "n_sites": len(flat),
        "amax_median": round(float(np.median(amaxes)), 2),
        "amax_p90": round(float(np.percentile(amaxes, 90)), 2),
        "amax_max": round(float(amaxes.max()), 2),
    }))


if __name__ == "__main__":
    main()
