"""Split the trained-model int8 collapse: weight error vs activation error.

p_bn    — bn_fold float serving (reference graph)
p_calib — calib-mode graph: int8-dequantized WEIGHTS, float activations
p_q     — full int8 (weights + activations)

pearson(p_bn, p_calib) isolates weight quantization;
pearson(p_calib, p_q) isolates activation quantization.

Run from the repo root:
  python -u tools/drive_quant_split.py <weights.npz>
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
    from pldepth_tpu.data.preprocess import normalize_images
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import load_weights_npz

    enable_compilation_cache()
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=448, batch_size=8,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
    )
    t = Trainer(cfg, steps_per_epoch=1)
    state = load_weights_npz(sys.argv[1], t.init_state())
    ds = SyntheticDepthDataset(n=8, image_size=448, seed=123)
    imgs = np.stack([ds[i]["image"] for i in range(8)])

    qvars = t.prepare_quant(state, imgs)
    p_bn = np.asarray(jax.device_get(
        t.jit_predict(fused="bn_fold")(state, imgs)), np.float32)
    p_q = np.asarray(jax.device_get(
        t.jit_predict(fused="quant")(qvars, imgs)), np.float32)

    calib_module = t.model.module.clone(quant="calib")

    @jax.jit
    def calib_fwd(p, x):
        out, _ = calib_module.apply(
            {"params": p}, x, False, mutable=["quant_calib"]
        )
        return out

    x = normalize_images(jnp.asarray(imgs, jnp.float32), t.model.preprocess)
    p_c = np.asarray(jax.device_get(calib_fwd(qvars["params"], x)),
                     np.float32)
    if p_c.ndim == 4:
        p_c = p_c[..., 0]

    def pear(a, b):
        return round(float(np.corrcoef(a.ravel(), b.ravel())[0, 1]), 5)

    print(json.dumps({
        "pearson_bnfold_vs_weightonly": pear(p_bn, p_c),
        "pearson_weightonly_vs_int8": pear(p_c, p_q),
        "pearson_bnfold_vs_int8": pear(p_bn, p_q),
        "std_bnfold": round(float(p_bn.std()), 5),
        "std_weightonly": round(float(p_c.std()), 5),
        "std_int8": round(float(p_q.std()), 5),
    }))


if __name__ == "__main__":
    main()
