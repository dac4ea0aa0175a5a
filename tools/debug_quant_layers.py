"""Find the first layer where int8 serving diverges from the float graph.

Trains ff_smoke briefly (so activations have trained statistics), then
compares calib-mode (float activations) vs int8-mode intermediates site
by site via flax capture_intermediates. CPU-friendly.

Run from the repo root: python -u tools/debug_quant_layers.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if not os.environ.get("DBG_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
    from pldepth_tpu.data.preprocess import normalize_images
    from pldepth_tpu.train import Trainer

    S = int(os.environ.get("DBG_SIZE", 64))
    model = os.environ.get("DBG_MODEL", "ff_smoke")
    dtype = os.environ.get("DBG_DTYPE", "float32")
    cfg = ExperimentConfig(
        model_name=model, input_size=S, batch_size=4, ranking_size=3,
        rankings_per_image=8, sampling_type=1, compute_dtype=dtype,
        initial_lr=1e-2,
    )
    t = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    state = t.init_state()
    weights = os.environ.get("DBG_WEIGHTS", "")
    if weights:
        from pldepth_tpu.train.checkpoint import load_weights_npz

        state = load_weights_npz(weights, state)
        print(f"loaded {weights}", flush=True)
    else:
        ds = SyntheticDepthDataset(n=16, image_size=S, seed=0)
        it = BatchIterator(ds, 4, seed=0)
        steps = int(os.environ.get("DBG_STEPS", 30))
        for i in range(steps):
            state, m = t.train_step(state, t.shard_batch(next(it)))
        it.close()
        print(f"trained {steps} steps, loss={float(m.loss):.4f}", flush=True)

    val = SyntheticDepthDataset(n=4, image_size=S, seed=123)
    imgs = np.stack([val[i]["image"] for i in range(4)])
    qvars = t.prepare_quant(state, imgs)
    x = normalize_images(jnp.asarray(imgs, jnp.float32), t.model.preprocess)

    def run(mode):
        mod = t.model.module.clone(quant=mode)
        out, inter = mod.apply(
            {"params": qvars["params"]}, x, False,
            capture_intermediates=True,
            mutable=["intermediates", "quant_calib"],
        )
        flat = {}

        def walk(tree, path=""):
            if isinstance(tree, dict):
                for k, v in tree.items():
                    walk(v, f"{path}/{k}")
            elif isinstance(tree, (tuple, list)):
                for i, v in enumerate(tree):
                    walk(v, path if len(tree) == 1 else f"{path}[{i}]")
            else:
                flat[path] = np.asarray(tree, np.float32)

        walk(inter["intermediates"])
        return np.asarray(out, np.float32), flat

    out_c, inter_c = run("calib")
    out_q, inter_q = run("int8")

    rows = []
    for k in inter_c:
        if k not in inter_q:
            continue
        a, b = inter_c[k], inter_q[k]
        if a.shape != b.shape or a.size < 10:
            continue
        pr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
        rows.append((k, pr, float(a.std()), float(b.std())))
    rows.sort(key=lambda r: r[0])
    for k, pr, sa, sb in rows:
        flag = "  <-- DIVERGES" if pr < 0.95 else ""
        print(f"{pr: .4f}  std {sa:10.4f} -> {sb:10.4f}  {k}{flag}")
    print(json.dumps({
        "out_pearson": float(np.corrcoef(out_c.ravel(), out_q.ravel())[0, 1]),
    }))


if __name__ == "__main__":
    main()
