"""Model comparison walkthrough (the reference's data_sampling.ipynb role).

Loads two trained weight exports, renders side-by-side depth predictions and
prints the metric table the notebook prototyped (ordinal error, WHDR(0.03),
NDCG@200, depth-edge metrics — promoted in the reference from the notebook
into active_learning/metrics.py).

Usage:
  python examples/compare_models.py --weights_a runs/a/weights.npz \
      --weights_b runs/b/weights.npz [--dataset synthetic] [--n 6]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights_a", required=True)
    ap.add_argument("--weights_b", required=True)
    ap.add_argument("--model_name", default="ff_effnet")
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--input_size", type=int, default=224)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--out", default="compare_models.png")
    args = ap.parse_args()

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import get_dataset
    from pldepth_tpu.eval.evaluator import Evaluator
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import load_weights_npz

    cfg = ExperimentConfig(model_name=args.model_name, input_size=args.input_size)
    trainer = Trainer(cfg, steps_per_epoch=1)
    base = trainer.init_state()
    state_a = load_weights_npz(args.weights_a, base)
    state_b = load_weights_npz(args.weights_b, base)

    kwargs = dict(target_size=args.input_size)
    if args.data_root:
        kwargs["root"] = args.data_root
    ds = get_dataset(args.dataset, size=max(args.n, 8), **kwargs)

    for name, st in [("A", state_a), ("B", state_b)]:
        report = Evaluator(trainer, st).full_report(ds, limit=args.n)
        print(f"model {name}: {report}")

    # side-by-side panel: input | gt | pred A | pred B
    import jax
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    predict = jax.jit(trainer.predict)
    items = [ds[i] for i in range(args.n)]
    images = np.stack([s["image"] for s in items])
    pa = np.asarray(predict(state_a, images))
    pb = np.asarray(predict(state_b, images))

    fig, axes = plt.subplots(args.n, 4, figsize=(10, 2.4 * args.n))
    for i in range(args.n):
        for j, (arr, title) in enumerate(
            [(items[i]["image"], "input"), (items[i]["gt"], "gt"),
             (pa[i], "pred A"), (pb[i], "pred B")]
        ):
            ax = axes[i, j] if args.n > 1 else axes[j]
            ax.imshow(np.squeeze(arr), cmap=None if j == 0 else "viridis")
            ax.set_axis_off()
            if i == 0:
                ax.set_title(title)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
