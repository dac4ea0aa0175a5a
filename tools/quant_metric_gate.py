"""Metric-gated int8 serving: measure metric deltas of the int8 graph vs
the float (bn_fold) serving graph on a TRAINED model, over the synthetic
eval protocol.

The repo's evidentiary bar for serving-graph changes is metric-level (cf.
bn_fold, exact by construction, tests/test_bn_fold.py). int8 PTQ is not
exact, so the question "does +7.4% throughput cost accuracy?" is answered
here with the reference's own metric suite (pldepth/active_learning/
metrics.py definitions, reimplemented in eval/metrics.py): ordinal error
(5k pairs, seed 10), WHDR(tau=0.03), NDCG@200 (seed 69), and the depth
edge metrics (boundary, completeness).

Protocol:
  * trained weights (the synthetic-convergence runbook run, or --train)
  * >=100 held-out synthetic images (seed 123 — never seen in training)
  * calibration on 2 batches of seed-7 synthetic images (training
    distribution, disjoint from the eval set: no calibration leakage)
  * per-image metrics vs ground truth for both graphs; paired deltas

Run from the repo root (TPU):
  python -u tools/quant_metric_gate.py <weights.npz|train> \
      [--model ff_effnet] [--n 104] [--size 448] [--out results.json]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Gate budget: int8 serving becomes the default only if the QUALITY LOSS
# on every GATING metric stays inside these (VERDICT r03 asked for a
# stated budget; ordinal-error's is the one it named). The gate is
# directional — an int8 result *better* than float passes at any
# magnitude (observed: ff_redweb WHDR -0.0033, an improvement). Edge
# metrics are Canny-threshold-sensitive and noisier per image, hence the
# looser bar. Orientation: +1 = higher is worse, -1 = higher is better.
#
# ndcg_200 is ADVISORY (reported, never gates): under the reference's
# both-sorted quirk it measures similarity of sorted VALUE distributions,
# not ranking agreement (eval/metrics.py ndcg_at_k docstring) — and a
# relative-depth model's output is only defined up to a monotone
# transform, so a small int8 value-scale shift (observed -0.015 on scenes
# with ordinal/WHDR deltas ~0) is not a deployment-relevant quality loss.
# The reference's own primary metric is ordinal error
# (test_data_eval.py:95-102 logs it as test_error; DCG is secondary).
BUDGET = {
    "ordinal_error": (0.002, +1),
    "whdr_003": (0.002, +1),
    # the reference edge metric scores aligned edges ~1, displaced ~0
    # (eval/metrics.py depth_edge_metric quirk note) -> higher is better
    "edge_boundary": (0.02, -1),
    "edge_completeness": (0.02, -1),
}
ADVISORY = {
    "ndcg_200": (0.005, -1),
}


def _make_ds(dataset, n, size, seed):
    """'scenes' (default): piecewise-smooth depth with true occlusion
    boundaries (data/scenes.py) — the edge metrics are DEFINED on it, so
    the gate's edge rows carry signal instead of 'no valid images'
    (VERDICT r04). 'synthetic': the original smooth fields."""
    from pldepth_tpu.data import SceneDepthDataset, SyntheticDepthDataset

    factory = SceneDepthDataset if dataset == "scenes" else SyntheticDepthDataset
    return factory(n=n, image_size=size, seed=seed)


def _train(cfg_kwargs, dataset="scenes", epochs=5, seed=0):
    """The synthetic-convergence runbook config (docs/BENCH.md) in-process:
    N epochs over 128 images via the resident production path. ``seed``
    selects the training corpus (drive_qenc's self-pretrain stage uses a
    disjoint seed so pretraining and gate-training see different images)."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import build_resident_store
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(
        epochs=epochs, batch_size=8, ds_size=128, initial_lr=0.01,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
        data_resident=True, resident_chain_steps=8, **cfg_kwargs,
    )
    trainer = Trainer(cfg, steps_per_epoch=cfg.ds_size // cfg.batch_size)
    state = trainer.init_state()
    ds = _make_ds(dataset, cfg.ds_size, cfg.input_size, seed=seed)
    if cfg.qenc == "int8":
        calib = np.stack([ds[i]["image"] for i in range(cfg.batch_size)])
        trainer.prepare_qenc(state, calib)
    store = build_resident_store(ds, trainer.mesh)
    steps = cfg.epochs * (cfg.ds_size // cfg.batch_size)
    chain = trainer.resident_chain(cfg.resident_chain_steps)
    import jax

    n_chains = steps // cfg.resident_chain_steps
    for i in range(n_chains):
        state, m = chain(state, store.arrays)
        if i % 2 == 1:
            jax.block_until_ready(m.loss)
        if i == 0 or i == n_chains - 1:
            print(f"# train chain {i}: loss {np.mean(jax.device_get(m.loss)):.4f}",
                  flush=True)
    return trainer, state


def run_gate(model="ff_effnet", size=448, n=104, batch=8, dataset="scenes",
             weights="train", train_epochs=5, save_weights=""):
    """The full gate protocol; returns the result dict (see module doc).

    Importable — bench.py runs this as a standing per-round artifact
    (VERDICT r04 #3: the TPU-emitter failure mode was guarded by someone
    remembering to run this tool; now every bench run re-checks the
    serving default's accuracy on the attached chip/runtime).
    """
    import jax

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.eval.metrics import (
        depth_edge_metric, ndcg_at_k, ordinal_error, whdr,
    )
    from pldepth_tpu.train import Trainer

    if weights == "train":
        trainer, state = _train(
            dict(model_name=model, input_size=size),
            dataset=dataset, epochs=train_epochs,
        )
        if save_weights:
            from pldepth_tpu.train.checkpoint import save_weights_npz

            save_weights_npz(save_weights, state)
            print(f"# trained weights saved to {save_weights}")
    else:
        from pldepth_tpu.train.checkpoint import load_weights_npz

        cfg = ExperimentConfig(
            model_name=model, input_size=size,
            batch_size=batch, ranking_size=5, rankings_per_image=100,
            sampling_type=1,
        )
        trainer = Trainer(cfg, steps_per_epoch=1)
        state = load_weights_npz(weights, trainer.init_state())

    bs = batch
    n = (n // bs) * bs
    ds = _make_ds(dataset, n, size, seed=123)
    imgs = np.stack([ds[i]["image"] for i in range(n)])
    gts = np.stack([ds[i]["gt"] for i in range(n)])

    calib_ds = _make_ds(dataset, 2 * bs, size, seed=7)
    calib = [
        np.stack([calib_ds[i]["image"] for i in range(s, s + bs)])
        for s in range(0, 2 * bs, bs)
    ]
    qvars = trainer.prepare_quant(state, calib)

    f_float = trainer.jit_predict(fused="bn_fold")
    f_quant = trainer.jit_predict(fused="quant")
    rows = {"float": [], "int8": []}
    for s in range(0, n, bs):
        chunk = imgs[s : s + bs]
        for name, pred in (
            ("float", jax.device_get(f_float(state, chunk))),
            ("int8", jax.device_get(f_quant(qvars, chunk))),
        ):
            pred = np.asarray(pred, np.float32)
            for j in range(pred.shape[0]):
                p, g = pred[j], gts[s + j]
                eb, ec = depth_edge_metric(p, g)
                rows[name].append({
                    "ordinal_error": ordinal_error(p, g),
                    "whdr_003": whdr(p, g, tau=0.03),
                    "ndcg_200": ndcg_at_k(p, g, 200),
                    "edge_boundary": eb,
                    "edge_completeness": ec,
                })
        print(f"# evaluated {s + bs}/{n}", flush=True)

    result = {"model": model, "size": size, "n_images": n,
              "dataset": dataset, "weights": weights,
              "metrics": {}, "pass": True}
    for metric in {**BUDGET, **ADVISORY}:
        # Edge metrics are NaN on images where auto-Canny finds no edges in
        # one of the maps (0/0 in the reference formula, metrics.py:123-144;
        # common on smooth synthetic depth). Pair-exclude those images —
        # the DELTA between graphs is what is gated, so both sides must be
        # defined on the same image set.
        vf = np.array([r[metric] for r in rows["float"]], np.float64)
        vq = np.array([r[metric] for r in rows["int8"]], np.float64)
        valid = np.isfinite(vf) & np.isfinite(vq)
        n_valid = int(valid.sum())
        if n_valid == 0:
            result["metrics"][metric] = {"n_valid": 0, "pass": True,
                                         "note": "no valid images"}
            continue
        mf = float(vf[valid].mean())
        mq = float(vq[valid].mean())
        delta = mq - mf
        per_img = vq[valid] - vf[valid]  # paired per-image deltas
        advisory = metric in ADVISORY
        budget, orient = (ADVISORY if advisory else BUDGET)[metric]
        quality_loss = delta * orient  # positive = int8 is worse
        ok = quality_loss <= budget
        result["metrics"][metric] = {
            "float": round(mf, 5), "int8": round(mq, 5),
            "delta": round(delta, 5),
            "quality_loss": round(quality_loss, 5), "budget": budget,
            "delta_abs_p95": round(float(np.percentile(np.abs(per_img), 95)), 5),
            "n_valid": n_valid,
            "pass": ok,
            **({"advisory": True} if advisory else {}),
        }
        if not advisory:
            result["pass"] = result["pass"] and ok
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", help="weights.npz path or 'train'")
    ap.add_argument("--model", default="ff_effnet")
    ap.add_argument("--n", type=int, default=104)
    ap.add_argument("--size", type=int, default=448)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dataset", default="scenes",
                    choices=["scenes", "synthetic"])
    ap.add_argument("--train_epochs", type=int, default=5)
    ap.add_argument("--out", default="")
    ap.add_argument("--save_weights", default="",
                    help="with 'train': save the trained weights here for "
                         "later reuse")
    args = ap.parse_args()

    from pldepth_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    result = run_gate(
        model=args.model, size=args.size, n=args.n, batch=args.batch,
        dataset=args.dataset, weights=args.weights,
        train_epochs=args.train_epochs, save_weights=args.save_weights,
    )
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
