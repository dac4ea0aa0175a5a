"""Drive: qenc quality gate — does the +77% serving-style-encoder train
step (qenc=bf16, docs/BENCH.md) cost accuracy?

Protocol (mirrors the quant gate's convergence run): the standing 5-epoch
/ 128-image / 448^2 resident-chain training run on structured scenes
(tools/quant_metric_gate.py _train), once per variant:

  base        — reference freezing (encoder BN affine trains, stats update)
  qenc=bf16   — encoder fully frozen, BN-folded serving forward in-step
  [qenc=int8] — optional (QENC_INT8=1): int8 serving encoder forward

then identical held-out eval (104 scene images, seed 123): ordinal error,
WHDR(0.03), NDCG@200, edge metrics. The probe is architecture-identical at
inference time — only the training dynamics differ — so plain metric
deltas on the same held-out set are the right gate.

Run from the repo root (TPU): python -u tools/drive_qenc.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(2400, repeat=True)


def self_pretrain(epochs: int, out_path: str = "/tmp/qenc_pretrained_backbone.npz"):
    """Instantiate qenc's premise (a PRETRAINED frozen encoder) inside this
    offline environment: train the FULL model — encoder kernels trainable
    (freeze_encoder=False) — on a DISJOINT scenes corpus (seed 777; the gate
    trains on seed 0 and evaluates on seed 123), then export only the encoder
    subtree as a backbone .npz in models/pretrained.load_backbone's layout.

    This is the in-environment analogue of the reference's ImageNet→HR-WSI
    transfer (pl_hourglass.py:48 downloads ImageNet weights, :53-57 freezes
    the encoder): pretrain corpus and target corpus are disjoint draws from
    the same world, the encoder arrives with useful depth features, and the
    gate then measures whether fully freezing it (qenc) costs accuracy
    relative to the reference's BN-affine-trainable freezing.
    """
    import jax

    from quant_metric_gate import _train

    t0 = time.time()
    trainer, state = _train(
        dict(model_name="ff_effnet", input_size=448, freeze_encoder=False),
        dataset="scenes", epochs=epochs, seed=777,
    )
    from pldepth_tpu.models.pretrained import save_backbone

    n = save_backbone(
        out_path, jax.device_get(state.params),
        jax.device_get(state.batch_stats),
        prefixes=("params/encoder/", "batch_stats/encoder/"),
    )
    print(json.dumps({
        "self_pretrain": {"epochs": epochs, "seed": 777,
                          "encoder_tensors": n,
                          "wall_s": round(time.time() - t0, 1),
                          "path": out_path},
    }), flush=True)
    return out_path


def run_variant(qenc: str, trainer_seed: int = 0):
    import jax

    from quant_metric_gate import _make_ds, _train

    t0 = time.time()
    # 5 epochs (the quant gate's budget) leaves scenes training at
    # near-chance ordinal error (~0.49, loss 4.96->4.59) — scenes are much
    # harder than the smooth fields. The gate needs a CONVERGED base to
    # compare against; 40 epochs is ~640 steps ≈ a minute of device time.
    epochs = int(os.environ.get("QENC_EPOCHS", 40))
    kwargs = dict(model_name="ff_effnet", input_size=448, qenc=qenc,
                  seed=trainer_seed)
    if os.environ.get("QENC_PRETRAINED"):
        # The decisive configuration: qenc's premise is a PRETRAINED
        # frozen encoder (the reference's ImageNet workflow). At random
        # init the gate measures 0.536-vs-0.326 ordinal error against
        # base — decoder-only training has nothing to stand on. Re-run
        # with QENC_PRETRAINED=<backbone.npz> where weights exist.
        kwargs["pretrained_path"] = os.environ["QENC_PRETRAINED"]
    trainer, state = _train(kwargs, dataset="scenes", epochs=epochs)
    train_s = time.time() - t0

    from pldepth_tpu.eval.metrics import (
        depth_edge_metric, ndcg_at_k, ordinal_error, whdr,
    )

    bs = 8
    n = 104 // bs * bs
    ds = _make_ds("scenes", n, 448, seed=123)
    predict = trainer.jit_predict()
    rows = []
    for s in range(0, n, bs):
        imgs = np.stack([ds[i]["image"] for i in range(s, s + bs)])
        preds = np.asarray(jax.device_get(predict(state, imgs)), np.float32)
        for j in range(bs):
            p, g = preds[j], ds[s + j]["gt"]
            eb, ec = depth_edge_metric(p, g)
            rows.append(
                {
                    "ordinal_error": ordinal_error(p, g),
                    "whdr_003": whdr(p, g, tau=0.03),
                    "ndcg_200": ndcg_at_k(p, g, 200),
                    "edge_boundary": eb,
                    "edge_completeness": ec,
                }
            )
    out = {"variant": (qenc or "base") + (f"@seed{trainer_seed}" if trainer_seed else ""),
           "train_wall_s": round(train_s, 1)}
    for k in rows[0]:
        v = np.array([r[k] for r in rows], np.float64)
        v = v[np.isfinite(v)]
        out[k] = round(float(v.mean()), 5) if len(v) else None
        out[f"{k}_n"] = int(len(v))
    print(json.dumps(out), flush=True)
    return out


def main():
    from pldepth_tpu.core.cache import enable_compilation_cache

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)))
    )
    enable_compilation_cache()
    if os.environ.get("QENC_SELFPRETRAIN"):
        # Decisive mode: build the pretrained encoder here (disjoint scenes
        # corpus), then gate base-vs-qenc from that shared init.
        epochs = int(os.environ.get("QENC_PRETRAIN_EPOCHS", 40))
        os.environ["QENC_PRETRAINED"] = self_pretrain(epochs)
    results = [run_variant("")]
    if not os.environ.get("QENC_ONLY_SEEDS"):
        results.append(run_variant("bf16"))
        if os.environ.get("QENC_INT8"):
            results.append(run_variant("int8"))
    for s in os.environ.get("QENC_BASE_SEEDS", "").split(","):
        # noise floor: base re-runs with a different trainer seed (decoder
        # init + sampling rng) — the base-vs-base metric spread is the scale
        # against which the qenc deltas should be read
        if s.strip():
            results.append(run_variant("", trainer_seed=int(s)))
    base = results[0]
    print("\n=== qenc quality gate (deltas vs base training) ===")
    for r in results[1:]:
        deltas = {
            k: round(r[k] - base[k], 5)
            for k in ("ordinal_error", "whdr_003", "ndcg_200",
                      "edge_boundary", "edge_completeness")
            if r.get(k) is not None and base.get(k) is not None
        }
        print(json.dumps({"variant": r["variant"], "deltas": deltas}))
    with open("/tmp/qenc_gate.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
