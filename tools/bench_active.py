"""Benchmark one active-learning acquisition round (VERDICT r03 item 4).

The claim "batched predict replaces the reference's per-image
model.predict" (active/loop.py vs pldepth/active_learning/
active_learning_method.py:94-105) was architecturally true but unmeasured —
and the host-side Canny/Hausdorff tile work could dominate. This measures:

* images/sec through `active_learning_round` (device predict + host
  Canny/unsharp/tile-Hausdorff + oracle labeling), wall clock
* the device-predict share vs the host-acquisition share
* a computed estimate of the reference's per-image path on the same
  hardware: its per-image cost = one model.predict dispatch (one-image
  batch) + the same host work, so ref_est = n / (n*(t_dispatch1 + t_host))

Run on TPU from the repo root:
  python -u tools/bench_active.py [n_images] [size]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from pldepth_tpu.active.acquisition import acquire_pixels, oracle_label
    from pldepth_tpu.active.loop import active_learning_round
    from pldepth_tpu.core.cache import enable_compilation_cache
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 448
    split = int(os.environ.get("ACTIVE_SPLIT", 32))
    cfg = ExperimentConfig(
        model_name=os.environ.get("ACTIVE_MODEL", "ff_effnet"),
        input_size=size, batch_size=8, ranking_size=5,
        rankings_per_image=100, sampling_type=1,
    )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=n, image_size=size, seed=11)

    # warm compiles (batched predict at the round's batch, and a 1-image
    # predict for the reference estimate)
    imgs0 = np.stack([ds[i]["image"] for i in range(8)])
    predict = trainer.jit_predict()
    np.asarray(predict(state, imgs0))
    img1 = imgs0[: max(1, trainer.mesh.shape["data"])]
    np.asarray(predict(state, img1))  # warm the 1-image graph too

    # --- full round, wall clock (streaming: images uploaded per batch) ---
    t0 = time.time()
    images, rankings, stats = active_learning_round(
        trainer, state, ds, split=split, seed=0, predict_batch=8
    )
    t_round = time.time() - t0
    ips_round = n / t_round

    # --- resident round: predictions read the pool from HBM, nothing
    # uploaded per batch ---
    from pldepth_tpu.data import build_resident_store

    store = build_resident_store(ds, trainer.mesh)
    active_learning_round(  # warm the resident-predict compile
        trainer, state, ds, split=split, seed=0, predict_batch=8, store=store
    )
    t0 = time.time()
    active_learning_round(
        trainer, state, ds, split=split, seed=0, predict_batch=8, store=store
    )
    t_res = time.time() - t0
    ips_res = n / t_res

    # --- decomposition: legacy per-image host path (numpy Hausdorff), the
    # reference's host cost — and the new pipeline's pieces.
    from pldepth_tpu.active.acquisition import (
        input_edge_map,
        pred_edge_map,
        tile_hausdorff_batch,
    )

    sample = ds[0]
    pred0 = np.asarray(predict(state, imgs0))[0]
    t0 = time.time()
    reps = 10
    rng = np.random.default_rng(0)
    for _ in range(reps):
        pos, pts, m, v = acquire_pixels(sample["image"], pred0, split, 1.8)
        oracle_label(sample["gt"], pts, cfg.ranking_size, rng)
    t_host_per_img = (time.time() - t0) / reps

    t0 = time.time()
    for _ in range(reps):
        ie = input_edge_map(sample["image"])
        pe = pred_edge_map(pred0, 1.8)
    t_edges_per_img = (time.time() - t0) / reps
    ie_b = np.stack([ie] * 8)
    pe_b = np.stack([pe] * 8)
    tile_hausdorff_batch(ie_b, pe_b, split)  # warm the jit
    t0 = time.time()
    for _ in range(reps):
        tile_hausdorff_batch(ie_b, pe_b, split)
    t_hd_batch8 = (time.time() - t0) / reps

    # --- per-image dispatch cost (reference's pattern: model.predict per
    # image). Median of single-image dispatches, including host sync.
    ts = []
    for _ in range(10):
        t0 = time.time()
        np.asarray(predict(state, imgs0))  # batched dispatch for 8
        ts.append(time.time() - t0)
    t_dispatch_batch = float(np.median(ts))
    ts = []
    for _ in range(10):
        t0 = time.time()
        np.asarray(predict(state, img1))
        ts.append(time.time() - t0)
    t_dispatch_one = float(np.median(ts))

    ref_est_ips = 1.0 / (t_dispatch_one + t_host_per_img)
    out = {
        "n_images": n, "size": size, "split": split,
        "round_images_per_sec": round(ips_round, 2),
        "round_wall_s": round(t_round, 2),
        "resident_round_images_per_sec": round(ips_res, 2),
        "resident_round_wall_s": round(t_res, 2),
        "legacy_host_acquisition_ms_per_img": round(t_host_per_img * 1e3, 2),
        "host_edges_ms_per_img": round(t_edges_per_img * 1e3, 2),
        "device_hausdorff_ms_per_batch8": round(t_hd_batch8 * 1e3, 2),
        "batched_predict_ms_per_batch8": round(t_dispatch_batch * 1e3, 2),
        "one_image_predict_ms": round(t_dispatch_one * 1e3, 2),
        "reference_pattern_est_images_per_sec": round(ref_est_ips, 2),
        "speedup_vs_reference_pattern": round(ips_round / ref_est_ips, 2),
        "stats": stats,
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
