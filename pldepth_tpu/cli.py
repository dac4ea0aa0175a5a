"""Command-line interface.

Replaces the reference's per-script Click commands with one group while
preserving the canonical flag surface of pldepth/PLDepth.py:28-46 (flag
names, defaults, sampling_type codes). Commands:

  train   — the main experiment (PLDepth.py perform_pldepth_experiment):
            train on HR-WSI (or synthetic), SGDR schedule, Adam(amsgrad),
            post-train ordinal-error + NDCG@200 eval, weight export.
  eval    — test_data_eval.py equivalent: load weights, full metric report.
  zeroshot— cross-dataset ordinal suite (Ibims/DIODE/Sintel/TUM + DIW
            human-pair WHDR).
  active  — active_PLDepth.py equivalent: optional pretrain/load + N
            edge-disagreement active-learning rounds.
  chi2    — chi2compare.py diagnostic: chi^2 informativeness of samplers.
  sweep   — hyperparameter search driver (random/grid/tpe; wandb if present).
  predict — batched depth inference over a directory of images.
  serve   — watch-directory serving daemon (checkpoint or AOT artifact).
  export  — AOT StableHLO serving artifact via jax.export.
  dump    — offline (image, rankings) dump (active_learning/offline_data.py).
  analyze — sweep-trials analysis (bk-hyperopt/trials_visualize.py).
  convert — Keras backbone weights → --pretrained_path npz; --reverse
            exports trained weights back to a Keras .h5.

Run as ``python -m pldepth_tpu.cli <command> ...``.
"""

from __future__ import annotations

import json
import logging
import os
import time

import click
import numpy as np

log = logging.getLogger(__name__)


def _reference_options(f):
    """The canonical reference flag set (pldepth/PLDepth.py:28-46)."""
    opts = [
        # NOTE: keep in sync with models/pldepth_net.py MODEL_REGISTRY —
        # listed statically so `--help` doesn't import jax/flax. ff_smoke is
        # the CI/bring-up model (models/efficientnet.py VARIANTS["smoke"]).
        click.option("--model_name", default="ff_effnet", help="Backbone model",
                     type=click.Choice(
                         ["ff_redweb", "ff_effnet", "ff_effnet_b1", "ff_effnet_b2",
                          "ff_effnet_b3", "ff_effnet_b4", "ff_effnet_b5",
                          "ff_effnet_b6", "ff_effnet_b7", "ff_smoke"],
                         case_sensitive=False)),
        click.option("--epochs", default=50),
        click.option("--batch_size", default=4),
        click.option("--seed", default=0),
        click.option("--ranking_size", default=3,
                     help="Number of elements per training ranking"),
        click.option("--rankings_per_image", default=100,
                     help="Number of rankings per image for training"),
        click.option("--initial_lr", default=0.01, type=click.FLOAT),
        click.option("--equality_threshold", default=0.03, type=click.FLOAT,
                     help="tau parameter of the ratio equality test"),
        click.option("--model_checkpoints", default=False, type=click.BOOL,
                     help="Save the best model by val_loss"),
        click.option("--load_model_path", default="",
                     help="Warm-start weights (.npz from save_weights_npz)"),
        click.option("--augmentation", default=True, type=click.BOOL),
        click.option("--warmup", default=0, type=click.INT),
        click.option("--sampling_type", default=1, type=click.INT,
                     help="0=thresholded 1=info_score 2=masked 3=purely_masked"),
        click.option("--lr_multi", default=0.25, type=click.FLOAT),
        click.option("--ds_size", default=None, type=click.INT),
        # --- extensions beyond the reference surface ---
        click.option("--dataset", default="synthetic",
                     help="HR-WSI | synthetic | scenes (structured synthetic "
                          "with occlusion boundaries) | IBIMS | DIODE | "
                          "SINTEL | TUM"),
        click.option("--data_root", default="", help="dataset root directory"),
        click.option("--input_size", default=224, type=click.INT),
        click.option("--schedule", default="sgdr",
                     type=click.Choice(["sgdr", "step", "constant"])),
        click.option("--freeze_encoder", default=False, type=click.BOOL),
        click.option("--pretrained_path", default=""),
        click.option("--compute_dtype", default="bfloat16"),
        click.option("--sparse_tail", default=False, type=click.BOOL,
                     help="evaluate the full-res decoder tail only at the "
                          "sampled ranking pixels during training (exact "
                          "through the last BN; measured slower at the "
                          "headline config — see docs/BENCH.md)"),
        click.option("--fused_tail", default=True, type=click.BOOL,
                     help="collapse the final upsample+head conv into one "
                          "half-res phase conv (value-exact; +18% train "
                          "throughput at 448^2 — see docs/BENCH.md)"),
        click.option("--qres", default="",
                     type=click.Choice(["", "int8", "bf16"]),
                     help="store the encoder's BN/swish backward residuals "
                          "compressed (ops/qres.py). Forward numerics are "
                          "unchanged; gradients carry the compression noise "
                          "(bounded in tests/test_qres.py). ff_effnet "
                          "family; measured verdict in docs/BENCH.md"),
        click.option("--qenc", default="",
                     type=click.Choice(["", "bf16", "int8"]),
                     help="frozen-encoder byte-floor probe: run the encoder "
                          "SERVING-style (bn_fold bf16 / int8) inside the "
                          "train step, training only the decoder. DEVIATES "
                          "from reference freezing (encoder BN frozen too); "
                          "requires --freeze_encoder; measured verdict in "
                          "docs/BENCH.md"),
        click.option("--decoder_head_ch", default=32, type=click.INT,
                     help="width of the last two skip-concat decoder stages "
                          "(ff_effnet). 32 = reference architecture; 128 "
                          "fills the TPU lane dim but DEVIATES from the "
                          "reference (measured verdict in docs/BENCH.md)"),
        click.option("--output_dir", default="runs"),
        click.option("--use_wandb", default=False, type=click.BOOL),
        click.option("--use_tensorboard", default=False, type=click.BOOL,
                     help="also write TensorBoard event files under "
                          "<run>/tb (reference tracking_utils.py:33-39)"),
        click.option("--use_mlflow", default=False, type=click.BOOL,
                     help="also log params/metrics to mlflow if installed "
                          "(reference env.py:28-37, tracking_utils.py:8-10)"),
        click.option("--mlflow_tracking_uri", default="",
                     help="mlflow tracking URI (reference conf/run.ini "
                          "MLFLOW section); empty = mlflow default"),
        click.option("--profile", default=False, type=click.BOOL,
                     help="capture a jax.profiler trace of 3 steady steps"),
        click.option("--pack_cache", default="",
                     help="path to a .pldpack cache: pack the training split "
                          "once, then stream it through the native C++ "
                          "reader (decode-once data path)"),
        click.option("--uint8_wire", default=False, type=click.BOOL,
                     help="host streaming wire format: images/masks as "
                          "uint8 (4x less host->device transfer, device "
                          "rescale; exact for jpg/png-source data). The "
                          "--pack_cache native path always uses this"),
        click.option("--data_resident", default=False, type=click.BOOL,
                     help="upload the whole train split to device HBM once "
                          "(6 bytes/pixel) and draw batches on device — "
                          "zero per-step host traffic (data/resident.py)"),
        click.option("--resident_chain_steps", default=1, type=click.INT,
                     help="with --data_resident: steps per jit dispatch "
                          "(lax.scan chain; removes per-step dispatch "
                          "latency, coarsens preemption to one chunk)"),
        click.option("--parity_report", default=False, type=click.BOOL,
                     help="after training, run the full eval report and "
                          "write parity_report.json with pass/fail vs "
                          "--parity_target_whdr (docs/PARITY.md runbook)"),
        click.option("--parity_target_whdr", default=-1.0, type=click.FLOAT,
                     help="the paper's WHDR for this config; <0 = metrics "
                          "only, no verdict"),
        click.option("--parity_budget", default=0.005, type=click.FLOAT,
                     help="allowed WHDR excess over the target (BASELINE.md "
                          "north star: 0.5%)"),
        click.option("--config_json", default="",
                     help="JSON file with config overrides (applied before "
                          "CLI flags; reference ModelParameters"
                          ".load_parameters_from_file, models_meta.py:51-65)"),
        click.option("--mesh_model", default=1, type=click.INT,
                     help="size of the mesh 'model' axis (devices are "
                          "data x model); used by --spatial_sharding"),
        click.option("--spatial_sharding", default=False, type=click.BOOL,
                     help="shard image rows over the mesh 'model' axis "
                          "(XLA inserts conv halo exchanges; for inputs "
                          "whose activations exceed one chip's HBM)"),
        click.option("--run_name", default="",
                     help="run directory name under --output_dir (default: "
                          "timestamped); set a fixed name to make the run "
                          "resumable"),
        click.option("--resume", default=False, type=click.BOOL,
                     help="restore the latest full-state checkpoint under "
                          "<output_dir>/<run_name>/autockpt and continue "
                          "bit-compatibly (data stream, per-step RNG and LR "
                          "schedule all fast-forward to the saved step)"),
    ]
    for o in reversed(opts):
        f = o(f)
    return f


def _make_config(kw) -> "ExperimentConfig":
    import dataclasses

    from pldepth_tpu.core.config import ExperimentConfig

    cfg_keys = {f.name for f in dataclasses.fields(ExperimentConfig)}
    values = {k: v for k, v in kw.items() if k in cfg_keys}
    if kw.get("mesh_model", 1) != 1:
        values["mesh"] = {"data": -1, "model": kw["mesh_model"]}
    config_json = kw.get("config_json")
    if config_json:
        with open(config_json) as f:
            file_vals = {
                k: v for k, v in json.load(f).items() if not k.startswith("_")
            }
        unknown = set(file_vals) - cfg_keys
        if unknown:
            raise click.UsageError(f"unknown keys in {config_json}: {sorted(unknown)}")
        # file provides base values; explicit CLI flags are applied on top by
        # click defaults — file wins over defaults, flags win over file
        defaults = ExperimentConfig()
        for k, v in file_vals.items():
            if values.get(k, getattr(defaults, k)) == getattr(defaults, k):
                values[k] = v
    return ExperimentConfig.from_dict(values)


def _load_data(cfg):
    from pldepth_tpu.data import get_dataset, train_val_split

    kwargs = dict(target_size=cfg.input_size)
    if cfg.dataset.lower() in ("hr-wsi", "hr_wsi", "hrwsi"):
        ds = get_dataset(
            "HR-WSI", root=cfg.data_root, split="train", size=cfg.ds_size,
            shuffle=True, seed=cfg.seed, **kwargs,
        )
    else:
        ds = get_dataset(cfg.dataset, size=cfg.ds_size, seed=cfg.seed, **kwargs)
    return train_val_split(ds, cfg.val_split_denom)


@click.group()
def cli():
    logging.basicConfig(
        level=os.environ.get("PLDEPTH_LOG", "INFO"),
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # Persistent compilation cache (core/cache.py; PLDEPTH_JAX_CACHE=0 opts out)
    from pldepth_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()


@cli.command()
@_reference_options
def train(pack_cache="", run_name="", resume=False, **kw):
    """Main training experiment (reference perform_pldepth_experiment)."""
    import jax

    from pldepth_tpu.data import BatchIterator, pregenerate_val_rankings, val_batches
    from pldepth_tpu.eval.evaluator import Evaluator
    from pldepth_tpu.obs.logging import MetricLogger
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import (
        CheckpointManager,
        load_weights_npz,
        save_weights_npz,
    )

    cfg = _make_config(kw)
    if resume and not run_name:
        raise click.UsageError("--resume needs a fixed --run_name")
    if not run_name:
        run_name = time.strftime("%d%m%y-%H%M%S") + f"_s{cfg.sampling_type}"
    logger = MetricLogger(cfg.output_dir, run_name, cfg.to_dict(), cfg.use_wandb,
                          use_tensorboard=cfg.use_tensorboard,
                          use_mlflow=cfg.use_mlflow,
                          mlflow_tracking_uri=cfg.mlflow_tracking_uri)

    train_ds, val_ds = _load_data(cfg)
    steps_per_epoch = max(1, len(train_ds) // cfg.batch_size)
    trainer = Trainer(cfg, steps_per_epoch)
    state = trainer.init_state()
    if cfg.load_model_path:
        state = load_weights_npz(cfg.load_model_path, state)

    # Resumable full-state checkpoints, labeled by global step (one per epoch
    # + one on SIGTERM/preemption; Trainer.fit ckpt=...). Separate from the
    # best-by-val manager below, which keeps reference epoch-labeled
    # save_best_only semantics.
    auto_ckpt = CheckpointManager(
        os.path.join(logger.dir, "autockpt"), keep=cfg.keep_checkpoints
    )
    start_step = 0
    if resume and auto_ckpt.latest_step() is not None:
        state = trainer.replicate(auto_ckpt.restore(state))
        start_step = int(jax.device_get(state.step))
        click.echo(f"resumed from step {start_step}")

    resident_store = None
    train_iter = None
    if cfg.data_resident:
        from pldepth_tpu.data.resident import build_resident_store

        resident_store = build_resident_store(
            train_ds, trainer.mesh,
            spatial_axis=trainer._spatial_axis(),
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
        )
        click.echo(
            f"resident store: {resident_store.n} samples, "
            f"{resident_store.nbytes / 1e9:.2f} GB in HBM"
        )
    elif pack_cache:
        from pldepth_tpu.data.packed import NativePackedIterator, pack_dataset

        if not os.path.exists(pack_cache):
            click.echo(f"packing {len(train_ds)} samples -> {pack_cache}")
            pack_dataset(train_ds, pack_cache)
        train_iter = NativePackedIterator(
            pack_cache, cfg.batch_size, seed=cfg.seed, start_step=start_step,
            ring=cfg.prefetch_depth,
        )
    else:
        train_iter = BatchIterator(
            train_ds, cfg.batch_size, seed=cfg.seed, start_step=start_step,
            prefetch=cfg.prefetch_depth, uint8_wire=cfg.uint8_wire,
        )
    vfac = None
    if len(val_ds) >= cfg.batch_size:
        # pre-generated fixed val rankings with the thresholded sampler
        # (reference hourglass_provider.py:22,64-73)
        val_rankings = pregenerate_val_rankings(
            val_ds, sampler_name="thresholded",
            rankings_per_image=cfg.val_rpi, ranking_size=cfg.ranking_size,
            threshold=cfg.equality_threshold, seed=cfg.seed,
        )
        vfac = lambda: val_batches(val_ds, val_rankings, cfg.batch_size)

    ckpt = None
    if cfg.model_checkpoints:
        ckpt = CheckpointManager(os.path.join(logger.dir, "ckpt"),
                                 keep=cfg.keep_checkpoints)

    class LogCB:
        def on_train_begin(self, tr):
            pass

        def on_step_end(self, tr, step, metrics):
            # distinct keys so the epoch rows keep their CSV schema
            logger.log({f"step_{k}": v for k, v in metrics.items()}, step=step)

        def on_epoch_end(self, tr, st, epoch, history):
            logger.log(
                {"loss": history["loss"][-1],
                 "val_loss": history["val_loss"][-1] if history["val_loss"] else None,
                 "lr": history["lr"][-1], "images_per_sec": history["ips"][-1]},
                step=epoch,
            )
            if ckpt is not None and history["val_loss"]:
                ckpt.maybe_save_best(epoch, st, history["val_loss"][-1])

        def on_train_end(self, tr, st, history):
            pass

    if cfg.profile:
        # jax.profiler trace of a few steady-state steps (xplane dump under
        # the run dir; the reference disabled profiling outright,
        # tracking_utils.py:39)
        from pldepth_tpu.obs.profiling import profile_trace
        import jax as _jax

        def _one_step(st):
            if resident_store is not None:
                st, _m = trainer.resident_step(st, resident_store.arrays)
            else:
                st, _m = trainer.train_step(
                    st, trainer.shard_batch(next(train_iter))
                )
            return st

        state = _one_step(state)  # compile outside the trace
        _jax.block_until_ready(state)
        with profile_trace(os.path.join(logger.dir, "profile")):
            for _ in range(3):
                state = _one_step(state)
            _jax.block_until_ready(state)

    state, history = trainer.fit(
        state, train_iter, val_iter_factory=vfac, callbacks=[LogCB()],
        ckpt=auto_ckpt, resident_store=resident_store,
    )
    if train_iter is not None:
        train_iter.close()
    auto_ckpt.close()
    if ckpt is not None:
        ckpt.close()  # drain any in-flight async best-model save
    if history.get("preempted"):
        click.echo(
            f"preempted — resume with: --run_name {run_name} --resume true"
        )
        logger.close()
        return

    weights_path = os.path.join(logger.dir, "weights.npz")
    save_weights_npz(weights_path, state)
    click.echo(f"weights saved to {weights_path}")

    # post-train eval (reference PLDepth.py:184-193: 250 val imgs)
    evaluator = Evaluator(trainer, state)
    limit = min(250, len(val_ds)) if len(val_ds) else None
    if limit:
        err = evaluator.calc_err(val_ds, limit=limit)
        ndcg = evaluator.dcg_metric(val_ds, limit=limit)
        logger.set_summary(test_error=err, ndcg_200=ndcg)
        click.echo(json.dumps({"test_error": err, "ndcg_200": ndcg}))
        # example-image logging (reference PLDepth.py:196-209: input / gt /
        # predicted depth of one val image)
        ex = val_ds[min(10, len(val_ds) - 1)]
        import jax as _jax
        import numpy as _np

        pred = _np.asarray(
            _jax.jit(trainer.predict)(state, _np.asarray(ex["image"])[None])
        )[0]
        logger.log_images(
            {"ex_img": ex["image"], "ex_gt": ex["gt"], "ex_pred": pred},
            captions={
                "ex_img": "input image",
                "ex_gt": "input ground truth",
                "ex_pred": "predicted depth",
            },
        )
    if cfg.parity_report and len(val_ds):
        # accuracy-parity runbook verdict (docs/PARITY.md): full
        # test_data_eval-equivalent report + pass/fail vs the paper budget
        report = evaluator.full_report(val_ds, limit=limit)
        report["config"] = {
            "model_name": cfg.model_name, "input_size": cfg.input_size,
            "ranking_size": cfg.ranking_size, "dataset": cfg.dataset,
            "ds_size": cfg.ds_size, "epochs": cfg.epochs,
            "sampling_type": cfg.sampling_type,
        }
        if cfg.parity_target_whdr >= 0:
            whdr = report["whdr_tau_0.03"]
            report["parity"] = {
                "target_whdr": cfg.parity_target_whdr,
                "budget": cfg.parity_budget,
                "pass": bool(whdr <= cfg.parity_target_whdr + cfg.parity_budget),
            }
        path = os.path.join(logger.dir, "parity_report.json")
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        click.echo(json.dumps({"parity_report": path, **{
            k: v for k, v in report.items() if not isinstance(v, dict)}}))
        if report.get("parity") is not None:
            click.echo(
                f"PARITY {'PASS' if report['parity']['pass'] else 'FAIL'}: "
                f"WHDR {report['whdr_tau_0.03']:.4f} vs target "
                f"{cfg.parity_target_whdr:.4f} + {cfg.parity_budget:.3f}"
            )
    logger.close()


@cli.command("eval")
@click.option("--model_name", default="ff_effnet")
@click.option("--load_model_path", required=True)
@click.option("--dataset", default="HR-WSI")
@click.option("--data_root", default="")
@click.option("--input_size", default=224, type=click.INT)
@click.option("--ranking_size", default=5, type=click.INT)
@click.option("--limit", default=None, type=click.INT)
@click.option("--tau", default=0.03, type=click.FLOAT)
@click.option("--device_metrics", default=False, type=click.BOOL,
              help="compute ordinal/WHDR/NDCG on device (fast path; "
                   "statistically equivalent, excludes edge metrics)")
def eval_cmd(model_name, load_model_path, dataset, data_root, input_size,
             ranking_size, limit, tau, device_metrics):
    """Test-set evaluation (reference test_data_eval.py:30-104)."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import get_dataset
    from pldepth_tpu.eval.evaluator import Evaluator
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import infer_decoder_head_ch, load_weights_npz

    cfg = ExperimentConfig(
        model_name=model_name, input_size=input_size, ranking_size=ranking_size,
        dataset=dataset, data_root=data_root,
        decoder_head_ch=infer_decoder_head_ch(load_model_path),
    )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = load_weights_npz(load_model_path, trainer.init_state())
    if dataset.lower() == "synthetic":
        ds = get_dataset("synthetic", target_size=input_size, size=limit or 64)
    else:
        ds = get_dataset(dataset, root=data_root, target_size=input_size)
    ev = Evaluator(trainer, state)
    if device_metrics:
        report = ev.full_report_device(ds, limit=limit, tau=tau)
    else:
        report = ev.full_report(ds, limit=limit, tau=tau)
    click.echo(json.dumps(report, indent=2))


@cli.command()
@click.option("--model_name", default="ff_effnet")
@click.option("--load_model_path", required=True)
@click.option("--input_size", default=224, type=click.INT)
@click.option("--limit", default=None, type=click.INT)
@click.option("--ibims_root", default="")
@click.option("--diode_root", default="")
@click.option("--sintel_root", default="")
@click.option("--tum_root", default="")
@click.option("--diw_root", default="",
              help="DIW root: official layout, DIW_test.csv + images "
                   "(human ordinal pairs -> diw_whdr; data/diw.py)")
def zeroshot(model_name, load_model_path, input_size, limit, **roots):
    """Zero-shot cross-dataset ordinal suite (BASELINE.json config #4) —
    dense sets (Ibims/DIODE/Sintel/TUM) via the metric suite, DIW via
    human-pair WHDR (the one eval the reference names but never
    implemented; eval/diw.py documents the conventions)."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import get_dataset
    from pldepth_tpu.eval.evaluator import Evaluator
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import infer_decoder_head_ch, load_weights_npz

    cfg = ExperimentConfig(model_name=model_name, input_size=input_size,
                           decoder_head_ch=infer_decoder_head_ch(load_model_path))
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = load_weights_npz(load_model_path, trainer.init_state())
    datasets = []
    for name, key in [("IBIMS", "ibims_root"), ("DIODE", "diode_root"),
                      ("SINTEL", "sintel_root"), ("TUM", "tum_root")]:
        if roots.get(key):
            datasets.append(
                get_dataset(name, root=roots[key], target_size=input_size)
            )
    if not datasets and not roots.get("diw_root"):
        raise click.UsageError("provide at least one dataset root")
    out = {}
    if datasets:
        out = Evaluator(trainer, state).zero_shot_suite(datasets, limit=limit)
    if roots.get("diw_root"):
        from pldepth_tpu.data.diw import load_diw
        from pldepth_tpu.eval.diw import evaluate_diw

        items = load_diw(roots["diw_root"])
        if limit:
            items = items[:limit]
        out["diw"] = evaluate_diw(trainer, state, items, input_size)
    click.echo(json.dumps(out, indent=2))


@cli.command()
@_reference_options
@click.option("--rounds", default=6, type=click.INT)
@click.option("--split_num", default=32, type=click.INT)
@click.option("--sigma", default=1.8, type=click.FLOAT)
@click.option("--pretrain_epochs", default=0, type=click.INT)
def active(rounds, split_num, sigma, pretrain_epochs, **kw):
    """Active learning (reference run_scripts/active_PLDepth.py:160-185)."""
    from pldepth_tpu.active import run_active_loop
    from pldepth_tpu.data import BatchIterator
    from pldepth_tpu.obs.logging import MetricLogger
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import load_weights_npz, save_weights_npz

    cfg = _make_config(kw)
    run_name = time.strftime("%d%m%y-%H%M%S") + "_active"
    logger = MetricLogger(cfg.output_dir, run_name, cfg.to_dict(), cfg.use_wandb,
                          use_tensorboard=cfg.use_tensorboard,
                          use_mlflow=cfg.use_mlflow,
                          mlflow_tracking_uri=cfg.mlflow_tracking_uri)
    train_ds, val_ds = _load_data(cfg)
    trainer = Trainer(cfg, max(1, len(train_ds) // cfg.batch_size))
    state = trainer.init_state()
    if cfg.load_model_path:
        state = load_weights_npz(cfg.load_model_path, state)
    elif pretrain_epochs:
        it = BatchIterator(train_ds, cfg.batch_size, seed=cfg.seed)
        state, _ = trainer.fit(state, it, epochs=pretrain_epochs)
        it.close()
    store = None
    if cfg.data_resident:
        import jax

        if jax.process_count() > 1:
            # The resident active path's store-row -> ds[i] mapping
            # (active/loop.py _resident_batches) assumes a single-process
            # store holding the whole pool; under multi-host the device_put
            # of host-global data onto non-addressable devices fails anyway.
            # Fall back to the streaming acquisition path, which shards
            # correctly by construction.
            click.echo(
                "# --data_resident ignored for the active loop under "
                f"multi-host (process_count={jax.process_count()}); "
                "using the streaming acquisition path",
                err=True,
            )
        else:
            from pldepth_tpu.data import build_resident_store

            store = build_resident_store(train_ds, trainer.mesh)
    state, history = run_active_loop(
        trainer, state, train_ds, rounds=rounds, split=split_num, sigma=sigma,
        eval_ds=val_ds if len(val_ds) else None, seed=cfg.seed, logger=logger,
        store=store,
    )
    save_weights_npz(os.path.join(logger.dir, "weights.npz"), state)
    click.echo(json.dumps(history))
    logger.close()


@cli.command()
@click.option("--model_name", default="ff_effnet")
@click.option("--load_model_path", required=True)
@click.option("--inputs", required=True,
              help="image file, directory of images, or packed dataset")
@click.option("--out_dir", required=True)
@click.option("--input_size", default=448, type=click.INT)
@click.option("--batch_size", default=8, type=click.INT)
@click.option("--save_png", default=True, type=click.BOOL)
@click.option("--fused_encoder", default=False, type=click.BOOL,
              help="run eligible encoder blocks as fused Pallas kernels "
                   "(ff_effnet family)")
@click.option("--bn_fold", default=True, type=click.BOOL,
              help="fold batch-norms into biased convs for serving "
                   "(models/bn_fold.py; exact to compute-dtype rounding; "
                   "-10.4%% serving time @448^2, docs/BENCH.md). "
                   "--fused_encoder takes precedence (it folds BN itself)")
@click.option("--quantize", default="auto",
              type=click.Choice(["auto", "", "int8"]),
              help="int8 post-training quantization for serving "
                   "(models/quantize.py; +7%% over bn_fold @448^2, metric "
                   "gate table in docs/BENCH.md). Default 'auto' = int8 "
                   "for the ff_effnet family (ff_redweb serves bn_fold "
                   "float: the scenes gate measured ordering degradation, "
                   "docs/BENCH.md) unless --fused_encoder/--bn_fold "
                   "override; '' = float bn_fold graph. Activation scales "
                   "calibrate on the first input batch")
def predict(model_name, load_model_path, inputs, out_dir, input_size,
            batch_size, save_png, fused_encoder, bn_fold, quantize):
    """Batched depth-map inference (serving path): writes <name>_depth.npy
    (+ minmax-normalized png preview) per input image."""
    import glob as globmod

    import jax
    import numpy as np

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import io as dio
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import infer_decoder_head_ch, load_weights_npz

    cfg = ExperimentConfig(model_name=model_name, input_size=input_size,
                           decoder_head_ch=infer_decoder_head_ch(load_model_path))
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = load_weights_npz(load_model_path, trainer.init_state())
    # serving is data-parallel over the mesh (all visible devices); the
    # per-dispatch batch must divide evenly over the data axis
    from pldepth_tpu.core.mesh import pad_to_batch, round_batch

    batch_size = round_batch(batch_size, trainer.mesh)
    mode = Trainer.serving_mode(fused_encoder, bn_fold, quantize,
                                model_name=model_name)
    predict_fn = trainer.jit_predict(fused=mode)

    if os.path.isdir(inputs):
        files = sorted(
            f for ext in ("*.jpg", "*.jpeg", "*.png")
            for f in globmod.glob(os.path.join(inputs, ext))
        )
    else:
        files = [inputs]
    if not files:
        raise click.UsageError(f"no images under {inputs}")
    os.makedirs(out_dir, exist_ok=True)

    # decode ∥ device compute ∥ write (serve/pipeline.py): the device stays
    # busy while the host decodes the next chunk and writes the previous one.
    from pldepth_tpu.serve.pipeline import (
        decode_image_chunk,
        depth_writer,
        run_pipeline,
        unique_stems,
    )

    chunks = [files[s : s + batch_size] for s in range(0, len(files), batch_size)]
    write = depth_writer(out_dir, save_png, unique_stems(files))
    calib = None
    if mode == "quant":
        # activation scales calibrate on the first real input chunk
        calib = pad_to_batch(decode_image_chunk(chunks[0], input_size), batch_size)
        state = trainer.prepare_quant(state, calib)

    def _decode(chunk):
        if calib is not None and chunk is chunks[0]:
            return calib  # already decoded for calibration
        return pad_to_batch(decode_image_chunk(chunk, input_size), batch_size)

    run_pipeline(
        chunks,
        _decode,
        lambda imgs: predict_fn(state, imgs),
        write,
    )
    click.echo(json.dumps({"n": len(files), "out_dir": out_dir}))


@cli.command()
@click.option("--model_name", default="ff_effnet")
@click.option("--load_model_path", default="",
              help="weights .npz (live model source)")
@click.option("--artifact", default="",
              help="exported .plx artifact (serve without model code)")
@click.option("--watch_dir", required=True)
@click.option("--out_dir", required=True)
@click.option("--input_size", default=448, type=click.INT)
@click.option("--batch_size", default=8, type=click.INT)
@click.option("--save_png", default=False, type=click.BOOL)
@click.option("--poll_interval", default=0.5, type=click.FLOAT)
@click.option("--once", default=False, type=click.BOOL,
              help="process the current backlog and exit")
@click.option("--fused_encoder", default=False, type=click.BOOL)
@click.option("--bn_fold", default=True, type=click.BOOL,
              help="serving default: BN folded into biased convs "
                   "(models/bn_fold.py; checkpoint source only)")
@click.option("--quantize", default="auto",
              type=click.Choice(["auto", "", "int8"]),
              help="int8 serving (models/quantize.py; checkpoint source "
                   "only). Default 'auto' = int8 for the ff_effnet family "
                   "(ff_redweb serves bn_fold float per the scenes gate) "
                   "unless --fused_encoder/--bn_fold override; '' = float "
                   "bn_fold graph. Scales calibrate over the first "
                   "dispatched batches")
def serve(model_name, load_model_path, artifact, watch_dir, out_dir,
          input_size, batch_size, save_png, poll_interval, once,
          fused_encoder, bn_fold, quantize):
    """Serving daemon: watch a directory, write depth maps for new images.

    Model source is either --load_model_path (data-parallel sharded forward
    over every visible chip) or --artifact (AOT StableHLO export; no model
    code needed). New files dispatch once their size is stable across two
    polls; decode/compute/write overlap (serve/pipeline.py)."""
    from pldepth_tpu.serve.daemon import artifact_infer, serve_directory

    if bool(load_model_path) == bool(artifact):
        raise click.UsageError("pass exactly one of --load_model_path / --artifact")

    if artifact:
        from pldepth_tpu.core.mesh import pad_to_batch

        infer, meta = artifact_infer(artifact)
        input_size = meta["input_size"]
        fixed = meta.get("batch_size")
        if fixed:  # fixed-batch artifact: tail chunks must pad to its shape
            batch_size = fixed
            pad = lambda a: pad_to_batch(a, fixed)
        else:  # batch-polymorphic artifact
            pad = None
    else:
        import jax  # noqa: F401  (backend init before Trainer)

        from pldepth_tpu.core.config import ExperimentConfig
        from pldepth_tpu.core.mesh import pad_to_batch, round_batch
        from pldepth_tpu.train import Trainer
        from pldepth_tpu.train.checkpoint import (
            infer_decoder_head_ch,
            load_weights_npz,
        )

        cfg = ExperimentConfig(model_name=model_name, input_size=input_size,
                               decoder_head_ch=infer_decoder_head_ch(load_model_path))
        trainer = Trainer(cfg, steps_per_epoch=1)
        state = load_weights_npz(load_model_path, trainer.init_state())
        batch_size = round_batch(batch_size, trainer.mesh)
        mode = Trainer.serving_mode(fused_encoder, bn_fold, quantize,
                                    model_name=model_name)
        predict_fn = trainer.jit_predict(fused=mode)
        if mode == "quant":
            # Lazy calibration (the daemon may start on an empty watch
            # dir), accumulated over the first N dispatched batches: a
            # single unrepresentative first batch (e.g. one image padded
            # with zeros) would otherwise pin the activation scales for
            # the daemon's lifetime. prepare_quant re-runs are cheap and
            # amax only grows, so predictions can only get better-scaled;
            # each recalibration is logged with the batch count it used.
            n_calib_target = 8
            qcache = {"batches": [], "qv": None}

            def infer(imgs):
                if len(qcache["batches"]) < n_calib_target:
                    qcache["batches"].append(np.asarray(imgs))
                    qcache["qv"] = trainer.prepare_quant(
                        state, qcache["batches"]
                    )
                    log.info(
                        "int8 activation scales calibrated on %d/%d "
                        "dispatched batch(es)",
                        len(qcache["batches"]), n_calib_target,
                    )
                return predict_fn(qcache["qv"], imgs)

        else:
            infer = lambda imgs: predict_fn(state, imgs)
        pad = lambda a: pad_to_batch(a, batch_size)

    n = serve_directory(
        watch_dir, out_dir, infer, input_size, batch_size,
        pad_batch=pad, save_png=save_png, poll_interval=poll_interval,
        once=once,
    )
    click.echo(json.dumps({"processed": n, "out_dir": out_dir}))


@cli.command()
@click.option("--model_name", default="ff_effnet")
@click.option("--load_model_path", required=True)
@click.option("--out", required=True, help="output artifact path (.plx)")
@click.option("--input_size", default=448, type=click.INT)
@click.option("--batch_size", default=8, type=click.INT,
              help="fixed serving batch; 0 = batch-polymorphic artifact "
                   "(symbolic leading dim, any batch at call time)")
@click.option("--platforms", default="tpu,cpu",
              help="comma-separated lowering targets")
@click.option("--bn_fold", default=True, type=click.BOOL,
              help="bake BN-folded weights into the artifact "
                   "(models/bn_fold.py; -10.4%% serving time)")
def export(model_name, load_model_path, out, input_size, batch_size,
           platforms, bn_fold):
    """Serialize the inference forward (weights baked in) to a portable
    StableHLO artifact via jax.export — serve without model code or
    checkpoints (pldepth_tpu/serve/export.py)."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.serve import export_predict
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import infer_decoder_head_ch, load_weights_npz

    import jax

    cfg = ExperimentConfig(model_name=model_name, input_size=input_size,
                           decoder_head_ch=infer_decoder_head_ch(load_model_path))
    # single-device semantics: the artifact carries no mesh assumptions —
    # the serving process shards batches however it likes
    trainer = Trainer(cfg, steps_per_epoch=1,
                      mesh=make_mesh(devices=jax.devices()[:1]))
    state = load_weights_npz(load_model_path, trainer.init_state())
    export_predict(trainer, state, batch_size, out,
                   platforms=tuple(p.strip() for p in platforms.split(",")),
                   bn_fold=bn_fold)
    click.echo(json.dumps({"out": out, "platforms": platforms,
                           "batch_size": batch_size,
                           "input_size": input_size}))


@cli.command()
@_reference_options
@click.option("--out_dir", required=True)
@click.option("--image_format", default="jpg", type=click.Choice(["jpg", "npz"]))
def dump(out_dir, image_format, **kw):
    """Offline (image, rankings) dump (reference active_learning/offline_data.py)."""
    from pldepth_tpu.core.config import sampler_name_for_type
    from pldepth_tpu.data.offline import dump_offline_data

    cfg = _make_config(kw)
    train_ds, _ = _load_data(cfg)
    path = dump_offline_data(
        train_ds, out_dir,
        sampler_name=sampler_name_for_type(cfg.sampling_type),
        rankings_per_image=cfg.rankings_per_image,
        ranking_size=cfg.ranking_size,
        threshold=cfg.equality_threshold,
        seed=cfg.seed,
        image_format=image_format,
    )
    click.echo(path)


@cli.command()
@click.option("--state_path", required=True, help="sweep_state.jsonl")
@click.option("--out_dir", default="sweep_plots")
@click.option("--target", default="test_error")
def analyze(state_path, out_dir, target):
    """Sweep analysis: best trial + param-vs-metric plots
    (reference bk-hyperopt/trials_visualize.py HyperoptAnalyser)."""
    from pldepth_tpu.sweep.analyze import best_trial, load_trials, plot_param_vs_metric

    trials = load_trials(state_path)
    best = best_trial(trials, target)
    plots = plot_param_vs_metric(state_path, out_dir, target)
    click.echo(json.dumps({"best": best, "plots": plots}, indent=2))


@cli.command()
@_reference_options
@click.option("--trials", default=5, type=click.INT)
@click.option("--batches_per_trial", default=25, type=click.INT)
def chi2(trials, batches_per_trial, **kw):
    """Sampling chi^2 diagnostic (reference chi2compare.py:27-165)."""
    from pldepth_tpu.diagnostics.chi2 import run_chi2_compare

    cfg = _make_config(kw)
    out = run_chi2_compare(cfg, trials=trials, batches_per_trial=batches_per_trial)
    click.echo(json.dumps(out, indent=2))


@cli.command()
@click.option("--weights", required=True,
              help="Keras model file (.h5 / SavedModel dir) holding the "
                   "backbone — or, with --reverse, the weights .npz written "
                   "by this framework")
@click.option("--model_name", default="ff_effnet",
              help="target family: ff_effnet* (EfficientNet) or ff_redweb (ResNet-50)")
@click.option("--out", required=True,
              help="output .npz for --pretrained_path (or .h5 with --reverse)")
@click.option("--reverse", is_flag=True, default=False,
              help="export the other way: weights .npz -> Keras .h5 so "
                   "reference-side tooling can evaluate a TPU-trained model")
@click.option("--template", default="",
              help="(--reverse) existing Keras .h5 with the target "
                   "architecture to fill (e.g. a reference-trained model); "
                   "without it a bare keras.applications backbone is built "
                   "and populated encoder-only")
@click.option("--input_size", default=448, type=click.INT,
              help="(--reverse, no template) input size for the built "
                   "backbone graph")
def convert(weights, model_name, out, reverse, template, input_size):
    """Convert Keras backbone weights to the npz consumed by
    --pretrained_path (reference encoders came from keras.applications,
    pl_hourglass.py:48 / redweb.py:410) — or, with --reverse, export this
    framework's weights npz back to a Keras .h5 the reference stack loads
    (test_data_eval.py:70-85). Runs wherever TF + the weights exist;
    numerics are covered by tools/keras_parity_check.py and the round-trip
    test (tests/test_reverse_export.py)."""
    if reverse:
        from pldepth_tpu.models.convert import export_npz_to_keras_file

        path, n = export_npz_to_keras_file(
            weights, model_name, out, template_h5=template or None,
            input_size=input_size,
        )
        click.echo(json.dumps(
            {"out": path, "model_name": model_name, "tensors_assigned": n}
        ))
        return
    from pldepth_tpu.models.convert import convert_keras_file

    path = convert_keras_file(weights, model_name, out)
    click.echo(json.dumps({"out": path, "model_name": model_name}))


@cli.command()
@_reference_options
@click.option("--serve_batch", default=0, type=click.INT,
              help="also warm the serving graphs (predict + bn_fold) at "
                   "this batch size; 0 = training graphs only")
def warmup(serve_batch, **kw):
    """Pre-populate the persistent XLA compile cache for a config.

    A cold 448^2 train-step compile costs minutes; the cache
    (core/cache.py, shared by train/eval/serve/bench) makes every later
    process at the same config start in seconds. Run this once per config
    at deploy/CI time — or before a preemptible job's first start, so a
    preemption-resume never pays the cold compile.
    """
    import time as _time

    import jax as _jax
    import numpy as _np

    from pldepth_tpu.core.cache import enable_compilation_cache
    from pldepth_tpu.train import Trainer

    cache_dir = enable_compilation_cache()
    cfg = _make_config(kw)
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state()
    shape = (cfg.batch_size, cfg.input_size, cfg.input_size)
    batch = trainer.shard_batch({
        "image": _np.zeros((*shape, 3), _np.float32),
        "gt": _np.ones(shape, _np.float32),
        "mask": _np.ones(shape, _np.float32),
    })
    timings = {}
    t0 = _time.time()
    trainer.train_step.lower(state, batch).compile()
    timings["train_step_s"] = round(_time.time() - t0, 1)
    if cfg.data_resident:
        from pldepth_tpu.data import SyntheticDepthDataset, build_resident_store

        store = build_resident_store(
            SyntheticDepthDataset(
                n=max(cfg.batch_size, 2), image_size=cfg.input_size, seed=0
            ),
            trainer.mesh,
        )
        t0 = _time.time()
        # these execute (not just compile): the donated state is re-bound
        if cfg.resident_chain_steps > 1:
            state, _ = trainer.resident_chain(cfg.resident_chain_steps)(
                state, store.arrays
            )
        else:
            state, _ = trainer.resident_step(state, store.arrays)
        _jax.block_until_ready(state)
        timings["resident_s"] = round(_time.time() - t0, 1)
    if serve_batch:
        # mirror predict/serve: the dispatched batch is rounded up to the
        # mesh's data axis, so the warmed graph is the one they will hit
        from pldepth_tpu.core.mesh import round_batch

        serve_batch = round_batch(serve_batch, trainer.mesh)
        imgs = _np.zeros(
            (serve_batch, cfg.input_size, cfg.input_size, 3), _np.float32
        )
        t0 = _time.time()
        _jax.block_until_ready(trainer.jit_predict()(state, imgs))
        timings["predict_s"] = round(_time.time() - t0, 1)
        t0 = _time.time()
        _jax.block_until_ready(
            trainer.jit_predict(fused="bn_fold")(state, imgs)
        )
        timings["predict_bnfold_s"] = round(_time.time() - t0, 1)
    click.echo(json.dumps({"cache_dir": cache_dir, **timings}))


@cli.command()
@_reference_options
@click.option("--num_runs", default=8, type=click.INT)
@click.option("--search", default="random",
              type=click.Choice(["random", "grid", "tpe", "wandb"]))
@click.option("--target", default="test_error")
@click.option("--space", "space_name", default="base",
              help="search space name (sweep/search_spaces.py)")
@click.option("--sweep_id", default=None,
              help="wandb backend: re-attach an agent to an existing sweep "
                   "(reference hyperopt/restart_sweep.py)")
def sweep(num_runs, search, target, space_name, sweep_id, **kw):
    """Hyperparameter sweep (reference pldepth/hyperopt/sweep.py adapters).

    --search wandb drives the runs through a wandb sweep server (bayes);
    random/grid/tpe run fully locally with sweep_state.jsonl resume."""
    cfg = _make_config(kw)
    if search == "wandb":
        from pldepth_tpu.sweep.sweep import run_wandb_sweep

        best = run_wandb_sweep(cfg, num_runs=num_runs, target=target,
                               space_name=space_name, sweep_id=sweep_id)
    else:
        from pldepth_tpu.sweep.sweep import run_sweep

        best = run_sweep(cfg, num_runs=num_runs, search=search, target=target,
                         space_name=space_name)
    click.echo(json.dumps(best, indent=2))


if __name__ == "__main__":
    cli()
