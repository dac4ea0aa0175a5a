"""Run logging: JSONL + CSV always-on, wandb/mlflow/TB when requested.

The reference juggled three overlapping systems — wandb (primary,
pldepth/PLDepth.py:60-71,190-209), mlflow (mostly dormant: tracking-uri
init at util/env.py:28-37, param logging at util/tracking_utils.py:8-18)
and TensorBoard/CSVLogger (PLDepth_info_score.py:99-100). Here one
MetricLogger always writes local JSONL (machine-readable) + CSV
(spreadsheet-friendly) and *optionally* forwards to wandb, mlflow and/or
TensorBoard when the package exists and the run asks for it (this image
has neither wandb nor mlflow; everything degrades gracefully). No API keys
in code — the reference hardcoded one (env.py:62), explicitly not
replicated.
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Any, Dict, Optional

log = logging.getLogger(__name__)


class MetricLogger:
    def __init__(
        self,
        output_dir: str,
        run_name: str = "run",
        config: Optional[Dict[str, Any]] = None,
        use_wandb: bool = False,
        wandb_project: str = "pldepth-tpu",
        use_tensorboard: bool = False,
        use_mlflow: bool = False,
        mlflow_tracking_uri: str = "",
    ):
        self.dir = os.path.join(output_dir, run_name)
        os.makedirs(self.dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self._csv_path = os.path.join(self.dir, "metrics.csv")
        self._csv_fields: Optional[list] = None
        self._csv_file = None
        self._wandb = None
        self._tb = None
        self._mlflow = None
        self.summary: Dict[str, Any] = {}
        if config:
            with open(os.path.join(self.dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        if use_wandb:
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=wandb_project, name=run_name, config=config or {}
                )
            except Exception as e:  # pragma: no cover
                log.warning("wandb requested but unavailable (%s); local-only", e)
        if use_tensorboard:
            # reference third sink (tracking_utils.py:33-39 TB callback);
            # torch's SummaryWriter avoids a TF dependency
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(log_dir=os.path.join(self.dir, "tb"))
            except Exception as e:  # pragma: no cover
                log.warning("tensorboard requested but unavailable (%s)", e)
        if use_mlflow:
            # reference mlflow glue: tracking-uri init (env.py:28-37) +
            # param-dict logging (tracking_utils.py:8-10)
            try:
                import mlflow  # type: ignore

                if mlflow_tracking_uri:
                    mlflow.set_tracking_uri(mlflow_tracking_uri)
                mlflow.start_run(run_name=run_name)
                if config:
                    mlflow.log_params(
                        {k: str(v)[:500] for k, v in config.items()}
                    )
                self._mlflow = mlflow
            except Exception as e:  # pragma: no cover
                log.warning("mlflow requested but unavailable (%s); local-only", e)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None):
        rec = {"_time": time.time(), **({"step": step} if step is not None else {}),
               **metrics}
        self._jsonl.write(json.dumps(rec, default=float) + "\n")
        self._jsonl.flush()
        self._write_csv(rec)
        if self._wandb is not None:  # pragma: no cover
            self._wandb.log(metrics, step=step)
        if self._tb is not None:
            for k, v in metrics.items():
                if isinstance(v, (int, float)) and v is not None:
                    self._tb.add_scalar(k, v, global_step=step)
        self._log_backends(metrics, step)

    def _write_csv(self, rec: Dict[str, Any]):
        """CSV row with a schema that GROWS: the first record must not
        freeze the column set (per-step `step_*` records used to lock out
        every later epoch record's loss/val_loss/lr columns via
        extrasaction='ignore'). New keys rewrite the file with the union
        header, preserving prior rows."""
        if self._csv_fields is None and os.path.exists(self._csv_path):
            # --resume: adopt the existing header so prior columns survive
            with open(self._csv_path, newline="") as f:
                first = f.readline().strip()
            self._csv_fields = first.split(",") if first else None
        fields = self._csv_fields or []
        new_keys = [k for k in rec if k not in fields]
        if new_keys:
            fields = fields + new_keys
            rows = []
            if self._csv_file is not None:
                self._csv_file.close()
                self._csv_file = None
            if os.path.exists(self._csv_path):
                with open(self._csv_path, newline="") as f:
                    rows = list(csv.DictReader(f))
            self._csv_file = open(self._csv_path, "w", newline="")
            self._csv = csv.DictWriter(
                self._csv_file, fieldnames=fields, extrasaction="ignore"
            )
            self._csv.writeheader()
            for r in rows:
                self._csv.writerow(r)
            self._csv_fields = fields
        if self._csv_file is None:  # schema already known (e.g. resume)
            self._csv_file = open(self._csv_path, "a", newline="")
            self._csv = csv.DictWriter(
                self._csv_file, fieldnames=self._csv_fields,
                extrasaction="ignore",
            )
            if os.path.getsize(self._csv_path) == 0:
                self._csv.writeheader()
        self._csv.writerow({k: rec.get(k) for k in self._csv_fields})
        self._csv_file.flush()

    def _log_backends(self, metrics: Dict[str, Any], step: Optional[int]):
        if self._mlflow is not None:
            scalars = {
                k: float(v) for k, v in metrics.items()
                if isinstance(v, (int, float))
            }
            if scalars:
                self._mlflow.log_metrics(scalars, step=step or 0)

    def set_summary(self, **kwargs):
        """wandb.run.summary equivalent (PLDepth.py:190-193)."""
        self.summary.update(kwargs)
        with open(os.path.join(self.dir, "summary.json"), "w") as f:
            json.dump(self.summary, f, indent=2, default=float)
        if self._wandb is not None:  # pragma: no cover
            for k, v in kwargs.items():
                self._wandb.summary[k] = v
        if self._tb is not None:
            for k, v in kwargs.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(f"summary/{k}", v)
        if self._mlflow is not None:
            scalars = {
                f"summary_{k}": float(v) for k, v in kwargs.items()
                if isinstance(v, (int, float))
            }
            if scalars:
                self._mlflow.log_metrics(scalars)

    def log_images(self, images: Dict[str, Any], captions: Optional[Dict[str, str]] = None):
        """Example-image logging (reference PLDepth.py:196-209: wandb.Image
        of input / gt / predicted depth at train end).

        Always writes PNGs under ``<run>/examples/`` (grayscale maps are
        min-max scaled to u8; RGB passes through); forwards to wandb when
        active. Values: (H, W) float maps or (H, W, 3) images in [0, 1].
        """
        import numpy as np

        ex_dir = os.path.join(self.dir, "examples")
        os.makedirs(ex_dir, exist_ok=True)
        captions = captions or {}
        for name, arr in images.items():
            a = np.squeeze(np.asarray(arr)).astype(np.float64)
            if a.ndim == 3:  # RGB in [0,1] passes through (docstring contract)
                u8 = (a * 255.0).clip(0, 255).astype(np.uint8)
            else:  # grayscale maps are min-max scaled
                lo, hi = float(a.min()), float(a.max())
                u8 = np.zeros_like(a, np.uint8) if hi - lo < 1e-12 else (
                    (a - lo) * 255.0 / (hi - lo)
                ).astype(np.uint8)
            try:
                from PIL import Image

                Image.fromarray(u8).save(os.path.join(ex_dir, f"{name}.png"))
            except Exception as e:  # pragma: no cover
                log.warning("could not write example image %s: %s", name, e)
            if self._wandb is not None:  # pragma: no cover
                import wandb  # type: ignore

                self._wandb.log(
                    {name: wandb.Image(np.asarray(arr), caption=captions.get(name, name))}
                )
            if self._tb is not None:
                self._tb.add_image(
                    name, u8[..., None] if u8.ndim == 2 else u8, dataformats="HWC"
                )

    def close(self):
        self._jsonl.close()
        if self._csv_file:
            self._csv_file.close()
        if self._wandb is not None:  # pragma: no cover
            self._wandb.finish()
        if self._tb is not None:
            self._tb.close()
        if self._mlflow is not None:
            self._mlflow.end_run()
