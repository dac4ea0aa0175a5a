"""Experiment configuration.

The reference spread its configuration over three systems: per-script Click
options (pldepth/PLDepth.py:28-46), a ``ModelParameters`` dict bag
(pldepth/models/models_meta.py:27-70) and an INI file (conf/run.ini). This
module collapses them into one frozen dataclass. The CLI (pldepth_tpu/cli.py)
preserves the reference's canonical flag names (--model_name, --epochs,
--batch_size, --seed, --ranking_size, --rankings_per_image, --initial_lr,
--equality_threshold, --model_checkpoints, --load_model_path, --augmentation,
--warmup, --sampling_type, --lr_multi, --ds_size).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional, Tuple


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for SPMD training.

    The reference has no distributed support at all (single-device Keras
    fit, pldepth/PLDepth.py:176). Here the mesh is first-class: ``data`` is
    the data-parallel axis (gradients are psum-reduced over ICI by XLA) and
    ``model`` is reserved for channel/spatial sharding of larger backbones.
    """

    data: int = -1  # -1 => use all available devices
    model: int = 1
    axis_names: Tuple[str, str] = ("data", "model")

    def resolved_data(self, n_devices: int) -> int:
        if self.data == -1:
            assert n_devices % self.model == 0, (
                f"device count {n_devices} not divisible by model={self.model}"
            )
            return n_devices // self.model
        return self.data


@dataclass(frozen=True)
class ExperimentConfig:
    # --- reference CLI surface (pldepth/PLDepth.py:28-46) ---
    model_name: str = "ff_effnet"  # ff_effnet | ff_redweb | ff_effnet_b4 ...
    epochs: int = 50
    batch_size: int = 4  # global batch size
    seed: int = 0
    ranking_size: int = 3
    rankings_per_image: int = 100
    initial_lr: float = 0.01
    equality_threshold: float = 0.03  # tau of the WHDR ratio test
    model_checkpoints: bool = False
    load_model_path: str = ""
    augmentation: bool = True
    warmup: int = 0
    sampling_type: int = 1  # 0=thresholded, 1=info_score, 3=purely_masked
    lr_multi: float = 0.25
    ds_size: Optional[int] = None

    # --- data ---
    dataset: str = "HR-WSI"
    data_root: str = ""
    input_size: int = 224  # square model input (reference: 224 or 448)
    val_rankings_per_img: Optional[int] = None  # defaults to rankings_per_image
    val_split_denom: int = 15  # reference: take(ds_size//15) as val
    # Sampler candidate multiplier (reference batch_size_factor). None =
    # each sampler's own reference default (masked/thresholded 1.5,
    # info_score 5 — sampling.py:157,218; the provider never overrides
    # them, hourglass_provider.py:81). Set to force one factor everywhere.
    oversample_factor: Optional[float] = None
    # Masked pixel-draw strategy: auto | compact | rejection. "auto" =
    # argsort compaction — measured fastest in-step at every config
    # (docs/BENCH.md); rejection kept for ablation.
    sampler_draw_method: str = "auto"
    # host pipeline: batches prefetched ahead by the background producer
    # (BatchIterator prefetch / native ring capacity). Shuffling is a full
    # per-epoch permutation — strictly stronger than the reference's
    # shuffle(1024) window (hourglass_provider.py:60).
    prefetch_depth: int = 2
    # Host streaming wire format: send images/masks as uint8 (gt stays
    # f32), 4x less host->device transfer; the jitted step rescales on
    # device. Exact for 8-bit-source data (jpg/png); quantizes synthetic
    # float images to 1/255 steps — hence off by default for parity.
    # The native packed reader (--pack_cache) always uses this format.
    uint8_wire: bool = False
    # Device-resident training data (data/resident.py): upload the whole
    # train split to HBM once (6 bytes/pixel) and draw batches on device —
    # zero per-step host traffic; fed rate == device step rate. Batch
    # composition becomes per-step uniform draws with replacement from each
    # device's shard (the reference's shuffle(1024)+repeat was also not a
    # true epoch permutation). Requires the split to fit alongside the
    # model/optimizer in HBM.
    data_resident: bool = False
    # With data_resident: run this many train steps per jit dispatch
    # (lax.scan chain, Trainer.resident_chain). Removes per-step dispatch
    # latency — the host only syncs once per chunk. Preemption/SIGTERM
    # granularity becomes one chunk. 1 = plain per-step dispatch.
    resident_chain_steps: int = 1

    # --- schedule / optimizer ---
    schedule: str = "sgdr"  # sgdr | step | constant
    lr_decay: float = 0.9
    sgdr_mult_factor: float = 1.0
    sgdr_cycle_epochs: Optional[int] = None  # None => epochs (non-cyclic)
    step_milestones: Tuple[int, ...] = (80, 120, 160, 180)
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-7  # keras Adam default epsilon
    grad_accum: int = 1

    # --- model ---
    freeze_encoder: bool = True  # BN-only-trainable encoder, as reference
    pretrained_path: str = ""  # offline converted backbone weights (.npz)
    compute_dtype: str = "bfloat16"  # MXU-native; params stay float32
    remat_encoder: bool = False
    # Evaluate the full-res decoder tail only at the sampled ranking pixels
    # during training (ops/sparse_tail.py) — exact through the last BN.
    # Measured slower at the headline config (docs/BENCH.md), so off by
    # default; useful for point-query serving and very large resolutions.
    sparse_tail: bool = False
    # Compressed-residual training for the encoder's BN/swish chain
    # (ops/qres.py): "" = off (exact), "int8" or "bf16" store the backward
    # residual compressed. Forward numerics unchanged; gradients perturbed
    # by the compression (tests/test_qres.py bounds). ff_effnet family.
    qres: str = ""
    # Frozen-encoder byte-floor probe: run the encoder SERVING-style inside
    # the train step ("bf16" = BN-folded inference graph, "int8" = the
    # quantized serving graph) under stop_gradient; only the decoder
    # trains. DEVIATES from the reference's BN-only-trainable freezing
    # (encoder BN affine + running stats are frozen too); requires
    # freeze_encoder, ff_effnet family. "int8" needs
    # Trainer.prepare_qenc(state, calib_images) before the first step.
    # Measured verdict in docs/BENCH.md.
    qenc: str = ""
    # Collapse the final upsample+head conv into one half-res phase conv
    # (ops/fused_tail.py) — value-equal to compute-dtype rounding; saves the
    # full-res 32-channel tensor and the 1-channel-conv lane waste.
    fused_tail: bool = True
    # Width of the last two skip-concat decoder stages (ff_effnet family).
    # 32 = the reference decoder width (pl_hourglass.py:88-95). 128 fills
    # the TPU lane dimension at those stages — DEVIATES from the reference
    # architecture (more params/FLOPs, different trained function); measured
    # verdict in docs/BENCH.md.
    decoder_head_ch: int = 32

    # --- loss ---
    listmle_impl: str = "auto"  # auto | pallas | xla

    # --- parallelism ---
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Spatial partitioning (SP): shard the image H axis over the mesh
    # "model" axis; XLA's SPMD partitioner inserts the conv halo exchanges
    # and BN cross-shard reductions. For inputs whose activations exceed one
    # chip's HBM (e.g. ff_effnet_b7 at 1024^2+). Requires mesh.model > 1 and
    # input_size divisible by mesh.model. No reference equivalent
    # (single-device Keras fit, pldepth/PLDepth.py:176).
    spatial_sharding: bool = False

    # --- observability / io ---
    output_dir: str = "runs"
    # call a callback's on_step_end every N steps (per-batch LR logging
    # parity, reference LearningRateLoggingCallback training_utils.py:7-17);
    # 0 disables
    log_every: int = 0
    # resumable full-state autosave cadence in fit() (preemption saves are
    # unconditional)
    checkpoint_every_epochs: int = 1
    keep_checkpoints: int = 3
    use_wandb: bool = False
    use_tensorboard: bool = False
    # mlflow sink (reference env.py:28-37 init_mlflow + tracking_utils.py:8-10
    # param logging); gated on the package being importable
    use_mlflow: bool = False
    mlflow_tracking_uri: str = ""
    profile: bool = False
    # Accuracy-parity report (docs/PARITY.md runbook): after training, run
    # the full test_data_eval-equivalent report (ordinal error, WHDR(tau),
    # NDCG@200) on the val split and emit parity_report.json with pass/fail
    # against the paper budget: pass iff WHDR(0.03) <= target + budget.
    # target < 0 skips the verdict (metrics only).
    parity_report: bool = False
    parity_target_whdr: float = -1.0  # the paper's WHDR for this config
    parity_budget: float = 0.005  # BASELINE.md north star: within 0.5%

    # ------------------------------------------------------------------
    @property
    def val_rpi(self) -> int:
        return (
            self.val_rankings_per_img
            if self.val_rankings_per_img is not None
            else self.rankings_per_image
        )

    @property
    def input_shape(self) -> Tuple[int, int, int]:
        return (self.input_size, self.input_size, 3)

    def replace(self, **kwargs: Any) -> "ExperimentConfig":
        return dataclasses.replace(self, **kwargs)

    # -- (de)serialization ------------------------------------------------
    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ExperimentConfig":
        # underscore-prefixed keys are comments (JSON has none; the
        # checked-in configs use "_comment" for provenance notes)
        d = {k: v for k, v in d.items() if not k.startswith("_")}
        mesh = d.pop("mesh", None)
        known = {f.name for f in dataclasses.fields(cls)}
        unknown = set(d) - known
        if unknown:
            raise ValueError(f"Unknown config keys: {sorted(unknown)}")
        cfg = cls(**d)
        if mesh is not None:
            if isinstance(mesh, Mapping):
                mesh_d = dict(mesh)
                if "axis_names" in mesh_d:
                    mesh_d["axis_names"] = tuple(mesh_d["axis_names"])
                mesh = MeshConfig(**mesh_d)
            cfg = cfg.replace(mesh=mesh)
        if isinstance(cfg.step_milestones, list):
            cfg = cfg.replace(step_milestones=tuple(cfg.step_milestones))
        return cfg

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(s))


SAMPLING_TYPE_NAMES = {
    # numeric codes preserved from pldepth/PLDepth.py:97-108
    0: "thresholded",
    1: "info_score",
    2: "masked",
    3: "purely_masked",
    # extension: heterogeneous segment-based sampling (the capability the
    # reference declared via run_scripts/instance_sample.py but never shipped)
    4: "segment",
}


def sampler_name_for_type(sampling_type: int) -> str:
    if sampling_type not in SAMPLING_TYPE_NAMES:
        raise ValueError(
            f"wrong selection of sampling type: {sampling_type} "
            f"(valid: {sorted(SAMPLING_TYPE_NAMES)})"
        )
    return SAMPLING_TYPE_NAMES[sampling_type]
