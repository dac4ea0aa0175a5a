"""The single Trainer: jitted SPMD train step with fused on-device sampling.

The reference had *no* shared trainer — every experiment script re-assembled
params -> sampler -> model -> loss -> optimizer -> datasets -> callbacks ->
``model.fit`` by copy-paste (SURVEY.md §1; compare pldepth/PLDepth.py:47-177
with run_scripts/rnd_PLDepth.py:49-152 etc.). This class is the one train
loop all entry points share.

TPU-first design:

* One jitted ``train_step`` does flip augmentation, ranking sampling,
  normalization, forward, fused ListMLE loss, backward and the optimizer
  update — zero host work per step beyond feeding the raw (image, gt, mask)
  batch. The reference crossed the host boundary every step for sampling
  (tf.numpy_function, hourglass_provider.py:55-58).
* Data parallelism via ``NamedSharding`` over the mesh's "data" axis: the
  batch is sharded, state replicated; XLA inserts the gradient psum over ICI.
* Encoder freezing is an ``optax.multi_transform`` partition (zero updates
  to frozen leaves) rather than Keras layer.trainable flags.
* NaN guard: jitted all-finite check folded into the step output
  (reference: keras TerminateOnNaN callback, PLDepth.py:163).
* Checkpoint/resume via Orbax (params + BN stats + optimizer state + step;
  the reference's weights-only .h5 saves lost optimizer state,
  SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import logging
import os
import signal
import threading
import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from pldepth_tpu.core.config import ExperimentConfig, sampler_name_for_type
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.core.rng import fold_in_str
from pldepth_tpu.data.preprocess import normalize_images, random_flip_batch
from pldepth_tpu.models import get_pl_depth_net, partition_params
from pldepth_tpu.ops import pl_ranking_loss, pl_ranking_loss_from_scores
from pldepth_tpu.sampling import get_sampler, sample_rankings_batch
from pldepth_tpu.train.schedules import build_schedule

log = logging.getLogger(__name__)

# Measurement escape hatch: disable the stop_gradient on frozen encoder
# leaves (see Trainer._build_train_step.loss_fn) to restore the old
# compute-then-zero backward for A/B benchmarking.
_NO_SG_FROZEN = os.environ.get("PLDEPTH_NO_SG_FROZEN") == "1"


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng_root: jax.Array


@struct.dataclass
class StepMetrics:
    loss: jax.Array
    lr: jax.Array
    finite: jax.Array  # bool: loss and grads all finite (TerminateOnNaN)


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        steps_per_epoch: int,
        mesh=None,
    ):
        self.cfg = cfg
        self.steps_per_epoch = max(1, steps_per_epoch)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        self.model = get_pl_depth_net(
            cfg.model_name, cfg.compute_dtype, remat=cfg.remat_encoder,
            fused_tail=cfg.fused_tail, head_ch=cfg.decoder_head_ch,
            qres=cfg.qres or None,
        )
        self._qenc_module = None
        self._qenc_enc_params = None
        if cfg.qenc:
            if cfg.qenc not in ("bf16", "int8"):
                raise ValueError(f"qenc must be ''|'bf16'|'int8', got {cfg.qenc!r}")
            if not cfg.freeze_encoder:
                raise ValueError("qenc requires freeze_encoder (the probe "
                                 "serves a FROZEN encoder in the train step)")
            if cfg.qres:
                raise ValueError("qenc and qres are mutually exclusive")
            if "redweb" in cfg.model_name:
                raise ValueError("qenc is implemented for the ff_effnet family")
            self._qenc_module = self.model.module.clone(qenc=cfg.qenc)
        elif (cfg.pretrained_path and cfg.freeze_encoder
              and "redweb" not in cfg.model_name and not cfg.qres):
            # exactly qenc's proven premise (docs/BENCH.md "Frozen-encoder
            # serving-style forward": +77% step throughput, metric deltas
            # inside the trainer-seed noise floor with a pretrained encoder)
            log.info(
                "pretrained frozen encoder detected: --qenc bf16 runs the "
                "encoder serving-style in the train step (+77% measured at "
                "the headline config, quality-gated at this premise — "
                "docs/BENCH.md)")
        self.sampler_name = sampler_name_for_type(cfg.sampling_type)
        get_sampler(self.sampler_name)
        self.schedule = build_schedule(cfg, self.steps_per_epoch)
        self._tx: Optional[optax.GradientTransformation] = None
        self._train_step = None
        self._train_step_fixed = None
        self._raw_train_step = None
        self._resident_step = None
        self._raw_resident_step = None
        self._resident_chains = {}  # chain length -> jitted scan
        self._eval_step = None
        self._jit_predict = {}  # fused flag -> jitted serving fn
        self._stop_requested = False

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------
    def make_optimizer(self, params) -> optax.GradientTransformation:
        cfg = self.cfg
        # The schedule is parameterized in MICRO-steps (fit's steps_per_epoch).
        # Under MultiSteps the inner optimizer's count advances once per k
        # micro-steps, so it must be rescaled back to the schedule's clock —
        # otherwise the LR decays k× too slowly while metrics.lr (computed
        # from state.step, a micro-step counter) reports the intended value.
        k = cfg.grad_accum
        lr = self.schedule if k <= 1 else (lambda count: self.schedule(count * k))
        self._inner_schedule = lr  # exposed for tests (micro-step rescale)
        adam = optax.amsgrad(
            learning_rate=lr,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
        )
        if k > 1:
            adam = optax.MultiSteps(adam, every_k_schedule=k)
        labels = partition_params(params, cfg.freeze_encoder)
        return optax.multi_transform(
            {"trainable": adam, "frozen": optax.set_to_zero()}, labels
        )

    def _ensure_tx(self) -> optax.GradientTransformation:
        if self._tx is None:
            # labels only need the params *structure*; eval_shape avoids a
            # real init when train_step is built before init_state
            shapes = jax.eval_shape(
                lambda: self.model.init_variables(
                    jax.random.key(0), self.cfg.input_shape
                )
            )
            self._tx = self.make_optimizer(shapes["params"])
        return self._tx

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.key(self.cfg.seed)
        variables = self.model.init_variables(
            fold_in_str(rng, "init"), self.cfg.input_shape
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.cfg.pretrained_path:
            from pldepth_tpu.models import pretrained

            params, batch_stats = pretrained.load_backbone(
                self.cfg.pretrained_path, params, batch_stats
            )
        self._ensure_tx()
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=self._tx.init(params),
            rng_root=fold_in_str(rng, "train"),
        )
        return self.replicate(state)

    def replicate(self, tree):
        sharding = NamedSharding(self.mesh, P())
        if jax.process_count() > 1:
            # device_put cannot target non-addressable devices; assemble the
            # replicated global array from identical per-process copies
            # (init is seeded, so every process computed the same values)
            def put(x):
                x = jnp.asarray(x)
                if jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
                    data = jax.make_array_from_process_local_data(
                        sharding, np.asarray(jax.random.key_data(x))
                    )
                    return jax.random.wrap_key_data(
                        data, impl=jax.random.key_impl(x)
                    )
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x)
                )

            return jax.tree_util.tree_map(put, tree)
        return jax.device_put(tree, sharding)

    def _spatial_axis(self) -> Optional[str]:
        """Mesh axis name for the image H dim under spatial partitioning."""
        if not self.cfg.spatial_sharding:
            return None
        if len(self.mesh.axis_names) < 2:
            raise ValueError(
                "spatial_sharding=True needs a 2-axis mesh (data, model); "
                f"got axes {self.mesh.axis_names} — pass --mesh_model N or "
                "a mesh with a model axis"
            )
        m = self.mesh.axis_names[1]
        if self.mesh.shape[m] <= 1:
            return None
        if self.cfg.input_size % self.mesh.shape[m]:
            raise ValueError(
                f"input_size {self.cfg.input_size} not divisible by the "
                f"spatial ({m}) axis of size {self.mesh.shape[m]}"
            )
        return m

    def shard_batch(self, batch: Dict[str, np.ndarray]):
        """Place a host batch onto the mesh, sharded on the leading axis.

        Single-host: a plain sharded device_put of the global batch.
        Multi-host (jax.distributed): each process holds only its shard of
        the global batch (BatchIterator's shard_index/num_shards), assembled
        into one global array without cross-host transfer.
        """
        multihost = jax.process_count() > 1
        h = self._spatial_axis()

        def put(k, x):
            rest = [None] * (np.ndim(x) - 1)
            if h is not None and k in ("image", "gt", "mask"):
                rest[0] = h  # rows over the spatial axis
            spec = P(self.mesh.axis_names[0], *rest)
            sharding = NamedSharding(self.mesh, spec)
            if multihost:
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding)

        return {k: put(k, v) for k, v in batch.items()}

    # ------------------------------------------------------------------
    # steps
    # ------------------------------------------------------------------
    def _loss_from_pred(self, pred, rankings):
        return pl_ranking_loss(pred, rankings, impl=self.cfg.listmle_impl)

    def _build_train_step(self, fixed_rankings: bool = False) -> Callable:
        """The one jitted step. ``fixed_rankings=True`` consumes precomputed
        (image, rankings) batches — the active-learning path (reference:
        model.fit on oracle-labeled lists, active_PLDepth.py rounds) — while
        the default path samples rankings on device from (image, gt, mask)."""
        cfg = self.cfg
        model = self.model
        tx = self._ensure_tx()

        def train_step(state: TrainState, batch) -> Tuple[TrainState, StepMetrics]:
            # uint8 wire format: images may arrive as [0,255] u8 (4x less
            # host->device traffic); rescale on device
            images = batch["image"]
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            else:
                images = images.astype(jnp.float32)
            key = jax.random.fold_in(state.rng_root, state.step)

            if fixed_rankings:
                rankings = batch["rankings"]
            else:
                gts = batch["gt"].astype(jnp.float32)
                masks = batch["mask"].astype(jnp.float32)
                if cfg.augmentation:
                    images, gts, masks = random_flip_batch(
                        jax.random.fold_in(key, 0), images, gts, masks
                    )
                rankings = sample_rankings_batch(
                    jax.random.fold_in(key, 1),
                    gts,
                    masks,
                    sampler_name=self.sampler_name,
                    rankings_per_image=cfg.rankings_per_image,
                    ranking_size=cfg.ranking_size,
                    threshold=cfg.equality_threshold,
                    # None -> the sampler's own reference default
                    # (SamplerSpec.oversample_factor)
                    oversample_factor=float(cfg.oversample_factor)
                    if cfg.oversample_factor is not None
                    else None,
                    draw_method=cfg.sampler_draw_method,
                )
            x = normalize_images(images, model.preprocess)

            if cfg.sparse_tail:
                # full-res head evaluated only at the ranked pixels
                # (ops/sparse_tail.py); scores come back pre-gathered in
                # rankings[..., 0] order
                b = x.shape[0]
                w = x.shape[2]
                flat = rankings[..., 0].astype(jnp.int32).reshape(b, -1)
                pixels = jnp.stack([flat // w, flat % w], axis=-1)
            else:
                pixels = None

            def loss_fn(params):
                # Frozen encoder leaves enter the forward under stop_gradient:
                # their grads become symbolic zeros, so XLA eliminates every
                # frozen weight-grad convolution AND the activation saves they
                # would need. Without this the finite-guard below (which reads
                # every grad leaf) keeps that dead backward work alive — the
                # optimizer was already zeroing those updates
                # (set_to_zero partition in make_optimizer). Escape hatch for
                # A/B measurement: PLDEPTH_NO_SG_FROZEN=1.
                # Guard-coverage note: with stop_gradient the frozen leaves'
                # grads are constant zeros, so the finite guard no longer sees
                # NaN/Inf that occur ONLY in frozen encoder weight grads
                # (benign: those updates were zeroed anyway, and a non-finite
                # activation still poisons the loss or trainable grads).
                if cfg.freeze_encoder and not _NO_SG_FROZEN:
                    labels = partition_params(params, True)
                    params = jax.tree_util.tree_map(
                        lambda p, l: jax.lax.stop_gradient(p)
                        if l == "frozen"
                        else p,
                        params,
                        labels,
                    )
                if cfg.qenc:
                    # Serving-style frozen-encoder forward (qenc probe): the
                    # encoder consumes BN-folded (bf16) or int8-quantized
                    # (prepare_qenc) parameters under stop_gradient; only
                    # decoder params/stats train. The bf16 fold runs inside
                    # the jit from the (frozen, hence constant) encoder
                    # params — per-channel math over ~MBs, negligible next
                    # to the step's activation traffic.
                    if cfg.qenc == "bf16":
                        from pldepth_tpu.models.bn_fold import fold_scope

                        enc_params = fold_scope(
                            params["encoder"], state.batch_stats["encoder"],
                            cfg.model_name,
                        )
                    else:  # int8: packed once by prepare_qenc
                        if self._qenc_enc_params is None:
                            raise RuntimeError(
                                "qenc='int8' needs Trainer.prepare_qenc("
                                "state, calib_images) before the first step"
                            )
                        enc_params = self._qenc_enc_params
                    enc_params = jax.lax.stop_gradient(enc_params)
                    stats_in = {
                        k: v for k, v in state.batch_stats.items()
                        if k != "encoder"
                    }
                    pred, updates = self._qenc_module.apply(
                        {
                            "params": {**params, "encoder": enc_params},
                            "batch_stats": stats_in,
                        },
                        x,
                        True,
                        pixels,
                        rngs={"droppath": jax.random.fold_in(key, 2)},
                        mutable=["batch_stats"],
                    )
                    new_stats = {
                        **state.batch_stats, **updates["batch_stats"]
                    }
                else:
                    pred, updates = model.module.apply(
                        {"params": params, "batch_stats": state.batch_stats},
                        x,
                        True,
                        pixels,
                        rngs={"droppath": jax.random.fold_in(key, 2)},
                        mutable=["batch_stats"],
                    )
                    new_stats = updates["batch_stats"]
                if pixels is None:
                    loss = self._loss_from_pred(pred, rankings)
                else:
                    loss = pl_ranking_loss_from_scores(
                        pred, rankings, impl=cfg.listmle_impl
                    )
                return loss, new_stats

            (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)

            finite = jnp.isfinite(loss) & jnp.all(
                jnp.asarray(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(grads)]
                )
            )
            # Keep the state unchanged on a non-finite step (TerminateOnNaN
            # semantics without host round-trip; the host decides to stop).
            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(finite, new, old),
                TrainState(
                    step=state.step + 1,
                    params=new_params,
                    batch_stats=new_stats,
                    opt_state=new_opt,
                    rng_root=state.rng_root,
                ),
                state.replace(step=state.step + 1),
            )
            metrics = StepMetrics(
                loss=loss, lr=self.schedule(state.step), finite=finite
            )
            return new_state, metrics

        d = self.mesh.axis_names[0]
        # Spatial partitioning: image rows sharded over the "model" axis;
        # XLA SPMD inserts conv halo exchanges + BN cross-shard reductions.
        h = self._spatial_axis()
        if fixed_rankings:
            batch_sharding = {
                "image": NamedSharding(self.mesh, P(d, h, None, None)),
                "rankings": NamedSharding(self.mesh, P(d, None, None, None)),
            }
        else:
            batch_sharding = {
                "image": NamedSharding(self.mesh, P(d, h, None, None)),
                "gt": NamedSharding(self.mesh, P(d, h, None)),
                "mask": NamedSharding(self.mesh, P(d, h, None)),
            }
        repl = NamedSharding(self.mesh, P())
        if not fixed_rankings:
            # unjitted body, reused by the resident-data step (which draws
            # the batch on device before entering the same computation)
            self._raw_train_step = train_step
        return jax.jit(
            train_step,
            in_shardings=(repl, batch_sharding),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def _build_resident_step(self) -> Callable:
        """Train step over a device-resident dataset (data/resident.py).

        One jit does everything: per-device uniform index draws from the
        local HBM shard (shard_map over the data axis — the device analogue
        of shard-local shuffling), u8/u16 decode, then the standard step body
        (augment + sample + forward + loss + update). Zero per-step
        host→device traffic — this finishes the kill on the reference's
        pipeline bottleneck (hourglass_provider.py:55-58): fed rate ==
        device rate.

        RNG: draw keys come from fold_in(rng_root, step) tagged "resident"
        and folded with the data-axis index, so every model-axis shard of a
        sample row draws identical indices (required under spatial
        partitioning) and the stream is resume-deterministic like the
        streaming path.
        """
        if self._raw_train_step is None:
            _ = self.train_step  # builds and stores the raw body
        raw_step = self._raw_train_step
        cfg = self.cfg
        d = self.mesh.axis_names[0]
        dsize = self.mesh.shape[d]
        if cfg.batch_size % dsize:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by data axis {dsize}"
            )
        local_b = cfg.batch_size // dsize
        h = self._spatial_axis()
        specs = {
            "image": P(d, h, None, None),
            "gt": P(d, h, None),
            "mask": P(d, h, None),
        }

        def draw(key, image, gt, mask):
            # local shard views: (N/D, H or H/M, W, ...)
            k = jax.random.fold_in(key, jax.lax.axis_index(d))
            idx = jax.random.randint(k, (local_b,), 0, image.shape[0])
            return (
                jnp.take(image, idx, axis=0),
                jnp.take(gt, idx, axis=0),
                jnp.take(mask, idx, axis=0),
            )

        mapped = jax.shard_map(
            draw,
            mesh=self.mesh,
            in_specs=(P(), specs["image"], specs["gt"], specs["mask"]),
            out_specs=(specs["image"], specs["gt"], specs["mask"]),
            check_vma=False,
        )

        def resident_step(state: TrainState, arrays) -> Tuple[TrainState, StepMetrics]:
            key = jax.random.fold_in(
                fold_in_str(state.rng_root, "resident"), state.step
            )
            image, gt_q, mask = mapped(
                key, arrays["image"], arrays["gt"], arrays["mask"]
            )
            batch = {
                "image": image,  # u8; the step body decodes
                "gt": gt_q.astype(jnp.float32) * arrays["gt_scale"],
                "mask": mask,
            }
            return raw_step(state, batch)

        self._raw_resident_step = resident_step
        repl = NamedSharding(self.mesh, P())
        store_sharding = {
            k: NamedSharding(self.mesh, s) for k, s in specs.items()
        }
        store_sharding["gt_scale"] = repl
        self._resident_shardings = (repl, store_sharding)
        return jax.jit(
            resident_step,
            in_shardings=(repl, store_sharding),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def resident_chain(self, n: int) -> Callable:
        """``n`` resident steps in ONE dispatch: lax.scan over the resident
        step body, metrics stacked per step (loss/lr/finite each shape (n,)).

        The resident store makes this possible — no host data is consumed
        per step, so an arbitrary number of steps can run device-side
        without returning to Python. This removes the per-step dispatch
        latency that separates the resident loop rate from the device step
        rate (measured on the tunnel-attached chip: 329 -> ~398 img/s);
        on production TPU VMs it also cuts the host out of the steady state
        entirely. Semantically identical to ``n`` resident_step calls: the
        draw/augment/sample RNG is a pure function of state.step, which the
        scan advances exactly as the single-step path does (bit-compatible
        resume is preserved across chain-size changes up to compiler
        reassociation).
        """
        if n <= 1:
            return self.resident_step
        fn = self._resident_chains.get(n)
        if fn is None:
            if self._raw_resident_step is None:
                _ = self.resident_step  # builds body + shardings
            one = self._raw_resident_step

            def chain(state: TrainState, arrays):
                def body(s, _):
                    s, m = one(s, arrays)
                    return s, (m.loss, m.lr, m.finite)

                state, (loss, lr, finite) = jax.lax.scan(
                    body, state, None, length=n
                )
                return state, StepMetrics(loss=loss, lr=lr, finite=finite)

            repl, store_sharding = self._resident_shardings
            fn = jax.jit(
                chain,
                in_shardings=(repl, store_sharding),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
            self._resident_chains[n] = fn
        return fn

    def _build_eval_step(self) -> Callable:
        model = self.model

        def eval_step(state: TrainState, batch) -> jax.Array:
            images = batch["image"]
            if images.dtype == jnp.uint8:
                images = images.astype(jnp.float32) / 255.0
            x = normalize_images(images.astype(jnp.float32), model.preprocess)
            pred = model.module.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                x,
                False,
            )
            return self._loss_from_pred(pred, batch["rankings"])

        repl = NamedSharding(self.mesh, P())
        d = self.mesh.axis_names[0]
        batch_sharding = {
            "image": NamedSharding(self.mesh, P(d, self._spatial_axis(), None, None)),
            "rankings": NamedSharding(self.mesh, P(d, None, None, None)),
        }
        return jax.jit(eval_step, in_shardings=(repl, batch_sharding), out_shardings=repl)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self._build_train_step()
        return self._train_step

    @property
    def train_step_fixed(self):
        """Step consuming {"image", "rankings"} batches (active learning)."""
        if self._train_step_fixed is None:
            self._train_step_fixed = self._build_train_step(fixed_rankings=True)
        return self._train_step_fixed

    @property
    def resident_step(self):
        """Step over a device-resident dataset: (state, store.arrays) ->
        (state, metrics). See data/resident.py + _build_resident_step."""
        if self._resident_step is None:
            self._resident_step = self._build_resident_step()
        return self._resident_step

    @property
    def eval_step(self):
        if self._eval_step is None:
            self._eval_step = self._build_eval_step()
        return self._eval_step

    def predict(self, state: TrainState, images: jax.Array) -> jax.Array:
        """Batched inference (replaces per-image model.predict loops of the
        reference eval/active paths, e.g. active_learning_method.py:101)."""
        x = normalize_images(jnp.asarray(images, jnp.float32), self.model.preprocess)
        pred = self.model.module.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x, False
        )
        return pred[..., 0] if pred.ndim == 4 else pred

    def predict_fused(self, state: TrainState, images: jax.Array) -> jax.Array:
        """predict() with the serving encoder fused: each eligible MBConv
        block runs as one VMEM-resident Pallas kernel (ops/fused_mbconv.py,
        models/fused_infer.py). ff_effnet family only; other models fall
        back to the standard path. Matches predict() to bf16 rounding."""
        from pldepth_tpu.models.decoders import SkipConcatDecoder
        from pldepth_tpu.models.fused_infer import encoder_infer, plan_encoder
        from pldepth_tpu.models.pldepth_net import EffNetFullyFledged

        module = self.model.module
        if not isinstance(module, EffNetFullyFledged):
            return self.predict(state, images)
        x = normalize_images(jnp.asarray(images, jnp.float32), self.model.preprocess)
        enc_p = state.params["encoder"]
        enc_s = state.batch_stats["encoder"]
        plans = plan_encoder(
            enc_p, enc_s, x.shape[1:3], module.variant, dtype=module.dtype
        )
        top, taps = encoder_infer(enc_p, enc_s, x, plans, dtype=module.dtype)
        pred = SkipConcatDecoder(
            dtype=module.dtype, fused_tail=module.fused_tail,
            head_ch=module.head_ch,
        ).apply(
            {
                "params": state.params["decoder"],
                "batch_stats": state.batch_stats["decoder"],
            },
            top,
            taps,
            False,
        )
        return pred[..., 0] if pred.ndim == 4 else pred

    def predict_bnfold(self, state: TrainState, images: jax.Array) -> jax.Array:
        """predict() with batch-norms folded into biased convs
        (models/bn_fold.py). The fold runs inside the jit — per-channel math
        over ~4M weight elements, negligible next to the forward — so the
        serving graph itself loses every BN op. Matches predict() to
        compute-dtype rounding (exact in f32, tests/test_bn_fold.py)."""
        from pldepth_tpu.models.bn_fold import fold_variables

        folded_module = self.model.module.clone(bn_fold=True)
        x = normalize_images(jnp.asarray(images, jnp.float32), self.model.preprocess)
        folded = fold_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            self.model.name,
        )
        pred = folded_module.apply(folded, x, False)
        return pred[..., 0] if pred.ndim == 4 else pred

    def prepare_quant(self, state: TrainState, calib_images) -> dict:
        """Calibrate and pack int8 serving variables (models/quantize.py).

        ``calib_images`` is one raw image batch or a list of batches in the
        same format ``predict`` takes; activation scales are calibrated on
        them (weights come from ``state``, BN-folded then quantized
        per-channel). Returns the variables ``predict_quant`` expects.
        """
        from pldepth_tpu.models.quantize import quantize_variables

        calib_module = self.model.module.clone(quant="calib")
        batches = (
            calib_images
            if isinstance(calib_images, (list, tuple))
            else [calib_images]
        )
        normalized = [
            normalize_images(jnp.asarray(b, jnp.float32), self.model.preprocess)
            for b in batches
        ]
        return quantize_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            self.model.name,
            calib_module,
            normalized,
        )

    def prepare_qenc(self, state: TrainState, calib_images) -> None:
        """qenc='int8' setup: calibrate + pack the ENCODER's int8 serving
        parameters (the decoder stays live/trainable). Must run before the
        first train step; the packed tree is captured as a jit constant at
        trace time (the encoder is frozen, so it never changes)."""
        if self.cfg.qenc != "int8":
            raise ValueError("prepare_qenc applies to qenc='int8' only")
        qvars = self.prepare_quant(state, calib_images)
        # Host round-trip, deliberately: quantize_variables passes
        # unquantized leaves through as the SAME arrays as state.params —
        # and the donating train step deletes those buffers on its first
        # call. A later retrace (e.g. a uint8-image batch) would then try
        # to embed deleted constants. Copies break the aliasing.
        self._qenc_enc_params = jax.device_put(
            jax.tree_util.tree_map(
                lambda a: np.asarray(jax.device_get(a)),
                qvars["params"]["encoder"],
            )
        )
        # the packed tree changes what the traced step captures: drop any
        # step compiled before preparation
        self._train_step = None
        self._train_step_fixed = None
        self._raw_train_step = None
        self._resident_step = None
        self._raw_resident_step = None
        self._resident_chains = {}

    def predict_quant(self, qvars: dict, images: jax.Array) -> jax.Array:
        """predict() on the int8 serving graph: every large conv (stem, all
        MBConv convs incl. depthwise, decoder 3x3s) runs int8 on the MXU
        with static calibrated activation scales; SE, the head conv and all
        epilogues stay bf16/f32. ``qvars`` comes from ``prepare_quant``.
        This chip measures int8 convs ~3x bf16 (docs/BENCH.md)."""
        module = self.model.module.clone(quant="int8")
        x = normalize_images(jnp.asarray(images, jnp.float32), self.model.preprocess)
        pred = module.apply(qvars, x, False)
        return pred[..., 0] if pred.ndim == 4 else pred

    @staticmethod
    def serving_mode(fused_encoder: bool, bn_fold: bool, quantize: str = "auto",
                     model_name: str = "ff_effnet"):
        """The one precedence policy for the serving CLI flags.

        ``quantize="auto"`` (the CLI default since round 4) serves the
        fastest graph whose ORDERING metrics pass the gate budgets
        (docs/BENCH.md "int8 metric gate"): int8 for the ff_effnet family
        (+7.4% over bn_fold at 448^2; ordinal/WHDR deltas within budget on
        both smooth and structured-scene data), but **bn_fold float for
        ff_redweb** — the round-5 structured-scenes gate measured ordinal
        +0.004..0.008 / WHDR +0.008..0.020 ordering degradation for its
        int8 graph at every achievable convergence level (the smooth-data
        gate had masked it). Auto also respects an explicit other choice
        (``--fused_encoder true`` or ``--bn_fold false``). Explicit
        ``--quantize int8`` wins over everything (it builds on the BN-fold
        internally); the fused Pallas encoder folds BN inside its kernels,
        so it supersedes (not composes with) the XLA-graph bn_fold.
        Returns the value ``jit_predict(fused=...)`` expects."""
        if quantize == "int8":
            if fused_encoder:
                log.warning(
                    "--quantize int8 supersedes --fused_encoder: the int8 "
                    "graph quantizes the XLA BN-folded convs; the fused "
                    "Pallas encoder flag is ignored"
                )
            return "quant"
        if (
            quantize == "auto" and not fused_encoder and bn_fold
            and "redweb" not in model_name
        ):
            return "quant"
        return True if fused_encoder else ("bn_fold" if bn_fold else False)

    def jit_predict(self, fused=False) -> Callable:
        """Data-parallel jitted serving fn: state replicated, the image
        batch sharded over the mesh data axis, each device running the
        forward on its local shard. Inference is per-image (BN uses running
        stats, SE pools per image), so ``jax.shard_map`` with no collectives
        is exact — and, unlike GSPMD propagation, it also partitions the
        fused Pallas path (models/fused_infer.py), whose custom calls XLA
        cannot split on its own. The reference served strictly single-device
        (pldepth/test_data_eval.py:30-108 per-image model.predict).

        Global batch must be divisible by the data-axis size. Memoized per
        ``fused`` flag: callers (Evaluator, active rounds, serve) would
        otherwise rebuild a fresh jax.jit wrapper — each with its own
        trace/compile cache — every round.
        """
        if fused in self._jit_predict:
            return self._jit_predict[fused]
        if fused == "bn_fold":
            fn = self.predict_bnfold
        elif fused == "quant":
            # first arg is prepare_quant() variables instead of TrainState;
            # the sharding specs below treat it identically (replicated)
            fn = self.predict_quant
        else:
            fn = self.predict_fused if fused else self.predict
        d = self.mesh.axis_names[0]
        if self.mesh.shape[d] <= 1:
            jitted = jax.jit(fn)
        else:
            mapped = jax.shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(P(), P(d)),
                out_specs=P(d),
                check_vma=False,
            )
            jitted = jax.jit(mapped)
        self._jit_predict[fused] = jitted
        return jitted

    def jit_predict_resident(self, local_batch: int) -> Callable:
        """Serving straight from the HBM-resident store: ``(state, images_u8,
        start) -> preds`` where ``images_u8`` is the store's sharded (N, H,
        W, 3) uint8 array and each device forwards ``local_batch`` of its own
        rows starting at per-shard offset ``start``. Zero host→device image
        traffic — the active-learning round over a resident pool uploads
        nothing per batch (the streaming path ships ~2.4 MB/image@448² over
        the host link; the reference uploaded per image,
        active_learning_method.py:101). Output row order is device-major:
        global output j came from store row ``(j // local_batch) *
        (N // n_devices) + start + j % local_batch``."""
        key = ("resident", local_batch)
        if key in self._jit_predict:
            return self._jit_predict[key]

        def fn(state, images_u8, start):
            imgs = jax.lax.dynamic_slice_in_dim(images_u8, start, local_batch, 0)
            return self.predict(state, imgs.astype(jnp.float32) / 255.0)

        d = self.mesh.axis_names[0]
        if self.mesh.shape[d] <= 1:
            jitted = jax.jit(fn)
        else:
            mapped = jax.shard_map(
                fn,
                mesh=self.mesh,
                in_specs=(P(), P(d, None, None, None), P()),
                out_specs=P(d),
                check_vma=False,
            )
            jitted = jax.jit(mapped)
        self._jit_predict[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    # loops
    # ------------------------------------------------------------------
    def request_stop(self) -> None:
        """Ask fit() to stop at the next step boundary (checkpoint first if a
        ``ckpt`` manager was given). Called by the SIGTERM handler on TPU
        preemption notice; safe to call from callbacks or other threads."""
        self._stop_requested = True

    @contextlib.contextmanager
    def _preemption_guard(self):
        """Route SIGTERM to request_stop() for the duration of fit().

        The reference had no preemption handling (SURVEY.md §5); here a
        preempted run checkpoints full state at the step boundary and the
        CLI's --resume continues it bit-compatibly."""
        if threading.current_thread() is not threading.main_thread():
            yield
            return
        def handler(signum, frame):
            log.warning("SIGTERM received — stopping at next step boundary")
            self.request_stop()
        prev = signal.signal(signal.SIGTERM, handler)
        try:
            yield
        finally:
            signal.signal(signal.SIGTERM, prev)

    def fit(
        self,
        state: TrainState,
        train_iter: Optional[Iterator[Dict[str, np.ndarray]]],
        epochs: Optional[int] = None,
        val_iter_factory: Optional[Callable[[], Iterator[Dict[str, np.ndarray]]]] = None,
        callbacks=(),
        ckpt=None,
        resident_store=None,
    ) -> Tuple[TrainState, Dict[str, list]]:
        """Run the train loop.

        ``ckpt``: optional CheckpointManager for resumable full-state saves,
        labeled by *global step*: one per epoch plus one on request_stop()/
        SIGTERM. Resume is driven by ``state.step``: a state restored from
        such a checkpoint continues mid-epoch, and the caller constructs the
        train_iter with ``start_step=state.step`` so the data stream,
        the per-step RNG (fold_in(rng_root, step)) and the LR schedule all
        line up with the uninterrupted run.

        ``resident_store``: a data/resident.py ResidentStore — train from
        HBM-resident data with on-device batch draws (zero per-step host
        traffic); ``train_iter`` is ignored (pass None). Resume stays exact:
        the draw stream is a pure function of (rng_root, step).
        """
        epochs = epochs if epochs is not None else self.cfg.epochs
        history: Dict[str, list] = {"loss": [], "val_loss": [], "lr": [], "ips": []}
        start_step = int(jax.device_get(state.step))
        start_epoch = start_step // self.steps_per_epoch
        offset = start_step % self.steps_per_epoch
        if start_step:
            log.info("resuming at step %d (epoch %d + %d steps)",
                     start_step, start_epoch, offset)
        preempted = False
        for cb in callbacks:
            cb.on_train_begin(self)
        resident = resident_store is not None
        with self._preemption_guard():
            next_batch = None if resident else self.shard_batch(next(train_iter))
            for epoch in range(start_epoch, epochs):
                t0 = time.time()
                losses = []
                finites = []
                last_lr = float("nan")
                first = offset if epoch == start_epoch else 0
                chain_n = self.cfg.resident_chain_steps if resident else 1
                if chain_n > 1:
                    # chained dispatch: k steps per jit call (resident data
                    # means no host feed, so whole chunks run device-side;
                    # SIGTERM lands between chunks — preemption granularity
                    # is chain_n steps, still checkpoint-exact)
                    step_i = first
                    while step_i < self.steps_per_epoch:
                        k = min(chain_n, self.steps_per_epoch - step_i)
                        state, m = self.resident_chain(k)(
                            state, resident_store.arrays
                        )
                        mloss = np.atleast_1d(jax.device_get(m.loss))
                        mlr = np.atleast_1d(jax.device_get(m.lr))
                        losses.extend(float(x) for x in mloss)
                        finites.extend(
                            bool(x)
                            for x in np.atleast_1d(jax.device_get(m.finite))
                        )
                        last_lr = float(mlr[-1])
                        if self.cfg.log_every:
                            for j in range(len(mloss)):
                                if (step_i + j + 1) % self.cfg.log_every:
                                    continue
                                for cb in callbacks:
                                    if hasattr(cb, "on_step_end"):
                                        cb.on_step_end(
                                            self,
                                            epoch * self.steps_per_epoch
                                            + step_i + j,
                                            {"loss": float(mloss[j]),
                                             "lr": float(mlr[j])},
                                        )
                        step_i += k
                        if self._stop_requested:
                            preempted = True
                            break
                    # falls through to the shared epoch-end block below
                    # (losses/finites already hold host floats/bools there)
                step_range = (
                    () if chain_n > 1 else range(first, self.steps_per_epoch)
                )
                for step_i in step_range:
                    if resident:
                        state, metrics = self.resident_step(
                            state, resident_store.arrays
                        )
                    else:
                        batch = next_batch
                        state, metrics = self.train_step(state, batch)
                        # overlap next host fetch + H2D transfer with the step
                        next_batch = self.shard_batch(next(train_iter))
                    losses.append(metrics.loss)
                    finites.append(metrics.finite)
                    last_lr = metrics.lr
                    # Bound in-flight steps: the remote-TPU transport has been
                    # observed to wedge with many queued executions + transfers;
                    # a 2-deep window still overlaps host feed with device work.
                    if len(losses) >= 2:
                        losses[-2].block_until_ready()
                    if self.cfg.log_every and (step_i + 1) % self.cfg.log_every == 0:
                        # per-batch logging parity (reference
                        # LearningRateLoggingCallback); opt-in — it costs a
                        # device sync per call
                        for cb in callbacks:
                            if hasattr(cb, "on_step_end"):
                                cb.on_step_end(
                                    self,
                                    epoch * self.steps_per_epoch + step_i,
                                    {"loss": float(metrics.loss),
                                     "lr": float(metrics.lr)},
                                )
                    if self._stop_requested:
                        preempted = True
                        break
                n_steps = len(losses)
                losses = [float(x) for x in jax.device_get(losses)]
                # metrics.finite covers grads too: a NaN backward with a
                # finite forward loss must still terminate (the in-step
                # guard keeps the old params, so continuing would train
                # nothing while looking healthy)
                finite = all(np.isfinite(losses)) and all(
                    bool(x) for x in jax.device_get(finites)
                )
                dt = time.time() - t0
                ips = n_steps * self.cfg.batch_size / dt
                epoch_loss = float(np.mean(losses)) if losses else float("nan")
                history["loss"].append(epoch_loss)
                history["lr"].append(float(last_lr))
                history["ips"].append(ips)

                if preempted:
                    if ckpt is not None:
                        step_now = int(jax.device_get(state.step))
                        # the process exits right after: block until durable
                        ckpt.save(step_now, state, force=True, wait=True)
                        log.warning("preemption checkpoint saved at step %d", step_now)
                    history["preempted"] = True
                    break

                val_loss = None
                if val_iter_factory is not None:
                    vlosses = [
                        float(self.eval_step(state, self.shard_batch(vb)))
                        for vb in val_iter_factory()
                    ]
                    val_loss = float(np.mean(vlosses)) if vlosses else float("nan")
                    history["val_loss"].append(val_loss)

                log.info(
                    "epoch %d loss=%.4f val=%s ips=%.1f lr=%.5f",
                    epoch, epoch_loss, f"{val_loss:.4f}" if val_loss is not None else "-",
                    ips, history["lr"][-1],
                )
                if ckpt is not None and (
                    (epoch + 1) % max(1, self.cfg.checkpoint_every_epochs) == 0
                    or epoch == epochs - 1
                ):
                    ckpt.save(int(jax.device_get(state.step)), state)
                for cb in callbacks:
                    cb.on_epoch_end(self, state, epoch, history)
                if not finite:
                    log.error("non-finite loss at epoch %d — terminating (NaN guard)", epoch)
                    break
        self._stop_requested = False
        for cb in callbacks:
            cb.on_train_end(self, state, history)
        return state, history
