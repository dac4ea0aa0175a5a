"""Benchmark: train images/sec/chip for ff_effnet @ 448^2, K=5, RPI=100.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The headline metric matches BASELINE.json config #1 (ff_effnet,
ranking_size=5, 448x448, info-score sampling). The measured quantity is the
full fused train step — on-device flip augment + ranking sampling + forward +
ListMLE + backward + amsgrad update — chained via lax.scan so tunnel dispatch
latency doesn't pollute the device number; a with-host-input number is also
recorded in the detail file.

vs_baseline: the reference publishes no numbers (BASELINE.md), so the
denominator is the measured TF2-on-CPU equivalent recorded in
baseline_measured.json (produced once by tools/measure_tf_baseline.py, which
rebuilds the reference's Keras EfficientNet-FFNet + host numpy info-score
sampler pipeline at the same config). If that file is absent, vs_baseline
falls back to the conservative stored estimate.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _attach_watchdog(seconds: int = 900) -> None:
    """A dead TPU tunnel makes the first jax call hang forever at ~0 CPU
    (client retry loop; see .claude/skills/verify/SKILL.md "Tunnel outage
    diagnosis"). Fail loudly instead so the caller gets a diagnosis, not a
    silent multi-hour hang. The timer is cancelled once devices attach."""
    import faulthandler
    import threading

    def bail():
        line = json.dumps(
            {
                "metric": "ERROR: TPU device attach timed out",
                "value": None,
                "unit": f"no devices after {seconds}s — tunnel down?",
                "vs_baseline": None,
            }
        )
        # stdout too: the caller records stdout, and a dead tunnel should
        # leave a diagnosis in the record, not an empty file.
        print(line, flush=True)
        print(line, file=sys.stderr)
        faulthandler.dump_traceback(file=sys.stderr)
        os._exit(17)

    t = threading.Timer(seconds, bail)
    t.daemon = True
    t.start()
    _attach_watchdog.cancel = t.cancel


def _calibrate_device(jax, min_tflops=40.0, retries=4, wait_s=75):
    """Measured matmul TFLOP/s on the attached chip — degraded-window guard.

    2026-08-20: the round-2 driver bench recorded 19.7 img/s for the exact
    code that measures 432 img/s (BENCH_r01/r02) — the chip or tunnel was
    degraded/contended during that window; a healthy v5e here sustains
    160-190 TFLOP/s on large bf16 matmuls. A throughput number taken in
    such a window says nothing about the framework, so: probe with a
    chained matmul, and if the device runs far below par, wait and re-probe
    before measuring. The result is recorded in bench_detail.json either
    way so a still-degraded measurement is at least labeled as such.
    """
    import jax.numpy as jnp

    n, N = 4096, 200

    @jax.jit
    def f(a):
        # (y @ y) / n keeps iterates at exactly 1.0 on the all-ones probe —
        # an earlier *0.001 scaling diverged to bf16 inf after ~6 of the 200
        # iterations (harmless for MXU timing, but the probe should exercise
        # representative finite values on every backend).
        return jax.lax.fori_loop(0, N, lambda i, y: (y @ y) * (1.0 / n), a)

    x = jnp.ones((n, n), jnp.bfloat16)
    jax.device_get(f(x)[0, 0])  # compile + settle the tunnel
    best = 0.0
    for attempt in range(retries + 1):
        t0 = time.time()
        jax.device_get(f(x)[0, 0])
        tf = 2 * N * n**3 / (time.time() - t0) / 1e12
        best = max(best, tf)
        if best >= min_tflops:
            return best, attempt
        print(
            f"# device degraded: matmul {tf:.1f} TFLOP/s < {min_tflops}; "
            f"waiting {wait_s}s (attempt {attempt + 1}/{retries})",
            file=sys.stderr,
        )
        if attempt < retries:
            time.sleep(wait_s)
    return best, retries


def _history_compare(key: str, ips: float, calib_tflops, path: str):
    """Calibration-normalized cross-round comparison.

    The chip window varies +-10% between driver rounds (r01 calibrated at
    174-193 TFLOP/s, r03 at 160.7); raw img/s numbers therefore move even
    when the code didn't (432.1 -> 398.4 across r01->r03 is window variance,
    not a regression). Normalizing by the same-window matmul calibration
    makes rounds comparable: img/s per calibrated TFLOP/s. This appends the
    run to bench_history.jsonl (committed) and returns
    (normalized, delta_vs_best_pct, best_prior, raw_delta_vs_best_pct)
    for the same config key.

    Outlier guard: the headline step is HBM-bound, so its rate does NOT
    track the matmul calibration (observed 2026-08-22: five runs at
    398.4-398.7 img/s while calibration wandered 136.6-161.5 TFLOP/s — the
    136.6 window's normalized 2.90 was an artifact of the denominator, not
    a faster run, and made every healthy run read "-12% vs best").
    A record whose calibration sits >8% below the same-key median cannot
    set the normalized record. The RAW delta vs the best recorded raw rate
    is returned alongside; a real code regression shows in both.
    """
    norm = (ips / calib_tflops) if (calib_tflops and ips) else None
    recs = []
    try:
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if rec.get("key") == key:
                    recs.append(rec)
    except FileNotFoundError:
        pass
    calibs = sorted(
        r["calib_tflops"] for r in recs
        if r.get("calib_tflops") and r.get("normalized")
    )
    med_calib = calibs[len(calibs) // 2] if calibs else None
    best = None
    for r in recs:
        if not r.get("normalized"):
            continue
        if (
            med_calib
            and r.get("calib_tflops")
            and r["calib_tflops"] < 0.92 * med_calib
        ):
            continue  # low-calibration window: inflated ratio, not a record
        if best is None or r["normalized"] > best["normalized"]:
            best = r
    # raw comparison only across calibrated (device) records — CPU smoke
    # runs record calib null and would make cross-backend raw deltas
    best_raw = max(
        (r["images_per_sec"] for r in recs
         if r.get("images_per_sec") and r.get("calib_tflops")),
        default=None,
    )
    raw_delta_pct = (
        100.0 * (ips / best_raw - 1.0)
        if (ips and best_raw and calib_tflops) else None
    )
    delta_pct = None
    if norm is not None and best is not None:
        delta_pct = 100.0 * (norm / best["normalized"] - 1.0)
        if delta_pct < -5.0 and (raw_delta_pct is None or raw_delta_pct < -2.0):
            print(
                f"# WARNING: calibration-normalized throughput dropped "
                f"{-delta_pct:.1f}% vs best recorded ({best['normalized']:.3f}"
                f" img/s per TFLOP/s at calib {best.get('calib_tflops'):.1f})"
                f" — the code, not the chip window, regressed",
                file=sys.stderr,
            )
    rec = {
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "key": key,
        "images_per_sec": ips,
        "calib_tflops": calib_tflops,
        "normalized": norm,
    }
    try:
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
    except OSError:
        pass
    return norm, delta_pct, best, raw_delta_pct


def main() -> None:
    _attach_watchdog(int(os.environ.get("BENCH_ATTACH_TIMEOUT", 900)))
    import jax
    import jax.numpy as jnp

    if os.environ.get("BENCH_FORCE_CPU"):
        # CPU smoke path. NOTE: the JAX_PLATFORMS=cpu env var is NOT enough
        # in this environment — plugin discovery still touches the axon
        # backend and hangs when the tunnel is down; the config update
        # bypasses it (same trick as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache (shared with the CLI, core/cache.py):
    # repeated bench runs at an unchanged config skip the full recompile.
    from pldepth_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    jax.devices()  # force backend init under the watchdog
    _attach_watchdog.cancel()

    calib_tflops, calib_retries = None, 0
    if (
        not os.environ.get("BENCH_FORCE_CPU")
        and not os.environ.get("BENCH_SKIP_CALIBRATION")
        # a silent CPU fallback would grind through the chained-matmul
        # probe for tens of minutes — calibration is a TPU-health check
        and jax.default_backend() not in ("cpu",)
    ):
        # re-arm the watchdog: a tunnel that attached but wedges mid-probe
        # (the documented flaky mode) would otherwise hang here forever
        _attach_watchdog(int(os.environ.get("BENCH_ATTACH_TIMEOUT", 900)))
        calib_tflops, calib_retries = _calibrate_device(jax)
        _attach_watchdog.cancel()

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    image_size = int(os.environ.get("BENCH_IMAGE_SIZE", 448))
    batch = int(os.environ.get("BENCH_BATCH", 32))
    scan_len = int(os.environ.get("BENCH_SCAN", 10))
    cfg = ExperimentConfig(
        model_name=os.environ.get("BENCH_MODEL", "ff_effnet"),
        input_size=image_size,
        batch_size=batch,
        ranking_size=int(os.environ.get("BENCH_K", 5)),
        rankings_per_image=100,
        sampling_type=1,  # info-score
        # Reference semantics: BN-only-trainable encoder (pl_hourglass.py:
        # 53-57) — the TF2-CPU denominator (tools/measure_tf_baseline.py)
        # measures the same frozen config. BENCH_FREEZE=0 restores the
        # heavier full-encoder-training step measured in earlier sessions.
        # NOTE: numbers recorded before 2026-08-19 (early bench_detail.json
        # entries) were measured with freeze_encoder=False — rerun with
        # BENCH_FREEZE=0 when comparing against them; the flag is recorded
        # in the output config either way.
        freeze_encoder=bool(int(os.environ.get("BENCH_FREEZE", "1"))),
        initial_lr=1e-3,
        sparse_tail=bool(int(os.environ.get("BENCH_SPARSE_TAIL", "0"))),
        fused_tail=bool(int(os.environ.get("BENCH_FUSED_TAIL", "1"))),
        remat_encoder=bool(int(os.environ.get("BENCH_REMAT", "0"))),
        sampler_draw_method=os.environ.get("BENCH_DRAW", "auto"),
        decoder_head_ch=int(os.environ.get("BENCH_HEAD_CH", "32")),
        qres=os.environ.get("BENCH_QRES", ""),
        qenc=os.environ.get("BENCH_QENC", ""),
    )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=max(2 * batch, 16), image_size=image_size, seed=0)
    # uint8 wire (image/mask as u8, device rescale): 4x less host->device
    # bytes on the python streaming path — decisive through the slow
    # tunnel; the f32 default preserves exact float synthetic values
    u8_wire = bool(int(os.environ.get("BENCH_U8_WIRE", "0")))
    if os.environ.get("BENCH_MODE") == "infer":
        u8_wire = False  # serving normalize expects [0,1] floats
    it = BatchIterator(ds, batch, seed=0, uint8_wire=u8_wire)
    host_batch = next(it)
    if cfg.qenc == "int8":
        # calibration expects [0,1] float images (normalize_images does not
        # rescale u8) — undo the wire format if enabled
        calib_imgs = host_batch["image"]
        if calib_imgs.dtype == np.uint8:
            calib_imgs = calib_imgs.astype(np.float32) / 255.0
        trainer.prepare_qenc(state, calib_imgs)

    if os.environ.get("BENCH_MODE") == "infer":
        # serving benchmark: batched forward only, resident input
        # Per-forward time via chained executions inside ONE jit, differencing
        # two chain lengths: block_until_ready can return early on this
        # backend and a host value fetch adds ~60ms tunnel RTT, so neither
        # single-call timing is truthful. Chained forwards must all execute
        # before the fetched value exists; the RTT cancels in the difference.
        import jax.numpy as jnp

        if os.environ.get("BENCH_QUANT") == "1":
            # int8 serving graph (models/quantize.py): `state` becomes the
            # calibrated+packed variables the quant forward consumes
            state = trainer.prepare_quant(state, host_batch["image"])
            predict_fn = trainer.predict_quant
        elif os.environ.get("BENCH_BN_FOLD") == "1":
            predict_fn = trainer.predict_bnfold
        elif os.environ.get("BENCH_FUSED_ENC") == "1":
            predict_fn = trainer.predict_fused
        else:
            predict_fn = trainer.predict

        def chain(n):
            def f(s, x):
                def body(_, xc):
                    p = predict_fn(s, xc)
                    return jnp.stack([p, p, p], axis=-1)
                return jax.lax.fori_loop(0, n, body, x).sum()
            return jax.jit(f)

        images = jax.device_put(host_batch["image"])
        # At small image sizes a short chain difference drowns in tunnel RTT
        # jitter — raise BENCH_INFER_CHAIN until the delta is >> noise.
        n_lo = 4
        n_hi = int(os.environ.get("BENCH_INFER_CHAIN", 16))
        f_lo, f_hi = chain(n_lo), chain(n_hi)
        _ = float(f_lo(state, images)); _ = float(f_hi(state, images))
        def med(f):
            ts = []
            for _ in range(5):
                t0 = time.time()
                _ = float(f(state, images))
                ts.append(time.time() - t0)
            return float(np.median(ts))
        st = (med(f_hi) - med(f_lo)) / (n_hi - n_lo)
        if st < 1e-4:  # faster than any possible dispatch: noise won
            print(
                f"# inference slope {st * 1e3:.3f} ms is below the noise "
                f"floor; re-run with a larger BENCH_INFER_CHAIN",
                file=sys.stderr,
            )
            st = float("nan")
        graph = (
            "int8" if os.environ.get("BENCH_QUANT") == "1"
            else "bn_fold" if os.environ.get("BENCH_BN_FOLD") == "1"
            else "fused" if os.environ.get("BENCH_FUSED_ENC") == "1"
            else "float"
        )
        ips_inf = batch / st
        hist_key = f"infer/{cfg.model_name}/{image_size}/{batch}/{graph}"
        norm, delta_pct, _, _raw_d = _history_compare(
            hist_key, ips_inf, calib_tflops,
            os.path.join(os.path.dirname(__file__), "bench_history.jsonl"),
        )
        print(
            json.dumps(
                {
                    "metric": f"inference images/sec/chip ({cfg.model_name}@{image_size}^2, {graph})",
                    "value": round(ips_inf, 2),
                    "unit": "images/sec/chip",
                    "vs_baseline": None,
                    "img_s_per_calib_tflops": round(norm, 3) if norm else None,
                    "normalized_delta_vs_best_pct": (
                        round(delta_pct, 1) if delta_pct is not None else None
                    ),
                }
            )
        )
        return

    # --- device throughput on a resident batch.
    # Chained-difference methodology: N dependent steps inside ONE jit
    # (lax.fori_loop) fetching a host value at the end, timed at two chain
    # lengths; the per-step time is the slope. This is the only measurement
    # this remote-TPU backend cannot inflate: block_until_ready (even on the
    # full output state) can return before execution completes here, and a
    # single host fetch adds ~60 ms of tunnel RTT that the difference
    # cancels. See docs/BENCH.md.
    import jax.numpy as jnp

    dev_batch = trainer.shard_batch(host_batch)

    def chain(n):
        def f(st, bt):
            def body(_, carry):
                st2, acc = carry
                st2, m2 = trainer.train_step(st2, bt)
                return (st2, acc + m2.loss)
            _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
            return acc
        return jax.jit(f)

    n_lo, n_hi = 2, 2 + scan_len
    f_lo, f_hi = chain(n_lo), chain(n_hi)
    _ = float(f_lo(state, dev_batch))  # compile
    _ = float(f_hi(state, dev_batch))

    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(f(state, dev_batch))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    step_time = max((med(f_hi) - med(f_lo)) / (n_hi - n_lo), 1e-6)
    ips = batch / step_time
    state, m = trainer.train_step(state, dev_batch)  # loss sample for detail

    flops = None
    try:
        ca = trainer.train_step.lower(state, dev_batch).compile().cost_analysis()
        ca0 = ca if isinstance(ca, dict) else ca[0]
        flops = float(ca0.get("flops", 0.0))
    except Exception:
        pass

    # Re-measure guard: transient contention *during* the short measurement
    # shows up as an implausibly slow step (headline config sustains ~22
    # TFLOP/s; the degraded round-2 window recorded 1.0) even when the
    # calibration probe above was healthy. Retry rather than record it.
    # Only for big steps (>=1 TFLOP counted): small/dispatch-dominated
    # configs (ff_smoke, tiny sizes) sit under the 5 TFLOP/s plausibility
    # bar legitimately, and the guard would bias them via min().
    if flops and flops >= 1e12 and calib_tflops and calib_tflops >= 40.0:
        for _ in range(2):
            if flops / step_time / 1e12 >= 5.0:
                break
            print(
                "# step implausibly slow vs healthy calibration; re-measuring",
                file=sys.stderr,
            )
            time.sleep(60)
            step_time = min(
                step_time, max((med(f_hi) - med(f_lo)) / (n_hi - n_lo), 1e-6)
            )
        ips = batch / step_time

    # --- qenc=bf16 rate (standing artifact): the serving-style frozen
    # encoder train step is the repo's biggest measured training win (+77%,
    # quality-gated at the pretrained premise — docs/BENCH.md). Re-measure
    # it each headline round so the claim tracks the chip/runtime, the same
    # way the qgate re-checks int8 serving. Headline config only; skip with
    # BENCH_SKIP_QENC=1.
    ips_qenc = None
    if (
        not os.environ.get("BENCH_SKIP_QENC")
        and cfg.model_name == "ff_effnet"
        and cfg.freeze_encoder
        and not cfg.qenc
        and not os.environ.get("BENCH_MODE")
        and jax.default_backend() not in ("cpu",)
    ):
        try:
            trainer_q = Trainer(
                cfg.replace(qenc="bf16"), steps_per_epoch=1, mesh=trainer.mesh
            )
            state_q = trainer_q.init_state()
            batch_q = trainer_q.shard_batch(host_batch)

            def chain_q(n):
                def f(st, bt):
                    def body(_, carry):
                        st2, acc = carry
                        st2, m2 = trainer_q.train_step(st2, bt)
                        return (st2, acc + m2.loss)
                    _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
                    return acc
                return jax.jit(f)

            fq_lo, fq_hi = chain_q(n_lo), chain_q(n_hi)
            _ = float(fq_lo(state_q, batch_q))  # compile
            _ = float(fq_hi(state_q, batch_q))

            def med_q(f):
                ts = []
                for _ in range(3):
                    t0 = time.time()
                    _ = float(f(state_q, batch_q))
                    ts.append(time.time() - t0)
                return float(np.median(ts))

            step_q = max((med_q(fq_hi) - med_q(fq_lo)) / (n_hi - n_lo), 1e-6)
            ips_qenc = batch / step_q
            _history_compare(
                f"train/{cfg.model_name}/{image_size}/{batch}"
                f"/K{cfg.ranking_size}/freeze1/qenc_bf16",
                ips_qenc, calib_tflops,
                os.path.join(os.path.dirname(__file__), "bench_history.jsonl"),
            )
            del trainer_q, state_q, batch_q, fq_lo, fq_hi
        except Exception as e:  # keep the bench robust
            print(f"# qenc rate bench skipped: {e}", file=sys.stderr)

    # --- with host input pipeline (python iterator) ---
    t0 = time.time()
    n_host = 5
    for i in range(n_host):
        state, m = trainer.train_step(state, trainer.shard_batch(next(it)))
        if i % 2 == 1:
            m.loss.block_until_ready()  # bounded in-flight (tunnel safety)
    jax.block_until_ready(m.loss)
    ips_host = n_host * batch / (time.time() - t0)
    it.close()

    # --- with the native packed-data pipeline (C++ mmap + prefetch ring) ---
    ips_native = None
    try:
        import tempfile

        from pldepth_tpu.data.packed import NativePackedIterator, pack_dataset

        pack_path = os.path.join(tempfile.gettempdir(), f"bench_{image_size}.pldpack")
        if not os.path.exists(pack_path):
            pack_dataset(ds, pack_path)
        nit = NativePackedIterator(pack_path, batch, seed=0)
        state, m = trainer.train_step(state, trainer.shard_batch(next(nit)))
        jax.block_until_ready(m.loss)
        t0 = time.time()
        for i in range(scan_len):
            state, m = trainer.train_step(state, trainer.shard_batch(next(nit)))
            if i % 2 == 1:
                m.loss.block_until_ready()
        jax.block_until_ready(m.loss)
        ips_native = scan_len * batch / (time.time() - t0)
        nit.close()
    except Exception as e:  # keep the bench robust
        print(f"# native pipeline bench skipped: {e}", file=sys.stderr)

    # --- device-resident dataset path (data/resident.py): the whole dataset
    # in HBM, per-step index draws + decode inside the jitted step. This is
    # the honest end-to-end "fed" rate — a real dispatch loop, not a fused
    # chain — and should sit at the device rate since no host data moves.
    ips_resident = None
    try:
        from pldepth_tpu.data import build_resident_store

        store = build_resident_store(ds, trainer.mesh)
        # NOTE: m_res, not m — the loss_sample in the detail file below must
        # keep sampling the main train step (and resident_chain's loss is a
        # (scan_len,) vector that float() would reject)
        state, m_res = trainer.resident_step(state, store.arrays)  # compile
        jax.block_until_ready(m_res.loss)
        t0 = time.time()
        for i in range(scan_len):
            state, m_res = trainer.resident_step(state, store.arrays)
            if i % 2 == 1:
                m_res.loss.block_until_ready()
        jax.block_until_ready(m_res.loss)
        ips_resident = scan_len * batch / (time.time() - t0)
    except Exception as e:  # keep the bench robust
        print(f"# resident-data bench skipped: {e}", file=sys.stderr)

    # --- chained resident dispatch (Trainer.resident_chain): scan_len steps
    # in ONE jit call — the steady-state production mode (--data_resident
    # --resident_chain_steps N). The gap between this and ips_resident is
    # pure per-step dispatch latency (large through the tunnel, small on a
    # TPU VM).
    ips_resident_chain = None
    if ips_resident is not None:
        try:
            # chain=32 saturates the dispatch-overhead curve (ms_per_step =
            # t + d/n with d ≈ 12 ms through the tunnel — the r03 "4% gap"
            # at chain=10 was exactly d/10; tools/bench_resident_chain.py
            # sweep, docs/BENCH.md). Chained-difference timing: D vs 2D
            # dispatches each ended by a real host fetch (block_until_ready
            # returns early on this backend), the fetch RTT cancels.
            # floor at 2: resident_chain(n<=1) degrades to resident_step,
            # whose loss is a scalar the [-1] fetch below would reject
            chain_n = max(32, scan_len) if scan_len >= 8 else max(scan_len, 2)
            chain = trainer.resident_chain(chain_n)

            def run_chain(st, dispatches):
                for _ in range(dispatches):
                    st, m_chain = chain(st, store.arrays)
                loss = m_chain.loss
                float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))
                return st

            state = run_chain(state, 1)  # compile + settle
            t0 = time.time()
            state = run_chain(state, 2)
            t_lo = time.time() - t0
            t0 = time.time()
            state = run_chain(state, 4)
            t_hi = time.time() - t0
            # A 2-vs-4-dispatch single-sample difference is noise-prone; a
            # non-positive delta (or one implying a rate faster than the
            # pure device step) is a failed measurement, not a result —
            # report the skip instead of clamping into an absurd figure.
            dt = (t_hi - t_lo) / 2
            cand = chain_n * batch / dt if dt > 0 else float("inf")
            if dt <= 0 or (ips and cand > 1.25 * ips):
                print(
                    f"# resident-chain delta {dt * 1e3:.1f} ms implies "
                    f"{cand:.0f} img/s (device rate {ips:.0f}); noise won — "
                    "skipping the chain figure this run",
                    file=sys.stderr,
                )
            else:
                ips_resident_chain = cand
        except Exception as e:  # keep the bench robust
            print(f"# resident-chain bench skipped: {e}", file=sys.stderr)

    baseline = None
    base_path = os.path.join(os.path.dirname(__file__), "baseline_measured.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            bj = json.load(f)
        # per-model denominator when measured (BASELINE config #2 gets its
        # own TF2-CPU ff_redweb rate); the top-level key is the ff_effnet
        # headline
        baseline = bj.get(
            f"tf2_cpu_images_per_sec_{cfg.model_name}",
            bj.get("tf2_cpu_images_per_sec"),
        )
    if not baseline:
        baseline = 0.25  # conservative stored estimate, see BASELINE.md notes
    # The measured TF2-CPU denominators are K=5 configs; quoting a ratio
    # for a K=100/500 (or qenc) run against them would be apples-to-oranges
    # — label such runs with a same-K'd denominator only when we have one.
    baseline_comparable = cfg.ranking_size == 5 and not cfg.qenc

    # --- standing int8 serving metric gate (VERDICT r04 #3): the XLA
    # depthwise-int8 TPU miscompile the r04 gate caught was compilation-
    # context dependent (448^2 only) and could silently return with a
    # jaxlib/runtime bump — so the default serving graph's accuracy is
    # re-gated on the attached chip in every headline bench run, and the
    # deltas land in bench_detail.json. Skipped off the headline config
    # (large-K / other-model runs) and with BENCH_SKIP_QGATE=1.
    qgate = None
    if (
        not os.environ.get("BENCH_SKIP_QGATE")
        and jax.default_backend() not in ("cpu",)
        and cfg.model_name == "ff_effnet"
        and image_size == 448
        and cfg.ranking_size == 5
        and not cfg.qenc
    ):
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tools"))
            from quant_metric_gate import run_gate

            qgate = run_gate(
                model="ff_effnet", size=448,
                n=int(os.environ.get("BENCH_QGATE_N", 48)), batch=8,
                dataset="scenes", weights="train",
                # scenes need real training before the weights express the
                # int8 failure mode the gate exists for (5 epochs leaves
                # near-chance metrics); the extra epochs reuse the one
                # compiled chain, ~seconds of device time each
                train_epochs=int(os.environ.get("BENCH_QGATE_EPOCHS", 20)),
            )
            if not qgate.get("pass", False):
                print(
                    "# QGATE FAIL: the int8 serving default violates its "
                    "metric budgets on this chip/runtime — serving falls "
                    "back to bn_fold until re-gated (see bench_detail.json "
                    "qgate block)",
                    file=sys.stderr,
                )
        except Exception as e:  # keep the bench robust
            print(f"# qgate skipped: {e}", file=sys.stderr)
            qgate = {"error": str(e)}

    hist_key = (
        f"train/{cfg.model_name}/{image_size}/{batch}/K{cfg.ranking_size}"
        f"/freeze{int(cfg.freeze_encoder)}"
        + (f"/qenc_{cfg.qenc}" if cfg.qenc else "")
    )
    norm, delta_pct, best_prior, raw_delta_pct = _history_compare(
        hist_key, ips, calib_tflops,
        os.path.join(os.path.dirname(__file__), "bench_history.jsonl"),
    )

    detail = {
        "config": {
            "model": cfg.model_name,
            "image_size": image_size,
            "batch": batch,
            "ranking_size": cfg.ranking_size,
            "rankings_per_image": cfg.rankings_per_image,
            "sampler": "info_score",
            "freeze_encoder": cfg.freeze_encoder,
            "sparse_tail": cfg.sparse_tail,
        },
        "images_per_sec_device": ips,
        "img_s_per_calib_tflops": norm,
        "normalized_delta_vs_best_pct": delta_pct,
        "raw_delta_vs_best_pct": raw_delta_pct,
        "normalized_best_prior": best_prior,
        "step_time_ms": step_time * 1000.0,
        "matmul_calibration_tflops": calib_tflops,
        "calibration_retries": calib_retries,
        "xla_flops_per_step": flops,
        "achieved_tflops_per_sec": (flops / step_time / 1e12) if flops else None,
        "images_per_sec_with_host_pipeline": ips_host,
        "images_per_sec_with_native_pipeline": ips_native,
        "images_per_sec_resident_data": ips_resident,
        "images_per_sec_resident_chain": ips_resident_chain,
        "images_per_sec_qenc_bf16": ips_qenc,
        "loss_sample": float(jax.device_get(m.loss)),
        "baseline_tf2_cpu_images_per_sec": baseline,
        "baseline_comparable": baseline_comparable,
        "devices": [str(d) for d in jax.devices()],
        "qgate": qgate,
    }
    detail_path = os.environ.get(
        "BENCH_DETAIL", os.path.join(os.path.dirname(__file__), "bench_detail.json")
    )
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=2)

    print(
        json.dumps(
            {
                "metric": f"train images/sec/chip ({cfg.model_name}@{image_size}^2, K={cfg.ranking_size}, info-score)",
                "value": round(ips, 2),
                "unit": "images/sec/chip",
                # null (not a bogus ratio) when the run's config doesn't
                # match the measured K=5 TF2-CPU denominator
                "vs_baseline": (
                    round(ips / baseline, 2) if baseline_comparable else None
                ),
                "img_s_per_calib_tflops": round(norm, 3) if norm else None,
                "normalized_delta_vs_best_pct": (
                    round(delta_pct, 1) if delta_pct is not None else None
                ),
                "raw_delta_vs_best_pct": (
                    round(raw_delta_pct, 1) if raw_delta_pct is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
