"""Metric-level regression gate for int8 serving (round-4 lesson).

Round 3 gated int8 on correlation measured on a RANDOM-INIT model
(pearson 0.997) — which hid a total trained-model collapse (pearson 0.002
at 448^2 on TPU, caused by an XLA depthwise int8 fusion miscompile; see
models/quantize.py QuantConv and tools/probe_qconv_sizes.py). The repo's
bar is metric-level evidence on a TRAINED model: this test trains ff_smoke
briefly and gates the int8-vs-float *metric deltas* (the quantity users
care about), not just correlation. The TPU-emitter dimension is covered on
hardware by tools/quant_metric_gate.py (docs/BENCH.md table); this CPU
test catches software regressions in the quant path itself.
"""

import jax
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.eval.metrics import ndcg_at_k, ordinal_error, whdr
from pldepth_tpu.train import Trainer

pytestmark = pytest.mark.slow

S = 64

# Looser than the on-chip 448^2 budgets (tools/quant_metric_gate.py): a
# briefly-trained tiny model on 64^2 images has noisier per-image metrics.
BUDGET = {"ordinal_error": 0.01, "whdr_003": 0.01, "ndcg_200": 0.02}


def test_int8_metric_deltas_on_trained_model():
    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=S, batch_size=4, ranking_size=3,
        rankings_per_image=8, sampling_type=1, compute_dtype="bfloat16",
        initial_lr=1e-2,
    )
    t = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    state = t.init_state()
    ds = SyntheticDepthDataset(n=16, image_size=S, seed=0)
    it = BatchIterator(ds, 4, seed=0)
    for _ in range(30):
        state, m = t.train_step(state, t.shard_batch(next(it)))
    it.close()
    assert bool(m.finite)

    val = SyntheticDepthDataset(n=8, image_size=S, seed=123)
    imgs = np.stack([val[i]["image"] for i in range(8)])
    gts = np.stack([val[i]["gt"] for i in range(8)])
    calib = SyntheticDepthDataset(n=4, image_size=S, seed=7)
    qvars = t.prepare_quant(
        state, np.stack([calib[i]["image"] for i in range(4)])
    )

    p_f = np.asarray(jax.device_get(
        t.jit_predict(fused="bn_fold")(state, imgs)), np.float32)
    p_q = np.asarray(jax.device_get(
        t.jit_predict(fused="quant")(qvars, imgs)), np.float32)
    assert np.isfinite(p_q).all(), "int8 graph produced non-finite outputs"

    deltas = {}
    for name, fn in (
        ("ordinal_error", lambda p, g: ordinal_error(p, g)),
        ("whdr_003", lambda p, g: whdr(p, g, tau=0.03)),
        ("ndcg_200", lambda p, g: ndcg_at_k(p, g, 200)),
    ):
        mf = np.mean([fn(p_f[i], gts[i]) for i in range(8)])
        mq = np.mean([fn(p_q[i], gts[i]) for i in range(8)])
        deltas[name] = abs(float(mq - mf))
    for name, d in deltas.items():
        assert d <= BUDGET[name], (name, d, deltas)
