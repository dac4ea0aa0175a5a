"""End-to-end `cli convert` test: Keras .h5 -> npz -> load_backbone -> forward.

Covers the offline pretrained-weight import path (reference encoders come from
keras.applications downloads, pl_hourglass.py:48 / redweb.py:410; this image
has no egress, so weights are random — numerics parity is checked separately
by tools/keras_parity_check.py).
"""

import jax
import numpy as np
import pytest
from click.testing import CliRunner

pytestmark = pytest.mark.slow

tf = pytest.importorskip("tensorflow")


def test_convert_roundtrip_effnet(tmp_path):
    h5 = str(tmp_path / "effnet.h5")
    npz = str(tmp_path / "enc.npz")

    km = tf.keras.applications.EfficientNetB0(include_top=False, weights=None)
    km.save(h5)

    from pldepth_tpu.cli import cli

    res = CliRunner().invoke(
        cli,
        ["convert", "--weights", h5, "--model_name", "ff_effnet", "--out", npz],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output

    data = np.load(npz)
    assert any(k.startswith("params/encoder/stage1_block0") for k in data.files)

    from pldepth_tpu.data.preprocess import normalize_images
    from pldepth_tpu.models.pldepth_net import get_pl_depth_net
    from pldepth_tpu.models.pretrained import load_backbone

    model = get_pl_depth_net("ff_effnet", compute_dtype="float32")
    variables = model.init_variables(jax.random.PRNGKey(0), (224, 224, 3))
    params, batch_stats = load_backbone(
        npz, variables["params"], variables["batch_stats"]
    )
    variables = {"params": params, "batch_stats": batch_stats}

    x = normalize_images(
        np.random.rand(1, 224, 224, 3).astype(np.float32), model.preprocess
    )
    y = jax.jit(lambda v, x: model.module.apply(v, x, False))(variables, x)
    assert y.shape == (1, 224, 224, 1)
    assert np.isfinite(np.asarray(y)).all()
