"""Resize semantics vs TF goldens (tests/golden/tf_resize.npz, generated
once with tf.image.resize / keras UpSampling2D — the ops the reference uses
at hr_wsi.py:65-78 and pl_hourglass.py:62). Matching these within fp32 noise
is a precondition for the 0.5% WHDR parity budget (SURVEY.md §7)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from pldepth_tpu.ops.resize import resize_bilinear, resize_nearest, upsample2x_bilinear
from pldepth_tpu.data import io as dio

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tf_resize.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_bilinear_upsample_matches_tf(golden):
    got = np.asarray(resize_bilinear(jnp.array(golden["src"][0]), (64, 96)))
    np.testing.assert_allclose(got, golden["bilinear_up_64x96"][0], atol=2e-6)


def test_bilinear_downsample_matches_tf(golden):
    got = np.asarray(resize_bilinear(jnp.array(golden["src"][0]), (16, 24)))
    np.testing.assert_allclose(got, golden["bilinear_down_16x24"][0], atol=2e-6)


def test_nearest_matches_tf(golden):
    got = np.asarray(resize_nearest(jnp.array(golden["src"][0]), (20, 30)))
    np.testing.assert_allclose(got, golden["nearest_20x30"][0], atol=0)


def test_upsample2x_matches_keras(golden):
    got = np.asarray(upsample2x_bilinear(jnp.array(golden["src"])))
    np.testing.assert_allclose(got, golden["upsample2x"], atol=2e-6)


def test_host_cv2_resize_matches_tf(golden):
    # the host decode path (data/io.py) must share the device semantics
    got = dio.resize_bilinear(golden["src"][0], (16, 24))
    np.testing.assert_allclose(got, golden["bilinear_down_16x24"][0], atol=2e-6)
