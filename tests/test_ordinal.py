"""Ordinal pair/ranking eval providers (reference generic_ranking_provider)."""

import numpy as np

from pldepth_tpu.data import SyntheticDepthDataset
from pldepth_tpu.data.ordinal import (
    cached,
    generate_eval_rankings,
    generate_ordinal_pairs,
    pair_agreement_error,
)


def test_pairs_shape_relations_and_determinism():
    ds = SyntheticDepthDataset(n=3, image_size=16, seed=0)
    p1 = generate_ordinal_pairs(ds, 32, seed=5)
    p2 = generate_ordinal_pairs(ds, 32, seed=5)
    np.testing.assert_array_equal(p1, p2)
    assert p1.shape == (3, 32, 5)
    assert set(np.unique(p1[..., 2])) <= {-1.0, 0.0, 1.0}
    # stored depths match stored indices
    gt0 = ds[0]["gt"].reshape(-1)
    np.testing.assert_allclose(p1[0, :, 3], gt0[p1[0, :, 0].astype(int)], rtol=1e-6)


def test_pairs_invert_relation_sign():
    ds = SyntheticDepthDataset(n=2, image_size=16, seed=1)
    a = generate_ordinal_pairs(ds, 16, seed=2, invert_relation_sign=False)
    b = generate_ordinal_pairs(ds, 16, seed=2, invert_relation_sign=True)
    np.testing.assert_array_equal(a[..., 2], -b[..., 2])


def test_eval_rankings_sorted_and_inverted_labels():
    ds = SyntheticDepthDataset(n=2, image_size=16, seed=2)
    r = generate_eval_rankings(ds, 8, 4, seed=3, invert_relation_sign=True)
    assert r.shape == (2, 8, 4, 2)
    labels = r[..., 1]
    assert np.all(np.diff(labels, axis=-1) <= 1e-7)
    # inverted labels are 1/(z+1)
    gt0 = ds[0]["gt"].reshape(-1)
    z = gt0[r[0, :, :, 0].astype(int)]
    np.testing.assert_allclose(labels[0], 1.0 / (z + 1.0), rtol=1e-6)


def test_cache_roundtrip(tmp_path):
    ds = SyntheticDepthDataset(n=2, image_size=16, seed=4)
    a = cached(generate_ordinal_pairs, str(tmp_path), "k1", ds, 8, 7)
    b = cached(generate_ordinal_pairs, str(tmp_path), "k1", ds, 8, 999)  # hits cache
    np.testing.assert_array_equal(a, b)


def test_pair_agreement_error_perfect_prediction():
    ds = SyntheticDepthDataset(n=1, image_size=16, seed=5)
    pairs = generate_ordinal_pairs(ds, 64, seed=6)
    gt = ds[0]["gt"].reshape(-1)
    assert pair_agreement_error(gt, pairs[0]) == 0.0
