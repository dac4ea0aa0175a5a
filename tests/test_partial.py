"""Combination matrices for tied partial rankings (data/partial.py) vs a
literal reimplementation of the reference numpy algorithm."""

import itertools

import numpy as np

from pldepth_tpu.data.partial import (
    batch_combination_matrix,
    combination_matrix,
)


def reference_impl(segments_col1):
    """Verbatim port of construct_combination_matrix_np
    (hourglass_provider.py:104-123) for test comparison only."""
    segments = np.stack([np.zeros_like(segments_col1), segments_col1], axis=1)
    n_unique = np.unique(segments[:, 1])
    result_cs = []
    for k in range(len(n_unique)):
        segments_mask = segments[:, 1] >= n_unique[k]
        rem = int(np.sum(segments_mask))
        combs = [i for i in itertools.product([0, 1], repeat=rem)]
        for c in combs:
            if sum(c) == 0:
                combs.remove(c)
        tmp_c = np.zeros([len(combs), segments.shape[0]])
        for row_idx, c in enumerate(combs):
            tmp_c[row_idx][segments_mask] = c
        result_cs.append(tmp_c.tolist())
    return result_cs


def test_matches_reference_algorithm():
    for ids in ([0, 0, 1, 2], [0, 1, 1, 2, 2], [3, 1, 2, 1], [0], [1, 1, 1]):
        got = combination_matrix(ids)
        want = reference_impl(np.asarray(ids))
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, np.asarray(w, np.int32))


def test_row_counts_and_support():
    ids = [0, 0, 1, 1, 2]
    mats = combination_matrix(ids)
    # tails: >=0 (5 elems), >=1 (3), >=2 (1) -> 31, 7, 1 non-empty subsets
    assert [m.shape for m in mats] == [(31, 5), (7, 5), (1, 5)]
    # no all-zero rows; rows only touch the tail support
    for m, tail in zip(mats, ([0, 1, 2, 3, 4], [2, 3, 4], [4])):
        assert (m.sum(axis=1) > 0).all()
        off = np.setdiff1d(np.arange(5), tail)
        assert (m[:, off] == 0).all()


def test_batch_wrapper():
    batch = np.zeros((2, 3, 2), np.int64)
    batch[0, :, 1] = [0, 1, 1]
    batch[1, :, 1] = [0, 0, 0]
    out = batch_combination_matrix(batch)
    assert len(out) == 2
    assert [m.shape[0] for m in out[0]] == [7, 3]
    assert [m.shape[0] for m in out[1]] == [7]
