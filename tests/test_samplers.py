"""Property tests for on-device ranking samplers (SURVEY.md §4 strategy:
mask adherence, descending order, tau-filtering, chi2-score behavior)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pldepth_tpu.sampling import sample_rankings, sample_rankings_batch, depth_relation


H = W = 32
RPI, K = 16, 5


def make_image(rng, mask_frac=0.6):
    gt = rng.uniform(0.05, 1.0, size=(H, W)).astype(np.float32)
    mask = (rng.uniform(size=(H, W)) < mask_frac).astype(np.float32)
    mask[0, 0] = 1.0  # never fully empty
    return jnp.array(gt), jnp.array(mask)


@pytest.mark.parametrize("draw_method", ["rejection", "compact", "packed", "hier"])
@pytest.mark.parametrize(
    "name", ["purely_masked", "masked", "thresholded", "info_score"]
)
def test_shapes_and_mask_adherence(name, draw_method, rng):
    gt, mask = make_image(rng)
    out = sample_rankings(
        jax.random.key(0), gt, mask,
        sampler_name=name, rankings_per_image=RPI, ranking_size=K,
        draw_method=draw_method,
    )
    out = np.asarray(out)
    assert out.shape == (RPI, K, 2)
    idx = out[..., 0].astype(np.int64)
    assert idx.min() >= 0 and idx.max() < H * W
    mask_np = np.asarray(mask).reshape(-1)
    assert np.all(mask_np[idx.reshape(-1)] > 0), "sampled a masked-out pixel"
    # stored depth must equal gt at the stored flat index
    gt_np = np.asarray(gt).reshape(-1)
    np.testing.assert_allclose(out[..., 1], gt_np[idx], rtol=1e-6)


def test_compact_draw_is_uniform_over_valid(rng):
    """The compaction draw must cover valid pixels ~uniformly (chi2 sanity),
    exactly like the rejection draw semantics it substitutes for."""
    from pldepth_tpu.sampling.samplers import _masked_uniform_points

    hw = 512
    mask = (rng.uniform(size=hw) < 0.5).astype(np.float32)
    mask[0] = 1.0
    n_valid = int((mask > 0).sum())
    n = 200_000
    draws = np.asarray(
        _masked_uniform_points(
            jax.random.key(3), jnp.asarray(mask), n, "compact"
        )
    )
    assert np.all(mask[draws] > 0)
    counts = np.bincount(draws, minlength=hw)[mask > 0]
    expected = n / n_valid
    chi2 = float(((counts - expected) ** 2 / expected).sum())
    # dof = n_valid - 1 ~ 255; mean 255, sd ~22.6 -> 6 sigma ~ 391
    assert chi2 < 400, chi2


@pytest.mark.parametrize(
    "name", ["purely_masked", "masked", "thresholded", "info_score"]
)
def test_lists_sorted_descending(name, rng):
    gt, mask = make_image(rng)
    out = np.asarray(
        sample_rankings(
            jax.random.key(1), gt, mask,
            sampler_name=name, rankings_per_image=RPI, ranking_size=K,
        )
    )
    d = out[..., 1]
    assert np.all(np.diff(d, axis=-1) <= 1e-7), "lists must be depth-descending"


def test_thresholded_avoids_equal_pairs(rng):
    # With plenty of spread available, the thresholded sampler's -1000
    # penalty should push tau-equal adjacent pairs out of the kept lists.
    gt, mask = make_image(rng)
    out = np.asarray(
        sample_rankings(
            jax.random.key(2), gt, mask,
            sampler_name="thresholded", rankings_per_image=8, ranking_size=3,
            oversample_factor=8.0,
        )
    )
    rel = np.asarray(depth_relation(out[:, :-1, 1], out[:, 1:, 1], 0.03))
    frac_equal = (rel == 0).mean()
    assert frac_equal < 0.2, f"too many tau-equal adjacent pairs: {frac_equal}"


def test_info_score_beats_random_on_chi2(rng):
    """Info-score sampling must yield lower chi2 distance to the ideal
    uniform spread than purely-random sampling (the property measured by the
    reference's chi2compare.py diagnostic)."""
    gt, mask = make_image(rng, mask_frac=1.0)

    def mean_chi2(name, key):
        out = np.asarray(
            sample_rankings(
                jax.random.key(key), gt, mask,
                sampler_name=name, rankings_per_image=32, ranking_size=K,
            )
        )
        d = out[..., 1]
        lo, hi = float(np.asarray(gt).min()) + 0.001, float(np.asarray(gt).max())
        expected = lo + (hi - lo) * np.arange(1, K + 1) / K
        return np.mean(np.sum((d - expected) ** 2 / expected, axis=-1))

    info = np.mean([mean_chi2("info_score", s) for s in range(3)])
    rand = np.mean([mean_chi2("purely_masked", s) for s in range(3)])
    assert info < rand, (info, rand)


def test_uniformity_over_mask(rng):
    # Empirical distribution over valid pixels should be near-uniform.
    gt = jnp.array(rng.uniform(0.1, 1.0, size=(8, 8)).astype(np.float32))
    mask = np.zeros((8, 8), np.float32)
    mask[:4, :] = 1.0
    out = np.asarray(
        sample_rankings(
            jax.random.key(3), gt, jnp.array(mask),
            sampler_name="purely_masked", rankings_per_image=512, ranking_size=4,
        )
    )
    idx = out[..., 0].astype(int).reshape(-1)
    counts = np.bincount(idx, minlength=64)
    assert counts[32:].sum() == 0
    valid_counts = counts[:32]
    # chi-square-ish sanity: no pixel should be wildly over/under-sampled
    expect = idx.size / 32
    assert valid_counts.min() > 0.3 * expect
    assert valid_counts.max() < 3.0 * expect


def test_mask_resolution_rescaling(rng):
    # mask at half resolution of gt: coordinates scale by truncation
    gt = jnp.array(rng.uniform(0.1, 1.0, size=(16, 16)).astype(np.float32))
    mask = np.zeros((8, 8), np.float32)
    mask[:, :4] = 1.0  # left half valid
    out = np.asarray(
        sample_rankings(
            jax.random.key(4), gt, jnp.array(mask),
            sampler_name="purely_masked", rankings_per_image=64, ranking_size=3,
        )
    )
    ys = out[..., 0].astype(int) % 16
    assert ys.max() < 8, "scaled coordinates escaped the valid half"


def test_batched_sampling_distinct_per_image(rng):
    gts = jnp.array(rng.uniform(0.1, 1.0, size=(3, H, W)).astype(np.float32))
    masks = jnp.ones((3, H, W), jnp.float32)
    out = np.asarray(
        sample_rankings_batch(
            jax.random.key(5), gts, masks,
            sampler_name="info_score", rankings_per_image=RPI, ranking_size=K,
        )
    )
    assert out.shape == (3, RPI, K, 2)
    assert not np.allclose(out[0], out[1]), "per-image keys must differ"


def test_segment_sampler_heterogeneous(rng):
    from pldepth_tpu.sampling.samplers import _SEG_DEPTH_BINS, _SEG_GRID, _segment_ids
    import jax.numpy as jnp

    gt, mask = make_image(rng, mask_frac=1.0)
    out = np.asarray(
        sample_rankings(
            jax.random.key(9), gt, mask,
            sampler_name="segment", rankings_per_image=RPI, ranking_size=K,
        )
    )
    assert out.shape == (RPI, K, 2)
    idx = out[..., 0].astype(int)
    gt_np = np.asarray(gt).reshape(-1)
    np.testing.assert_allclose(out[..., 1], gt_np[idx], rtol=1e-6)
    # each list's points land in distinct segments
    seg_flat, n_seg = _segment_ids(gt, jnp.asarray(mask), _SEG_GRID, _SEG_DEPTH_BINS)
    seg_flat = np.asarray(seg_flat)
    for lst in idx:
        segs = seg_flat[lst]
        assert len(set(segs.tolist())) == K, segs


def test_segment_sampler_respects_mask(rng):
    gt, _ = make_image(rng)
    mask = np.zeros((H, W), np.float32)
    mask[: H // 2] = 1.0
    out = np.asarray(
        sample_rankings(
            jax.random.key(10), gt, jnp.array(mask),
            sampler_name="segment", rankings_per_image=8, ranking_size=3,
        )
    )
    rows = out[..., 0].astype(int) // W
    assert rows.max() < H // 2


def test_empty_mask_fallback(rng):
    gt, _ = make_image(rng)
    mask = jnp.zeros((H, W), jnp.float32)
    out = np.asarray(
        sample_rankings(
            jax.random.key(6), gt, mask,
            sampler_name="masked", rankings_per_image=4, ranking_size=3,
        )
    )
    assert np.isfinite(out).all()


def test_packed_draw_identical_to_compact(rng):
    """packed (single-array sort) and compact (argsort) are the same math:
    both list valid pixel indices in ascending order, so draws agree
    bit-for-bit given the same key."""
    from pldepth_tpu.sampling.samplers import _masked_uniform_points

    hw = 1024
    mask = (rng.uniform(size=hw) < 0.4).astype(np.float32)
    mask[0] = 1.0
    a = np.asarray(_masked_uniform_points(
        jax.random.key(7), jnp.asarray(mask), 5000, "compact"))
    b = np.asarray(_masked_uniform_points(
        jax.random.key(7), jnp.asarray(mask), 5000, "packed"))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("hw,frac", [(448 * 448, 0.7), (448 * 448, 0.03),
                                     (1000, 0.5), (100, 1.0)])
def test_hier_draw_identical_to_packed(rng, hw, frac):
    """hier (chunked rank lookup, sort-free) computes 'the g-th valid pixel'
    exactly like the compaction methods, so draws agree bit-for-bit —
    including non-multiple-of-chunk sizes and near-empty masks."""
    from pldepth_tpu.sampling.samplers import _masked_uniform_points

    mask = (rng.uniform(size=hw) < frac).astype(np.float32)
    mask[0] = 1.0
    a = np.asarray(_masked_uniform_points(
        jax.random.key(3), jnp.asarray(mask), 2500, "packed"))
    b = np.asarray(_masked_uniform_points(
        jax.random.key(3), jnp.asarray(mask), 2500, "hier"))
    np.testing.assert_array_equal(a, b)


def test_resolution_guard_float32_flat_index(rng):
    """H*W beyond 2^24 would silently corrupt float32-carried flat indices;
    the sampler must refuse instead (samplers.py sample_rankings)."""
    gt = jnp.ones((4200, 4200), jnp.float32)
    mask = jnp.ones((4200, 4200), jnp.float32)
    with pytest.raises(ValueError, match="float32-exact"):
        sample_rankings(
            jax.random.key(0), gt, mask,
            sampler_name="info_score", rankings_per_image=4, ranking_size=3,
        )
    # 4096^2 == 2^24 exactly: the largest index (2^24 - 1) is still exact
    gt_ok = jnp.ones((4096, 16), jnp.float32)
    out = sample_rankings(
        jax.random.key(0), gt_ok, jnp.ones_like(gt_ok),
        sampler_name="purely_masked", rankings_per_image=2, ranking_size=3,
    )
    assert out.shape == (2, 3, 2)


def test_segment_sampler_honors_draw_method(rng):
    """The segment sampler's empty-segment fallback must follow the
    configured draw method (ablations would otherwise silently measure
    the default)."""
    gt, mask = make_image(rng)
    for method in ("rejection", "compact", "hier"):
        out = np.asarray(sample_rankings(
            jax.random.key(0), gt, mask,
            sampler_name="segment", rankings_per_image=RPI, ranking_size=K,
            draw_method=method,
        ))
        assert out.shape == (RPI, K, 2)
        idx = out[..., 0].astype(np.int64)
        assert np.all(np.asarray(mask).reshape(-1)[idx.reshape(-1)] > 0)


def test_default_oversample_factor_is_per_sampler_spec():
    """cfg.oversample_factor=None defers to each sampler's reference
    default (masked/thresholded 1.5, info 5 — reference sampling.py
    class defaults; the provider never overrides them)."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.sampling.samplers import SAMPLERS

    assert ExperimentConfig().oversample_factor is None
    assert SAMPLERS["masked"].oversample_factor == 1.5
    assert SAMPLERS["thresholded"].oversample_factor == 1.5
    assert SAMPLERS["info_score"].oversample_factor == 5.0


def test_segment_sampler_rejects_oversized_k():
    """ranking_size beyond the 64 segments must fail with a clear message,
    not an opaque XLA top_k error."""
    import jax
    import jax.numpy as jnp

    from pldepth_tpu.sampling.samplers import sample_rankings

    gt = jnp.linspace(0, 1, 32 * 32).reshape(32, 32)
    mask = jnp.ones((32, 32))
    with pytest.raises(ValueError, match="segment"):
        sample_rankings(
            jax.random.PRNGKey(0), gt, mask,
            sampler_name="segment", rankings_per_image=4, ranking_size=65,
        )
