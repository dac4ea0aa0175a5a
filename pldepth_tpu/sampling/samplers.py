"""On-device depth-to-ranking samplers.

TPU-native rebuild of the reference sampling hierarchy
(pldepth/data/sampling.py:7-243), which ran as per-image Python/numpy loops
inside ``tf.numpy_function`` on the host (pldepth/data/providers/
hourglass_provider.py:55-58) — the throughput bottleneck of the whole
reference pipeline (SURVEY.md §3.1). Here sampling is fixed-shape jax code
that lives *inside* the jitted train step: masked categorical draws via
inverse-CDF ``searchsorted`` over the valid-mask cumsum, list sort by depth,
strategy-specific scoring, and an oversample-then-top-k selection.

Strategy semantics preserved (with file:line provenance):

* ``purely_masked`` — uniform draws over mask>0, each list sorted by
  ground-truth depth descending; no scoring (sampling.py:106-150).
* ``masked`` — adds scoring by total adjacent depth spread of the sorted
  list and keeps the top-RPI of the oversampled pool (sampling.py:153-169).
  (On a descending-sorted list the adjacent |diff| sum telescopes to
  max-min; we keep the explicit formula for clarity.)
* ``thresholded`` — like ``masked`` plus a -1000 penalty per adjacent pair
  whose tau-ratio relation is "equal" (sampling.py:172-208).
* ``info_score`` — score = -chi^2 distance between the list's sorted depths
  and an ideal uniform spread linspace(min+1e-3, max, K+1)[1:], plus the
  same equality penalty; oversample factor 5 (sampling.py:211-239).

Deviations (deliberate, documented):

* Fixed shapes: the reference's ``purely_masked`` used bs_factor=0.8 and so
  returned int(0.8*RPI) < RPI lists (sampling.py:131,147-150) — an artifact,
  not a feature. We always return exactly RPI lists.
* The ideal spread for ``info_score`` is compared against the *sorted
  descending* list exactly as the reference does (expected_list ascends while
  gts_buffer descends — sampling.py:223-233; faithfully kept, since training
  behavior depends on it).
* Ties in the top-k selection may order differently than numpy argsort; the
  selected set is identical for distinct scores.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict

import jax
import jax.numpy as jnp

from pldepth_tpu.sampling.relations import depth_relation

_EQUALITY_PENALTY = -1000.0

# draw_method="auto" switches hier -> packed above this many points/image
# (hier gathers ~1 KB/point; packed sorts O(HW) once + 4 B/point). See
# resolve_draw_method for the derivation and docs/BENCH.md for the
# on-chip measurements behind the value.
_HIER_AUTO_MAX_POINTS = 32768


def resolve_draw_method(method: str, n_points: int) -> str:
    """Resolve draw_method="auto" by per-image point count.

    hier's (points, 512) int16 within-chunk gather is ~1 KB/point *per
    image inside a vmapped step*: at the sweep-extreme K=500, RPI=100,
    oversample x5 (reference hyperopt/hyperparams.py:44) that is 250k
    points -> 256 MB/image -> an HBM cliff at any real batch size. packed's
    cost is one O(HW) sort per image + 4 B/point, so it wins (and fits)
    once the point count is large; hier wins while the gather is small
    (full-step-measured at K<=25, docs/BENCH.md). Draws are bit-identical
    between the two for the same key, so the switch never changes sampling
    semantics — only memory/speed.
    """
    if method != "auto":
        return method
    return "hier" if n_points <= _HIER_AUTO_MAX_POINTS else "packed"


@dataclasses.dataclass(frozen=True)
class SamplerSpec:
    name: str
    oversample_factor: float  # candidate pool multiplier (reference bs_factor)
    scored: bool  # False => take first RPI candidates unscored


SAMPLERS: Dict[str, SamplerSpec] = {
    "purely_masked": SamplerSpec("purely_masked", 1.0, scored=False),
    "masked": SamplerSpec("masked", 1.5, scored=True),
    "thresholded": SamplerSpec("thresholded", 1.5, scored=True),
    "info_score": SamplerSpec("info_score", 5.0, scored=True),
    # Segment-heterogeneous sampling. The reference *declared* this
    # capability (run_scripts/instance_sample.py imports
    # pldepth.data.seg_data.HeterogenousSegmentBasedSampling) but the
    # implementation was gitignored and absent (SURVEY.md §1). This is a
    # working TPU-native realization: pixels are partitioned into segments
    # (spatial grid x depth bins, a cheap on-device proxy for instance
    # segments) and each list draws its points from distinct segments, so
    # rankings span heterogeneous regions; lists are then scored like
    # ``thresholded``.
    "segment": SamplerSpec("segment", 1.5, scored=True),
}

# segment sampler geometry: GRID x GRID spatial cells x DEPTH_BINS depth bins
_SEG_GRID = 4
_SEG_DEPTH_BINS = 4


def get_sampler(name: str) -> SamplerSpec:
    if name not in SAMPLERS:
        raise ValueError(f"unknown sampler {name!r}; have {sorted(SAMPLERS)}")
    return SAMPLERS[name]


def _masked_uniform_points(key, mask_flat, n_points, method: str = "auto"):
    """Draw ``n_points`` flat indices uniformly from mask>0.

    Equivalent to the reference's uniform choice over ``np.where(mask > 0)``
    coordinates (sampling.py:113). Fixed-shape device strategies (all three
    non-rejection methods produce bit-identical draws for the same key):

    * ``hier`` (default) — hierarchical rank lookup: chunked valid-count
      cumsums locate "the g-th valid pixel" with two compare-sums and one
      (points, 512) int16 gather, no O(HW) sort at all. Replaced ``packed``
      as default after full-step measurement (the per-image 200k-element
      sort was the largest single op of the fused train step at 6.9 ms).
    * ``packed`` — single-array compaction: fold the invalid flag
      into the index itself (invalid pixels get ``idx + HW``) and sort ONE
      s32 array; the first ``n_valid`` entries are exactly the valid pixel
      indices in order. Bit-identical draws to ``compact`` with no separate
      key array; measured FULL-STEP equal (262.7 vs 262.2 img/s at K=25 —
      the 6.5 ms tuple-sort is payload-bound, so dropping the pred key
      doesn't shrink it).
    * ``compact`` — argsort compaction: one stable O(HW) sort of
      the invalid flags lists the valid pixel indices first, then each point
      is a single integer gather. TPU random gathers cost ~10 ns/element
      (profiled), so the flat per-image sort beats per-point gather bills at
      every measured config: full-step 105.7 vs 113.3 ms at K=5 and 122.5
      vs 187.8 ms at K=25 (docs/BENCH.md).
    * ``rejection`` — R=16 candidate draws per point, keep the first valid
      (16 boolean gathers/point, zero per-image setup; miss prob (1-f)^16
      < 0.4% even at valid fraction 0.3, stragglers take the first valid
      pixel). Kept selectable for ablation.

    Empty masks fall back to uniform over all pixels. Methods were chosen
    by FULL-STEP measurement, not standalone op timing (docs/BENCH.md
    "methodology warnings"); a rank-scatter compaction variant lowered to
    sort + a 31 ms serial scatter fusion in-step and was dropped.
    """
    hw = mask_flat.shape[0]
    valid = mask_flat > 0
    valid = jnp.where(jnp.any(valid), valid, jnp.ones_like(valid))
    method = resolve_draw_method(method, n_points)

    if method == "hier":
        # Hierarchical rank lookup: the draw is "the g-th valid pixel in
        # flat order" (exactly what compaction computes), found WITHOUT the
        # O(HW) sort. Chunk the flat mask into C chunks of L: an inclusive
        # cumsum of per-chunk valid counts locates each draw's chunk (one
        # C-wide compare-sum per draw), an inclusive within-chunk prefix
        # locates the column (one L-wide compare-sum on a gathered int16
        # row). Replaces the 6.9 ms/step per-image sort of 200k elements
        # with ~0.1 MB of cumsums + a (points, L) gather; draws are
        # bit-identical to ``packed``/``compact`` for the same key.
        L = 512
        C = (hw + L - 1) // L
        v = jnp.zeros((C * L,), jnp.int32).at[:hw].set(valid.astype(jnp.int32))
        v = v.reshape(C, L)
        within = jnp.cumsum(v, axis=1)  # (C, L) inclusive, <= L
        chunk_cum = jnp.cumsum(within[:, -1])  # (C,) inclusive
        n_valid = chunk_cum[-1]
        u = jax.random.uniform(key, (n_points,))
        g = jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
        r = g + 1  # 1-based target rank among valid pixels
        c = jnp.sum(chunk_cum[None, :] < r[:, None], axis=1)  # (n,)
        prior = jnp.where(c > 0, chunk_cum[jnp.maximum(c - 1, 0)], 0)
        r_in = (r - prior).astype(jnp.int16)  # in [1, count_c] <= L
        rows = within.astype(jnp.int16)[c]  # (n, L) gather
        col = jnp.sum(rows < r_in[:, None], axis=1)
        return (c * L + col).astype(jnp.int32)

    if method in ("packed", "compact"):
        n_valid = jnp.sum(valid.astype(jnp.int32))
        if method == "packed":
            iota = jnp.arange(hw, dtype=jnp.int32)
            compact = jnp.sort(jnp.where(valid, iota, iota + hw))
        else:
            compact = jnp.argsort(~valid, stable=True).astype(jnp.int32)
        u = jax.random.uniform(key, (n_points,))
        draw = jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
        return compact[draw]

    rounds = 16
    cands = jax.random.randint(key, (rounds, n_points), 0, hw)
    ok = valid[cands]  # (R, n)
    first = jnp.argmax(ok, axis=0)
    chosen = jnp.take_along_axis(cands, first[None, :], axis=0)[0]
    fallback = jnp.argmax(valid)
    return jnp.where(jnp.any(ok, axis=0), chosen, fallback)


def _adjacent_equal_penalties(sorted_depths, threshold):
    rel = depth_relation(sorted_depths[:, :-1], sorted_depths[:, 1:], threshold)
    return _EQUALITY_PENALTY * jnp.sum((rel == 0).astype(jnp.float32), axis=-1)


def _segment_ids(gt, mask, grid: int, depth_bins: int):
    """Per-pixel segment id: spatial grid cell x depth bin; masked-out
    pixels get the sentinel id S (= number of segments)."""
    hg, wg = gt.shape
    gy = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 1)
    cell = (gy * grid // hg) * grid + (gx * grid // wg)
    lo, hi = jnp.min(gt), jnp.max(gt)
    dbin = jnp.clip(
        ((gt - lo) / jnp.maximum(hi - lo, 1e-6) * depth_bins).astype(jnp.int32),
        0, depth_bins - 1,
    )
    seg = cell * depth_bins + dbin
    n_seg = grid * grid * depth_bins
    return jnp.where(mask > 0, seg, n_seg).reshape(-1), n_seg


def _segment_draw(key, gt, mask, n_cand: int, k: int, draw_method: str = "auto"):
    """(n_cand, k) flat gt-space indices, each list spanning distinct
    segments (the heterogeneous-segment strategy)."""
    n_segments = _SEG_GRID * _SEG_GRID * _SEG_DEPTH_BINS
    if k > n_segments:
        raise ValueError(
            f"segment sampler draws at most one pixel per segment: "
            f"ranking_size {k} > {n_segments} segments "
            f"({_SEG_GRID}x{_SEG_GRID} tiles x {_SEG_DEPTH_BINS} depth bins); "
            f"use a smaller ranking_size or another sampling_type"
        )
    seg_flat, n_seg = _segment_ids(gt, mask, _SEG_GRID, _SEG_DEPTH_BINS)
    hw = seg_flat.shape[0]
    # pixels ordered by segment; per-segment [start, count) windows
    perm = jnp.argsort(seg_flat)
    counts = jnp.zeros(n_seg + 1, jnp.int32).at[seg_flat].add(1)[:n_seg]
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1]])

    k_seg, k_pix, k_fb = jax.random.split(key, 3)
    # choose k distinct non-empty segments per list (random top-k)
    seg_scores = jax.random.uniform(k_seg, (n_cand, n_seg))
    seg_scores = jnp.where(counts[None, :] > 0, seg_scores, -1.0)
    _, chosen = jax.lax.top_k(seg_scores, k)  # (n_cand, k)

    u = jax.random.uniform(k_pix, (n_cand, k))
    cnt = counts[chosen]
    offs = starts[chosen] + (u * cnt).astype(jnp.int32)
    idx = perm[jnp.clip(offs, 0, hw - 1)]
    # empty-segment fallback (fewer non-empty segments than k): global draw
    fallback = _masked_uniform_points(k_fb, mask.reshape(-1), n_cand * k, draw_method)
    return jnp.where(cnt > 0, idx, fallback.reshape(n_cand, k))


def _score_lists(name, sorted_depths, gt_min, gt_max, threshold):
    """Per-candidate-list selection score (higher = kept). (C, K) -> (C,)."""
    diffs = jnp.abs(sorted_depths[:, :-1] - sorted_depths[:, 1:])
    if name == "masked":
        return jnp.sum(diffs, axis=-1)
    if name in ("thresholded", "segment"):
        return jnp.sum(diffs, axis=-1) + _adjacent_equal_penalties(
            sorted_depths, threshold
        )
    if name == "info_score":
        k = sorted_depths.shape[-1]
        # linspace(min+0.001, max, K+1)[1:], reference sampling.py:223
        lo = gt_min + 0.001
        expected = lo + (gt_max - lo) * jnp.arange(1, k + 1, dtype=jnp.float32) / k
        chi2 = jnp.sum(
            jnp.square(sorted_depths - expected[None, :]) / expected[None, :], axis=-1
        )
        return -chi2 + _adjacent_equal_penalties(sorted_depths, threshold)
    raise ValueError(f"no scoring rule for sampler {name!r}")


@functools.partial(
    jax.jit, static_argnames=("sampler_name", "rankings_per_image", "ranking_size",
                              "oversample_factor", "draw_method")
)
def sample_rankings(
    key: jax.Array,
    gt: jax.Array,
    mask: jax.Array,
    *,
    sampler_name: str,
    rankings_per_image: int,
    ranking_size: int,
    threshold: float = 0.03,
    oversample_factor: float | None = None,
    draw_method: str = "auto",
) -> jax.Array:
    """Sample (RPI, K, 2) rankings [flat_pixel_idx, gt_depth] for one image.

    ``gt`` and ``mask`` are (H, W); the mask may be a different resolution
    than gt, in which case coordinates are rescaled by truncation exactly as
    the reference does (sampling.py:115-116, int() cast).
    """
    spec = get_sampler(sampler_name)
    factor = oversample_factor if oversample_factor is not None else spec.oversample_factor
    rpi, k = rankings_per_image, ranking_size
    n_cand = max(int(rpi * factor), rpi)

    hm, wm = mask.shape
    hg, wg = gt.shape
    if hg * wg > 1 << 24:
        # Flat pixel indices ride in the float32 rankings array (the
        # reference's (RPI, K, 2) layout); float32 is integer-exact only up
        # to 2^24, beyond which gathers hit the wrong pixels silently.
        raise ValueError(
            f"gt resolution {hg}x{wg} = {hg * wg} pixels exceeds the "
            f"float32-exact flat-index range (2^24 = {1 << 24}); use "
            f"input_size < 4096"
        )

    if sampler_name == "segment":
        if (hm, wm) != (hg, wg):
            ri = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 0) * hm // hg
            ci = jax.lax.broadcasted_iota(jnp.int32, (hg, wg), 1) * wm // wg
            mask_g = mask[ri, ci]
        else:
            mask_g = mask
        gidx = _segment_draw(key, gt, mask_g, n_cand, k, draw_method)
        depths = gt.reshape(-1)[gidx.reshape(-1)]
        flat = gidx.reshape(-1).astype(jnp.float32)
    else:
        midx = _masked_uniform_points(key, mask.reshape(-1), n_cand * k, draw_method)
        mx, my = midx // wm, midx % wm
        # mask-space -> gt/image-space (truncating scale, reference int() cast)
        gx = jnp.minimum((mx * hg) // hm, hg - 1)
        gy = jnp.minimum((my * wg) // wm, wg - 1)
        depths = gt[gx, gy]
        flat = (gx * wg + gy).astype(jnp.float32)

    depths = depths.reshape(n_cand, k)
    flat = flat.reshape(n_cand, k)

    # Sort each list by depth descending (closer-first HR-WSI convention,
    # sampling.py:121-122).
    order = jnp.argsort(-depths, axis=-1, stable=True)
    depths = jnp.take_along_axis(depths, order, axis=-1)
    flat = jnp.take_along_axis(flat, order, axis=-1)

    if spec.scored:
        scores = _score_lists(
            sampler_name, depths, jnp.min(gt), jnp.max(gt), threshold
        )
        _, top = jax.lax.top_k(scores, rpi)
        depths = depths[top]
        flat = flat[top]
    else:
        depths = depths[:rpi]
        flat = flat[:rpi]

    return jnp.stack([flat, depths], axis=-1)


def sample_rankings_batch(
    key: jax.Array,
    gts: jax.Array,
    masks: jax.Array,
    **kwargs,
) -> jax.Array:
    """vmap of :func:`sample_rankings` over the batch dim -> (B, RPI, K, 2)."""
    keys = jax.random.split(key, gts.shape[0])
    fn = functools.partial(sample_rankings, **kwargs)
    return jax.vmap(fn)(keys, gts, masks)
