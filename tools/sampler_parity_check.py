"""Sampler distributional parity: on-device samplers vs the reference numpy
samplers, on identical (gt, mask) inputs.

Runs the reference's ACTUAL sampling classes (pldepth/data/sampling.py:
100-243, imported in place — numpy code, no porting) and our vectorized
on-device samplers over the same synthetic depth images, and compares the
chi²/spread/near-equal statistics of the produced ranking lists (the
chi2compare.py:139-161 protocol). This nails the claim that on-device
sampling is *statistically* the reference, not just plausibly similar —
exact per-list equality is impossible (different RNGs) and not the contract.

Writes tests/golden/sampler_stats.npz with the reference-side statistics;
tests/test_sampler_parity.py recomputes the our-side statistics TF-free and
compares against the stored goldens.

Run: python tools/sampler_parity_check.py   (CPU, ~1-2 min)
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# protocol constants — shared with tests/test_sampler_parity.py
N_IMAGES = 8
SIZE = 64
RPI = 64
K = 5
SEED = 0
TRIALS = 3

# (reference class name, our sampler name, reference sampling_type)
STRATEGIES = [
    ("PurelyMaskedRandomSamplingStrategy", "purely_masked", 3),
    ("MaskedRandomSamplingStrategy", "masked", None),
    ("ThresholdedMaskedRandomSamplingStrategy", "thresholded", 0),
    ("InformationScoreBasedSampling", "info_score", 1),
]

# relative tolerance per statistic (distributions under different RNGs;
# headroom ~2x over the worst observed trial-to-trial deviation)
TOLERANCES = {"chi2": 0.15, "spread": 0.10, "eq_frac": 0.35, "sorted_frac": 1e-9}


def protocol_images():
    from pldepth_tpu.data import SyntheticDepthDataset

    ds = SyntheticDepthDataset(n=N_IMAGES, image_size=SIZE, seed=SEED)
    return [ds.loader(i) for i in range(ds.size)]


def our_stats(sampler_name: str, trial: int) -> dict:
    import jax

    from pldepth_tpu.diagnostics.chi2 import ranking_stats
    from pldepth_tpu.sampling import sample_rankings_batch

    items = protocol_images()
    gts = np.stack([it["gt"] for it in items])
    masks = np.stack([it["mask"] for it in items])
    r = np.asarray(
        sample_rankings_batch(
            jax.random.key(SEED + trial),
            gts,
            masks,
            sampler_name=sampler_name,
            rankings_per_image=RPI,
            ranking_size=K,
        )
    )
    return ranking_stats(r.reshape(-1, K, 2))


def reference_stats(class_name: str, trial: int) -> dict:
    sys.path.insert(0, "/root/reference")
    import pldepth.data.sampling as ref_sampling

    from pldepth_tpu.diagnostics.chi2 import ranking_stats

    class _Params:  # the two keys SamplingStrategy reads (sampling.py:9,51)
        def get_parameter(self, key):
            return {"ranking_size": K, "downscaling_factor": 1.0}[key]

    strategy = getattr(ref_sampling, class_name)(_Params())
    np.random.seed(1000 + trial)
    all_rankings = []
    for item in protocol_images():
        r = strategy.sample_masked_point_batch(
            item["image"], item["mask"], item["gt"], RPI
        )
        all_rankings.append(np.asarray(r, np.float32))
    return ranking_stats(np.concatenate(all_rankings, axis=0))


def main():
    golden_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "golden",
    )
    os.makedirs(golden_dir, exist_ok=True)
    out = {}
    ok = True
    for class_name, ours_name, _stype in STRATEGIES:
        ref = [reference_stats(class_name, t) for t in range(TRIALS)]
        mine = [our_stats(ours_name, t) for t in range(TRIALS)]
        row = {}
        for stat in ("chi2", "spread", "eq_frac", "sorted_frac"):
            ref_mean = float(np.mean([s[stat] for s in ref]))
            our_mean = float(np.mean([s[stat] for s in mine]))
            denom = max(abs(ref_mean), 1e-3)
            rel = abs(our_mean - ref_mean) / denom
            tol = TOLERANCES[stat]
            good = rel <= tol or abs(our_mean - ref_mean) < 1e-9
            ok &= good
            row[stat] = (ref_mean, our_mean, rel, "OK" if good else "FAIL")
            out[f"{ours_name}/{stat}"] = ref_mean
        print(f"{ours_name:14s}", {k: f"ref={v[0]:.4f} ours={v[1]:.4f} rel={v[2]:.3f} {v[3]}" for k, v in row.items()})
    np.savez(
        os.path.join(golden_dir, "sampler_stats.npz"),
        **{k: np.float64(v) for k, v in out.items()},
    )
    print("goldens written" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
