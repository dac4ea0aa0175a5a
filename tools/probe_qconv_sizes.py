"""Probe XLA's TPU int8 conv vs float across spatial sizes.

Motivation: trained-model int8 serving collapses at 448^2 on this chip but
is exact-to-int8-rounding at 64^2 with the SAME weights, and on CPU at
every size (tools/debug_quant_layers.py runs, 2026-08-21). If the int8
conv emitter itself breaks at large spatial extents, a single conv will
show it without any model around it.

Covers: dense 3x3, depthwise 3x3 (feature_group_count=C), dense 1x1 —
each at sizes 16..448, plus int32-accumulation sanity.

Run: python -u tools/probe_qconv_sizes.py        (TPU)
     JAX_PLATFORMS=cpu ... (via jax.config in-process, use PROBE_CPU=1)
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if os.environ.get("PROBE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    backend = jax.default_backend()

    def case(size, cin, cout, k, groups):
        x = rng.normal(size=(1, size, size, cin)).astype(np.float32) * 0.7
        w = rng.normal(size=(k, k, cin // groups, cout)).astype(np.float32) * 0.1
        w_scale = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
        kq = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
        a_scale = float(np.abs(x).max()) / 127.0
        q = np.clip(np.round(x / a_scale), -127, 127).astype(np.int8)

        dn = ("NHWC", "HWIO", "NHWC")

        @jax.jit
        def f_int8(qx, qw):
            y = lax.conv_general_dilated(
                qx, qw, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=groups,
                preferred_element_type=jnp.int32,
            )
            return y.astype(jnp.bfloat16) * jnp.asarray(
                a_scale * w_scale, jnp.bfloat16
            )

        @jax.jit
        def f_ref(xx, ww):
            return lax.conv_general_dilated(
                xx, ww, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=groups,
            )

        yq = np.asarray(jax.device_get(f_int8(q, kq)), np.float32)
        yf = np.asarray(jax.device_get(f_ref(x, w)), np.float32)
        # also the exact integer reference: same q/kq through float64 conv
        yq_ref = np.asarray(jax.device_get(f_ref(
            q.astype(np.float32), kq.astype(np.float32))), np.float32)
        yq_exact = yq_ref * (a_scale * w_scale)

        pear = float(np.corrcoef(yq.ravel(), yf.ravel())[0, 1])
        int_exact = float(np.abs(
            yq / (a_scale * w_scale) - yq_ref
        ).max())  # int32 path vs float-emulated int path, in integer units
        return {"pearson_vs_float": round(pear, 5),
                "int_units_max_err": round(int_exact, 2),
                "std_q": round(float(yq.std()), 4),
                "std_f": round(float(yf.std()), 4),
                "quant_theory_pear": round(float(np.corrcoef(
                    yq_exact.ravel(), yf.ravel())[0, 1]), 5)}

    for size in (16, 64, 112, 224, 448):
        for name, cin, cout, k, groups in (
            ("dense3x3", 32, 32, 3, 1),
            ("dw3x3", 96, 96, 3, 96),
            ("dense1x1", 96, 64, 1, 1),
        ):
            r = case(size, cin, cout, k, groups)
            print(json.dumps({"backend": backend, "size": size,
                              "conv": name, **r}), flush=True)


if __name__ == "__main__":
    main()
