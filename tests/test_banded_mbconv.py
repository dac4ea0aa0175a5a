"""Banded two-pass fused MBConv (ops/banded_mbconv.py): parity with the
jnp reference across strides, kernel sizes, band counts, expand==1 and
residual variants (interpret mode; real-TPU verdicts come from the
probe-compile planner, see models/fused_infer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.ops.banded_mbconv import banded_mbconv_infer
from pldepth_tpu.ops.fused_mbconv import MBConvParams, mbconv_infer_ref


def _rand_params(key, cin, ce, cout, k, cse, expand=True):
    ks = jax.random.split(key, 16)
    f = lambda i, shape, s=0.2: jax.random.normal(ks[i], shape, jnp.float32) * s
    return MBConvParams(
        we=f(0, (cin, ce)) if expand else None,
        e_scale=1.0 + f(1, (ce,), 0.05) if expand else None,
        e_shift=f(2, (ce,), 0.05) if expand else None,
        dw=f(3, (k, k, ce)),
        d_scale=1.0 + f(4, (ce,), 0.05),
        d_shift=f(5, (ce,), 0.05),
        se_w1=f(6, (ce, cse)),
        se_b1=f(7, (cse,)),
        se_w2=f(8, (cse, ce)),
        se_b2=f(9, (ce,)),
        wp=f(10, (ce, cout)),
        p_scale=1.0 + f(11, (cout,), 0.05),
        p_shift=f(12, (cout,), 0.05),
    )


@pytest.mark.parametrize(
    "k,stride,expand,residual,band",
    [
        (3, 1, True, True, 4),
        (3, 2, True, False, 4),
        (5, 1, True, True, 8),
        (5, 2, True, False, 2),
        (3, 1, False, False, 4),
        (3, 1, True, True, 16),  # single band == whole image
    ],
)
def test_banded_matches_ref_f32(k, stride, expand, residual, band):
    key = jax.random.PRNGKey(0)
    cin, cout = 8, 8
    ce = cin * (6 if expand else 1)
    p = _rand_params(jax.random.fold_in(key, 1), cin, ce, cout, k, 4,
                     expand=expand)
    x = jax.random.normal(key, (2, 16, 24, cin), jnp.float32)
    got = np.array(
        banded_mbconv_infer(x, p, kernel=k, stride=stride, residual=residual,
                            band_rows=band)
    )
    want = np.array(
        mbconv_infer_ref(x, p, kernel=k, stride=stride, residual=residual)
    )
    assert got.shape == want.shape == (2, 16 // stride, 24 // stride, cout)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_banded_bf16_band_invariance():
    """bf16 path: band partitioning must not change values beyond bf16
    noise, and must track the reference."""
    key = jax.random.PRNGKey(3)
    cin = cout = 8
    ce = 48
    p = _rand_params(jax.random.fold_in(key, 1), cin, ce, cout, 3, 4)
    x = jax.random.normal(key, (1, 32, 16, cin), jnp.bfloat16)
    outs = [
        np.array(
            banded_mbconv_infer(x, p, kernel=3, stride=1, residual=True,
                                band_rows=b),
            np.float32,
        )
        for b in (8, 32)
    ]
    np.testing.assert_allclose(outs[0], outs[1], rtol=2e-2, atol=2e-2)
    want = np.array(
        mbconv_infer_ref(x, p, kernel=3, stride=1, residual=True), np.float32
    )
    scale = np.abs(want).max()
    assert np.abs(outs[0] - want).max() < 0.05 * scale
