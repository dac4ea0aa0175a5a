"""Fused inference MBConv (ops/fused_mbconv.py): parity with the jnp
reference and with the actual Flax MBConv module (inference mode, running
stats), across kernel sizes, strides, expand==1 and residual variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.models.efficientnet import MBConv
from pldepth_tpu.ops.fused_mbconv import (
    MBConvParams,
    fold_bn,
    fused_mbconv_infer,
    mbconv_infer_ref,
)


def _rand_params(key, cin, ce, cout, k, cse, dtype=jnp.float32, expand=True):
    ks = jax.random.split(key, 16)
    f = lambda i, shape, s=0.2: jax.random.normal(ks[i], shape, dtype) * s
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
    "k,stride,expand,residual",
    [(3, 1, True, True), (3, 2, True, False), (5, 1, True, True),
     (5, 2, True, False), (3, 1, False, False)],
)
def test_fused_matches_ref_f32(k, stride, expand, residual):
    key = jax.random.PRNGKey(0)
    cin, cout = 8, 8
    ce = cin * (6 if expand else 1)
    p = _rand_params(jax.random.fold_in(key, 1), cin, ce, cout, k, 4,
                     expand=expand)
    x = jax.random.normal(key, (2, 16, 12, cin), jnp.float32)
    got = np.array(fused_mbconv_infer(x, p, kernel=k, stride=stride,
                                      residual=residual))
    want = np.array(mbconv_infer_ref(x, p, kernel=k, stride=stride,
                                     residual=residual))
    assert got.shape == want.shape == (2, 16 // stride, 12 // stride, cout)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def _module_params_to_fused(variables, expand):
    pr, bs = variables["params"], variables["batch_stats"]

    def bn(name):
        return fold_bn(pr[name]["scale"], pr[name]["bias"],
                       bs[name]["mean"], bs[name]["var"])

    e_s = e_t = we = None
    if expand:
        we = pr["expand_conv"]["kernel"][0, 0]
        e_s, e_t = bn("expand_bn")
    d_s, d_t = bn("dw_bn")
    p_s, p_t = bn("project_bn")
    dwk = pr["dw_conv"]["kernel"]  # (k, k, 1, Ce)
    return MBConvParams(
        we=we, e_scale=e_s, e_shift=e_t,
        dw=dwk[:, :, 0, :], d_scale=d_s, d_shift=d_t,
        se_w1=pr["se"]["reduce"]["kernel"][0, 0],
        se_b1=pr["se"]["reduce"]["bias"],
        se_w2=pr["se"]["expand"]["kernel"][0, 0],
        se_b2=pr["se"]["expand"]["bias"],
        wp=pr["project_conv"]["kernel"][0, 0],
        p_scale=p_s, p_shift=p_t,
    )


@pytest.mark.parametrize("k,stride", [(3, 1), (5, 2)])
def test_fused_matches_flax_module_bf16(k, stride):
    """End parity: the fused kernel fed by fold_bn on a real module's
    variables reproduces MBConv.apply(train=False) within bf16 rounding."""
    key = jax.random.PRNGKey(7)
    cin = cout = 8
    blk = MBConv(in_ch=cin, out_ch=cout, expand=6, kernel=k, stride=stride,
                 dtype=jnp.bfloat16)
    x = jax.random.normal(key, (2, 16, 16, cin), jnp.bfloat16)
    variables = blk.init(key, x, False)
    # non-trivial running stats so the fold actually matters
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape)
        / max(a.size, 1),
        variables,
    )
    (want, _tap), _ = blk.apply(variables, x, False, mutable=["batch_stats"])
    p = _module_params_to_fused(variables, expand=True)
    got = fused_mbconv_infer(
        x, p, kernel=k, stride=stride,
        residual=(stride == 1 and cin == cout),
    )
    w = np.array(want, np.float32)
    g = np.array(got, np.float32)
    scale = np.abs(w).max()
    assert np.abs(g - w).max() < 0.05 * scale, np.abs(g - w).max() / scale
