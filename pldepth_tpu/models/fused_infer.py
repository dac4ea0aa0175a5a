"""Serving-path EfficientNet encoder with fused MBConv blocks.

Runs the inference (running-stats BatchNorm) encoder forward with each
eligible MBConv block executed as one Pallas kernel (ops/fused_mbconv.py),
eliminating the per-block HBM round-trips of the expanded 6x tensor. Blocks
that must stay on the XLA path:

- decoder tap blocks (first block of stages 3/4/6 — their expand activation
  feeds the decoder skip concats, models/efficientnet.py DECODER_TAP_STAGES,
  mirroring reference pldepth/models/pl_hourglass.py:65-83), and
- blocks whose whole-image working set exceeds the VMEM budget (the fused
  kernel holds the expanded (H, W, Ce) tensor plus an f32 accumulator
  per image; high-resolution early stages overflow ~16 MB/core).

Both paths consume the same folded-BN parameter bundles and agree with
``EfficientNetEncoder.apply(..., train=False)`` to bf16 rounding
(tests/test_fused_infer.py).
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pldepth_tpu.models.efficientnet import (
    _STAGE_DEFS,
    DECODER_TAP_STAGES,
    VARIANTS,
    round_filters,
    round_repeats,
)
from pldepth_tpu.ops.fused_mbconv import (
    MBConvParams,
    fold_bn,
    fused_mbconv_infer,
    mbconv_infer_ref,
)

# Coarse per-kernel working-set screen (bytes). The dominant residents are
# the f32 depthwise accumulator (4 B/elem), one shifted f32 temp, and the
# bf16 expanded scratch; VMEM is ~16 MB/core. This is only a pre-filter:
# Mosaic's scoped-vmem stack allocator is not predictable from first
# principles (observed on v5e: a (28,28,672) k=5 block needs 19.07M against
# a 5.4M estimate, while a (56,56,240) k=5 block with a larger estimate
# compiles fine), so eligibility is decided by a cached probe compile of
# each candidate block (`_fused_compile_ok`), not by this estimate.
DEFAULT_VMEM_BUDGET = 12 * 2**20

# probe-compile verdict per (shape/dtype/kernel/stride/residual) signature;
# module-level so retraces under jit/shard_map don't re-probe
_PROBE_CACHE: Dict[Tuple, bool] = {}


def _params_struct(p: "MBConvParams") -> "MBConvParams":
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), p
    )


def _fused_compile_ok(
    p: MBConvParams, hh: int, ww: int, cin: int, dtype,
    kernel: int, stride: int, residual: bool,
) -> bool:
    """True iff the fused kernel compiles for this block shape on the
    current backend. Mosaic rejects some shapes outright (odd 7x7 spatial
    dims hit "unsupported shape cast"; large blocks overflow the 16M
    scoped-vmem stack), and the failure is only knowable by compiling.
    Batch size does not affect the verdict (the grid is over images, so
    per-step VMEM is per-image); probing at batch 1 covers every batch."""
    import logging

    key = (
        hh, ww, cin, str(jnp.dtype(dtype)), kernel, stride, residual,
        tuple(
            (tuple(a.shape), str(a.dtype))
            for a in jax.tree_util.tree_leaves(p)
        ),
    )
    if key in _PROBE_CACHE:
        return _PROBE_CACHE[key]
    x_struct = jax.ShapeDtypeStruct((1, hh, ww, cin), jnp.dtype(dtype))
    # the AOT executable is discarded (it cannot be injected into the jit
    # dispatch cache); the persistent JAX compilation cache makes the real
    # serving compile of the same (B=1) signature a cache hit, and larger
    # batches reuse the Mosaic kernel body
    try:
        fused_mbconv_infer.lower(
            x_struct, _params_struct(p),
            kernel=kernel, stride=stride, residual=residual,
        ).compile()
        ok = True
    except Exception as e:  # noqa: BLE001 — any compile failure => XLA path
        logging.getLogger(__name__).info(
            "fused MBConv probe: (%d,%d,%d) k=%d s=%d falls back to XLA: %s",
            hh, ww, cin, kernel, stride,
            (str(e).splitlines() or [""])[0][:160],
        )
        ok = False
    _PROBE_CACHE[key] = ok
    return ok


class BlockPlan(NamedTuple):
    name: str
    params: MBConvParams
    kernel: int
    stride: int
    residual: bool
    fused: bool
    tap: str | None  # taps dict key if this block emits its expand activation


def _affine(bn_p, bn_s):
    return fold_bn(bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"])


def extract_block_params(blk_p, blk_s) -> MBConvParams:
    """Fold one Flax MBConv block's params + batch stats into the kernel's
    inference bundle. Flax Conv kernels are (kh, kw, in, out); the depthwise
    kernel (feature_group_count == channels) is (k, k, 1, Ce)."""
    has_expand = "expand_conv" in blk_p
    if has_expand:
        we = blk_p["expand_conv"]["kernel"][0, 0]  # (Cin, Ce)
        e_scale, e_shift = _affine(blk_p["expand_bn"], blk_s["expand_bn"])
    else:
        we = e_scale = e_shift = None
    dw = blk_p["dw_conv"]["kernel"][:, :, 0, :]  # (k, k, Ce)
    d_scale, d_shift = _affine(blk_p["dw_bn"], blk_s["dw_bn"])
    p_scale, p_shift = _affine(blk_p["project_bn"], blk_s["project_bn"])
    return MBConvParams(
        we=we, e_scale=e_scale, e_shift=e_shift,
        dw=dw, d_scale=d_scale, d_shift=d_shift,
        se_w1=blk_p["se"]["reduce"]["kernel"][0, 0],
        se_b1=blk_p["se"]["reduce"]["bias"],
        se_w2=blk_p["se"]["expand"]["kernel"][0, 0],
        se_b2=blk_p["se"]["expand"]["bias"],
        wp=blk_p["project_conv"]["kernel"][0, 0],
        p_scale=p_scale, p_shift=p_shift,
    )


def _block_vmem_bytes(h: int, w: int, cin: int, ce: int, cout: int,
                      has_expand: bool, itemsize: int = 2) -> int:
    acc = h * w * ce * 4  # f32 depthwise accumulator
    tmp = h * w * ce * 4  # one rolled/masked f32 temporary
    # expanded scratch in the compute dtype (the kernel allocates a token
    # 1x1 scratch when expand==1; negligible)
    scratch = h * w * ce * itemsize if has_expand else 0
    io = (h * w * cin + h * w * cout) * itemsize
    return acc + tmp + scratch + io


def plan_encoder(
    enc_params: Dict[str, Any],
    enc_stats: Dict[str, Any],
    input_hw: Tuple[int, int],
    variant: str = "b0",
    vmem_budget: int = DEFAULT_VMEM_BUDGET,
    dtype: Any = jnp.bfloat16,
    verify: bool = True,
) -> List[BlockPlan]:
    """Static per-block execution plan (fused vs XLA) for one input size.

    With ``verify`` (default), each candidate block is probe-compiled at
    batch 1 and demoted to the XLA path if Mosaic rejects it; verdicts are
    cached per shape signature. On non-TPU backends the kernel runs in
    interpret mode, which always works, so the probe is skipped."""
    do_probe = verify and jax.default_backend() == "tpu"
    itemsize = jnp.dtype(dtype).itemsize
    width, depth = VARIANTS[variant]
    h, w = input_hw[0] // 2, input_hw[1] // 2  # after the stride-2 stem
    in_ch = round_filters(32, width)
    plans: List[BlockPlan] = []
    for stage_num, (expand, ch, repeats, stride, kernel) in enumerate(
        _STAGE_DEFS, start=1
    ):
        out_ch = round_filters(ch, width)
        for i in range(round_repeats(repeats, depth)):
            name = f"stage{stage_num}_block{i}"
            s = stride if i == 0 else 1
            tap = (
                f"expand_{stage_num}"
                if i == 0 and stage_num in DECODER_TAP_STAGES
                else None
            )
            ce = in_ch * expand
            est = _block_vmem_bytes(
                h, w, in_ch, ce, out_ch, expand != 1, itemsize
            )
            params = extract_block_params(enc_params[name], enc_stats[name])
            residual = s == 1 and in_ch == out_ch
            fused = tap is None and est <= vmem_budget
            if fused and do_probe:
                fused = _fused_compile_ok(
                    params, h, w, in_ch, dtype, kernel, s, residual
                )
            plans.append(
                BlockPlan(
                    name=name,
                    params=params,
                    kernel=kernel,
                    stride=s,
                    residual=residual,
                    fused=fused,
                    tap=tap,
                )
            )
            h, w = -(-h // s), -(-w // s)  # SAME conv: ceil, not floor
            in_ch = out_ch
    return plans


def _conv_bn_swish(x, kernel, scale, shift, stride: int):
    dt = x.dtype
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(dt), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = (y.astype(jnp.float32) * scale + shift).astype(dt)
    return y * jax.nn.sigmoid(y)


def _xla_block_with_tap(x, p: MBConvParams, *, kernel, stride, residual):
    """XLA path for tap blocks: same math as mbconv_infer_ref but returns
    the expand activation alongside the block output."""
    dt = x.dtype
    h = _conv_bn_swish(x, p.we[None, None], p.e_scale, p.e_shift, 1)
    tail = MBConvParams(
        we=None, e_scale=None, e_shift=None,
        dw=p.dw, d_scale=p.d_scale, d_shift=p.d_shift,
        se_w1=p.se_w1, se_b1=p.se_b1, se_w2=p.se_w2, se_b2=p.se_b2,
        wp=p.wp, p_scale=p.p_scale, p_shift=p.p_shift,
    )
    y = mbconv_infer_ref(h, tail, kernel=kernel, stride=stride, residual=False)
    if residual:
        y = y + x
    return y.astype(dt), h


def encoder_infer(
    enc_params: Dict[str, Any],
    enc_stats: Dict[str, Any],
    x: jax.Array,
    plans: List[BlockPlan],
    dtype: Any = jnp.bfloat16,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Inference encoder forward. Returns (top, taps) exactly like
    ``EfficientNetEncoder.__call__`` with train=False for a model whose
    compute dtype is ``dtype`` (the Flax encoder computes in module.dtype;
    hardcoding bf16 here would silently downgrade float32 models)."""
    x = x.astype(dtype)
    s, t = _affine(enc_params["stem_bn"], enc_stats["stem_bn"])
    x = _conv_bn_swish(x, enc_params["stem_conv"]["kernel"], s, t, 2)

    taps: Dict[str, jax.Array] = {}
    for plan in plans:
        if plan.tap is not None:
            x, tap = _xla_block_with_tap(
                x, plan.params, kernel=plan.kernel, stride=plan.stride,
                residual=plan.residual,
            )
            taps[plan.tap] = tap
        elif plan.fused:
            x = fused_mbconv_infer(
                x, plan.params, kernel=plan.kernel, stride=plan.stride,
                residual=plan.residual,
            )
        else:
            x = mbconv_infer_ref(
                x, plan.params, kernel=plan.kernel, stride=plan.stride,
                residual=plan.residual,
            )

    s, t = _affine(enc_params["top_bn"], enc_stats["top_bn"])
    x = _conv_bn_swish(x, enc_params["top_conv"]["kernel"], s, t, 1)
    return x, taps
