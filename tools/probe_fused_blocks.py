"""Probe: compile every block the fused-encoder planner marks `fused`
for 448^2 and 224^2 b0 inputs on the REAL TPU; report which compile and
what the planner estimated. Used to calibrate _block_vmem_bytes against
Mosaic's scoped-vmem stack allocator (hard limit 16M)."""
import faulthandler

faulthandler.dump_traceback_later(600, repeat=True)

import jax
import jax.numpy as jnp

from pldepth_tpu.models.efficientnet import EfficientNetEncoder
from pldepth_tpu.models.fused_infer import plan_encoder, _block_vmem_bytes
from pldepth_tpu.ops.fused_mbconv import fused_mbconv_infer

print("backend:", jax.default_backend())

enc = EfficientNetEncoder(variant="b0", dtype=jnp.bfloat16)
variables = jax.jit(enc.init, static_argnums=(2,))(
    jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32), False
)
enc_p = variables["params"]
enc_s = variables["batch_stats"]

for size in (448, 224):
    # verify=False: this tool exists to report raw per-block compile
    # verdicts vs the estimator; the default probe-verified planning
    # would demote failures to XLA before we could see them
    plans = plan_encoder(enc_p, enc_s, (size, size), "b0", verify=False)
    h = w = size // 2
    print(f"== input {size}^2 ==")
    for plan in plans:
        ce = plan.params.dw.shape[-1]
        cout = plan.params.wp.shape[-1]
        cin = plan.params.we.shape[0] if plan.params.we is not None else ce
        est = _block_vmem_bytes(h, w, cin, ce, cout, plan.params.we is not None)
        if plan.fused:
            x = jnp.zeros((1, h, w, cin), jnp.bfloat16)
            try:
                y = fused_mbconv_infer(
                    x, plan.params, kernel=plan.kernel, stride=plan.stride,
                    residual=plan.residual,
                )
                y.block_until_ready()
                status = "OK"
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                status = "OOM" if "vmem" in msg or "memory" in msg else "FAIL"
                if status == "FAIL":
                    status += ": " + (msg.splitlines() or [""])[0][:120]
        else:
            status = "(xla)" + (" tap" if plan.tap else "")
        print(f"  {plan.name:18s} hw={h}x{w} cin={cin} ce={ce} k={plan.kernel}"
              f" s={plan.stride} est={est/2**20:6.2f}M  {status}")
        h, w = h // plan.stride, w // plan.stride
print("PROBE DONE")
