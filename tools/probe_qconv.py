import os, numpy as np, jax, jax.numpy as jnp
from jax import lax
from pldepth_tpu.models.quantize import QuantConv
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)).astype(np.float32) * 0.7, jnp.bfloat16)
w = rng.normal(size=(3, 3, 8, 16)).astype(np.float32) * 0.1
b = rng.normal(size=(16,)).astype(np.float32) * 0.05
w_scale = np.maximum(np.abs(w).max(axis=(0,1,2)), 1e-12) / 127.0
kq = np.clip(np.round(w / w_scale), -127, 127).astype(np.int8)
a_scale = float(np.abs(np.asarray(x, np.float32)).max()) / 127.0
params = {"kernel_q": jnp.asarray(kq), "w_scale": jnp.asarray(w_scale),
          "bias": jnp.asarray(b), "a_scale": jnp.asarray(a_scale, jnp.float32)}
mod = QuantConv(features=16, kernel_size=(3,3), dtype=jnp.bfloat16)
yq = np.asarray(jax.device_get(mod.apply({"params": params}, x)), np.float32)
yf = np.asarray(jax.device_get(
    lax.conv_general_dilated(x.astype(jnp.float32), jnp.asarray(w), (1,1), "SAME",
        dimension_numbers=("NHWC","HWIO","NHWC")) + b), np.float32)
print(jax.default_backend(), "pearson", np.corrcoef(yq.ravel(), yf.ravel())[0,1],
      "std", yq.std(), yf.std(), "maxabs q", np.abs(yq).max())
