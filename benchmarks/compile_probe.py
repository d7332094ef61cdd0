"""Compile-time probe: one CFG UNet forward, conv_impl pallas vs xla (TPU)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from diffusionspatialcontrol_tpu.config import ModelConfig
from diffusionspatialcontrol_tpu.models import factory
from diffusionspatialcontrol_tpu.models.unet import UNetCond, unet_apply

cfg = ModelConfig()
params = factory.init_pipeline_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 4)).astype(jnp.bfloat16)
t = jnp.asarray([500.0, 500.0])
cond = UNetCond(context=jax.random.normal(jax.random.PRNGKey(2), (2, 77, 768)).astype(jnp.bfloat16))
impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
fn = jax.jit(lambda p, x, t, c: unet_apply(p, cfg.unet, x, t, c, attn_impl="pallas", conv_impl=impl))
t0 = time.perf_counter()
out = fn(params["unet"], x, t, cond)
np.asarray(out)
print(f"conv_impl={impl}: compile+first-run {time.perf_counter()-t0:.1f}s", flush=True)
ts = []
for i in range(3):
    xi = x * (1.0 + 1e-5*(i+1))
    t0 = time.perf_counter(); np.asarray(fn(params["unet"], xi, t, cond)); ts.append(time.perf_counter()-t0)
print(f"conv_impl={impl}: steady p50 {sorted(ts)[1]*1e3:.1f} ms", flush=True)
