import numpy as np, time
import jax, jax.numpy as jnp
from nerf_downstream_tpu.ops.pallas.gather_matmul import gather_matmul, gather_matmul_reference
rng = np.random.default_rng(0)
N, K, CI, CO, T = 1024, 4, 128, 128, 256
x = jnp.asarray(rng.normal(size=(N + 1, CI)).astype(np.float32)).astype(jnp.bfloat16)
x = x.at[-1].set(0)
km = jnp.asarray(rng.integers(0, N + 1, (K, N)).astype(np.int32))
w = jnp.asarray(rng.normal(size=(K, CI, CO)).astype(np.float32)).astype(jnp.bfloat16)
t0=time.time()
out = gather_matmul(x, km, w, tile_n=T); out.block_until_ready()
print("compile+run", round(time.time()-t0,1), flush=True)
ref = gather_matmul_reference(x, km, w)
print("max err", float(np.abs(np.asarray(out) - np.asarray(ref)).max()), flush=True)
