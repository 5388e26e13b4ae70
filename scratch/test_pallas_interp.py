import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
# interpret mode on CPU
from nerf_downstream_tpu.ops.pallas import gather_matmul as gm
import functools


rng = np.random.default_rng(0)
N, K, CI, CO, T = 1024, 4, 128, 128, 256
x = jnp.asarray(rng.normal(size=(N + 1, CI)).astype(np.float32))
x = x.at[-1].set(0)
km = jnp.asarray(rng.integers(0, N + 1, (K, N)).astype(np.int32))
w = jnp.asarray(rng.normal(size=(K, CI, CO)).astype(np.float32))
ref = gm.gather_matmul_reference(x, km, w)
out = gm.gather_matmul(x, km, w, tile_n=T, interpret=True)
print("max err", np.abs(np.asarray(out) - np.asarray(ref)).max())
