import numpy as np, jax, jax.numpy as jnp, time
from nerf_downstream_tpu.ops.pallas.gather_matmul import gather_matmul, gather_matmul_reference

rng = np.random.default_rng(0)
N, K, CI, CO, T = 2048, 27, 128, 128, 512
x = jnp.asarray(rng.normal(size=(N + 1, CI)).astype(np.float32)).astype(jnp.bfloat16)
x = x.at[-1].set(0)
km = jnp.asarray(rng.integers(0, N + 1, (K, N)).astype(np.int32))
w = jnp.asarray(rng.normal(size=(K, CI, CO)).astype(np.float32)).astype(jnp.bfloat16)

ref = gather_matmul_reference(x, km, w)
t0=time.time(); out = gather_matmul(x, km, w, tile_n=T); out.block_until_ready(); print("compile", round(time.time()-t0,1))
err = np.abs(np.asarray(out) - np.asarray(ref)).max()
print("max err", err)
def bench(f, *a, n=20):
    f(*a)[0].block_until_ready() if isinstance(f(*a), tuple) else jax.block_until_ready(f(*a))
    t0=time.time()
    for _ in range(n): o=f(*a)
    jax.block_until_ready(o); return (time.time()-t0)/n
jr = jax.jit(gather_matmul_reference)
print("ref ms", round(bench(jr, x, km, w)*1000,3))
print("pallas ms", round(bench(lambda *a: gather_matmul(*a, tile_n=T), x, km, w)*1000,3))
