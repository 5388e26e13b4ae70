import numpy as np, time
import jax, jax.numpy as jnp
from functools import partial
from nerf_downstream_tpu.ops.pallas.gather_matmul import gather_matmul, gather_matmul_reference

rng = np.random.default_rng(0)
for N, CI, CO, T in [(16384, 128, 128, 512), (65536, 128, 128, 512), (65536, 256, 256, 1024), (262144, 128, 128, 1024)]:
    K = 27
    x = jnp.asarray(rng.normal(size=(N + 1, CI)).astype(np.float32)).astype(jnp.bfloat16)
    km = jnp.asarray(rng.integers(0, N + 1, (K, N)).astype(np.int32))
    w = jnp.asarray(rng.normal(size=(K, CI, CO)).astype(np.float32)).astype(jnp.bfloat16)
    REP = 10

    @jax.jit
    def chain_ref(x):
        def body(c, _):
            o = gather_matmul_reference(c, km, w)
            return (c.at[:-1].add(0 * o[:, :CI].astype(c.dtype)), None)
        c, _ = jax.lax.scan(body, x, None, length=REP)
        return c

    @partial(jax.jit, static_argnames=("tile",))
    def chain_pal(x, tile):
        def body(c, _):
            o = gather_matmul(c, km, w, tile_n=tile)
            return (c.at[:-1].add(0 * o[:, :CI].astype(c.dtype)), None)
        c, _ = jax.lax.scan(body, x, None, length=REP)
        return c

    pass
    jax.block_until_ready(chain_ref(x))
    t0=time.time(); jax.block_until_ready(chain_ref(x)); t_ref=(time.time()-t0)/REP*1000
    jax.block_until_ready(chain_pal(x, T))
    t0=time.time(); jax.block_until_ready(chain_pal(x, T)); t_pal=(time.time()-t0)/REP*1000
    flops = 2 * K * N * CI * CO
    print(f"N={N:6d} C={CI:3d}: xla={t_ref:7.2f}ms pallas={t_pal:7.2f}ms speedup={t_ref/t_pal:5.2f}x mxu={flops/(t_pal/1000)/1e12/394*100:5.1f}%", flush=True)
