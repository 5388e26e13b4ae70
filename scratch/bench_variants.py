import numpy as np, time
import jax, jax.numpy as jnp
from functools import partial

rng = np.random.default_rng(0)
N, K, C = 65536, 27, 128
x = jnp.asarray(rng.normal(size=(N + 1, C)).astype(np.float32)).astype(jnp.bfloat16)
km = jnp.asarray(rng.integers(0, N + 1, (K, N)).astype(np.int32))
# realistic map: mostly near-diagonal (sorted coords -> neighbors nearby)
base = np.arange(N)
km_real = np.stack([np.clip(base + rng.integers(-2000, 2000, N), 0, N) for _ in range(K)]).astype(np.int32)
km_real = jnp.asarray(km_real)
w = jnp.asarray(rng.normal(size=(K, C, C)).astype(np.float32)).astype(jnp.bfloat16)

def v_scan(x, km, w):
    def step(acc, xs):
        wk, ik = xs
        return acc + jnp.dot(x[ik], wk, preferred_element_type=jnp.float32), None
    out, _ = jax.lax.scan(step, jnp.zeros((N, C), jnp.float32), (w, km))
    return out

def v_big(x, km, w):
    g = x[km.reshape(-1)].reshape(K, N, C)
    return jnp.einsum('knc,kcd->nd', g, w, preferred_element_type=jnp.float32)

def v_onetake_scan(x, km, w):
    g = x[km.reshape(-1)].reshape(K, N, C)
    def step(acc, xs):
        wk, gk = xs
        return acc + jnp.dot(gk, wk, preferred_element_type=jnp.float32), None
    out, _ = jax.lax.scan(step, jnp.zeros((N, C), jnp.float32), (w, g))
    return out

def bench(f, km, n=10):
    @jax.jit
    def chain(x):
        def body(c, _):
            o = f(c, km, w)
            return c.at[:-1].add(0 * o.astype(c.dtype)), None
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c
    jax.block_until_ready(chain(x))
    t0=time.time(); jax.block_until_ready(chain(x)); return (time.time()-t0)/n*1000

for name, f in [("scan27", v_scan), ("big-take+einsum", v_big), ("one-take+scan", v_onetake_scan)]:
    t_rand = bench(f, km); t_real = bench(f, km_real)
    print(f"{name:18s} random={t_rand:7.2f}ms  near-diag={t_real:7.2f}ms", flush=True)
