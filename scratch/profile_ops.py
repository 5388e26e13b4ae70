import time, numpy as np, jax, jax.numpy as jnp
from nerf_downstream_tpu.sparse import kernel_offsets, build_kernel_map, stride_coords, unique_coords
from nerf_downstream_tpu.ops.sparse_conv import sparse_conv_apply
from nerf_downstream_tpu.sparse.types import SparseVoxels

N = 16384
rng = np.random.default_rng(0)
lin = rng.choice(128**3, N, replace=False)
coords = np.stack([np.zeros(N), lin // 128**2, (lin // 128) % 128, lin % 128], 1).astype(np.int32)
sv = SparseVoxels(coords=jnp.asarray(coords), feats=jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32)),
                  mask=jnp.ones(N, bool), stride=1)
offs = kernel_offsets(3, 1)

def timed(name, fn, *args):
    f = jax.jit(fn)
    t0 = time.time(); out = f(*args); jax.block_until_ready(out); c = time.time() - t0
    t0 = time.time()
    for _ in range(10): out = f(*args)
    jax.block_until_ready(out); dt = (time.time() - t0) / 10
    print(f"{name:28s} compile={c:7.2f}s run={dt*1000:9.2f}ms", flush=True)
    return out

km = timed("build_kernel_map k27", lambda c, m: build_kernel_map(c, m, c, m, offs), sv.coords, sv.mask)
w = jnp.asarray(rng.normal(size=(27, 32, 32)).astype(np.float32))
timed("sparse_conv fwd", lambda f, k, w: sparse_conv_apply(f, k, w, compute_dtype=jnp.bfloat16), sv.feats, km, w)
timed("conv fwd+bwd", lambda f, k, w: jax.grad(lambda ff, ww: sparse_conv_apply(ff, k, ww, compute_dtype=jnp.bfloat16).sum(), argnums=(0,1))(f, w)[0].sum(), sv.feats, km, w)
timed("unique_coords", lambda c, m: unique_coords(c, m)[0], sv.coords, sv.mask)
timed("plain sort 16k", lambda x: jax.lax.sort(x), jnp.asarray(rng.integers(0, 1<<30, N).astype(np.uint32)))
timed("gather rows 27N from N", lambda f, k: f[k.reshape(-1)].sum(), sv.feats, km)
timed("gather scalar 27N", lambda h, k: h[k.reshape(-1) % N].sum(), jnp.asarray(rng.integers(0,1000,N).astype(np.uint32)), km)
