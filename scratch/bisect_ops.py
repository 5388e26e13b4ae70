import time, numpy as np, jax, jax.numpy as jnp
from nerf_downstream_tpu import config as cfg
cfg.parse_config("CoordinateContext.grid_extent = 128")
from nerf_downstream_tpu.sparse import kernel_offsets, stride_coords, unique_coords, field_to_sparse, sparse_to_field
from nerf_downstream_tpu.sparse.kernels import build_grid_index, build_kernel_map_grid
from nerf_downstream_tpu.sparse.context import invert_kernel_map
from nerf_downstream_tpu.ops.sparse_conv import sparse_conv_apply
from nerf_downstream_tpu.sparse.types import SparseVoxels, PointField
from nerf_downstream_tpu.train.metrics import fast_hist

N = 16384
rng = np.random.default_rng(0)
lin = rng.choice(128**3, N, replace=False)
coords = np.stack([np.zeros(N), lin // 128**2, (lin // 128) % 128, lin % 128], 1).astype(np.int32)
sv = SparseVoxels(coords=jnp.asarray(coords), feats=jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32)), mask=jnp.ones(N, bool), stride=1)
field = PointField(coords=sv.coords.astype(jnp.float32), feats=sv.feats, mask=sv.mask)
offs = kernel_offsets(3, 1)

def timed(name, fn, *args, n=10):
    f = jax.jit(fn)
    t0 = time.time(); out = f(*args); jax.block_until_ready(out); c = time.time() - t0
    t0 = time.time()
    for _ in range(n): out = f(*args)
    jax.block_until_ready(out); dt = (time.time() - t0) / n
    print(f"{name:30s} compile={c:7.2f}s run={dt*1000:8.2f}ms", flush=True)
    return out

timed("field_to_sparse", lambda f: field_to_sparse(f)[0].feats, field)
timed("stride_coords", lambda c, m: stride_coords(SparseVoxels(coords=c, feats=jnp.zeros((N,0)), mask=m, stride=1), 2).coords, sv.coords, sv.mask)
grid, origin = timed("build_grid_index", lambda c, m: build_grid_index(c, m, 2, 128, 1), sv.coords, sv.mask)
km = timed("kernel_map_grid k27", lambda g, o, c, m: build_kernel_map_grid(g, o, 2, 128, 1, N, c, m, offs), grid, origin, sv.coords, sv.mask)
timed("invert_kernel_map", lambda k: invert_kernel_map(k, N), km)
w32 = jnp.asarray(rng.normal(size=(27, 32, 32)).astype(np.float32))
timed("conv32 fwd+bwd", lambda f, w: jax.grad(lambda ff, ww: sparse_conv_apply(ff, km, ww, compute_dtype=jnp.bfloat16).sum(), argnums=(0,1))(f, w)[0].sum(), sv.feats, w32)
f256 = jnp.asarray(rng.normal(size=(N, 256)).astype(np.float32))
w256 = jnp.asarray(rng.normal(size=(27, 256, 256)).astype(np.float32))
timed("conv256 fwd+bwd", lambda f, w: jax.grad(lambda ff, ww: sparse_conv_apply(ff, km, ww, compute_dtype=jnp.bfloat16).sum(), argnums=(0,1))(f, w)[0].sum(), f256, w256)
labels = jnp.asarray(rng.integers(0, 20, N).astype(np.int32))
timed("fast_hist+metrics", lambda lg, lb: fast_hist(jnp.argmax(lg, -1), lb, 20).sum(), jnp.asarray(rng.normal(size=(N,20)).astype(np.float32)), labels)
timed("sparse_to_field", lambda s, f: sparse_to_field(SparseVoxels(coords=sv.coords, feats=s, mask=sv.mask, stride=1), f, jnp.arange(N, dtype=jnp.int32)).feats, sv.feats, field)
