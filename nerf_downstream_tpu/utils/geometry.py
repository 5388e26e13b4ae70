"""Geometry utilities (reference co3d_3d/src/utils/geometry.py:8-115).

Rotation matrices, random SE(3) sampling, KD-tree correspondence search,
and a device-chunked nearest-neighbor search (the reference's GPU-chunked
variant, here a jitted JAX scan over query chunks).
"""

from __future__ import annotations

import numpy as np

from nerf_downstream_tpu.data.transforms import rotation_matrix as M  # noqa: F401


def sample_random_trans(pcd: np.ndarray, rng=None,
                        rotation_range: float = 360.0) -> np.ndarray:
    """Random SE(3): rotation about a random axis (up to rotation_range
    degrees) composed with re-centering the cloud."""
    rng = rng or np.random.default_rng()
    axis = rng.normal(size=3)
    angle = np.deg2rad(rotation_range) * (rng.random() - 0.5)
    T = np.eye(4)
    T[:3, :3] = M(axis, angle)
    T[:3, 3] = T[:3, :3] @ -pcd.mean(0)
    return T


def apply_transform(pts: np.ndarray, T: np.ndarray) -> np.ndarray:
    return pts @ T[:3, :3].T + T[:3, 3]


def find_correspondences(
    src: np.ndarray, tgt: np.ndarray, search_radius: float
) -> np.ndarray:
    """KD-tree radius correspondences [(i, j)] (reference :54-77)."""
    from scipy.spatial import cKDTree

    tree = cKDTree(tgt)
    dists, idx = tree.query(src, k=1)
    sel = dists <= search_radius
    return np.stack([np.nonzero(sel)[0], idx[sel]], axis=1)


def chunked_nn_search(queries, references, chunk: int = 4096):
    """Nearest-neighbor indices+distances, chunked on device (reference's
    GPU-chunked search :80-115)."""
    import jax
    import jax.numpy as jnp

    q = jnp.asarray(queries, jnp.float32)
    r = jnp.asarray(references, jnp.float32)
    n = q.shape[0]
    pad = (-n) % chunk
    qp = jnp.pad(q, ((0, pad), (0, 0)))

    @jax.jit
    def go(qp):
        def body(_, qc):
            d = (
                jnp.sum(qc**2, 1, keepdims=True)
                - 2 * qc @ r.T
                + jnp.sum(r**2, 1)[None, :]
            )
            idx = jnp.argmin(d, axis=1)
            return None, (idx, jnp.min(d, axis=1))

        _, (idx, dist) = jax.lax.scan(
            body, None, qp.reshape(-1, chunk, q.shape[1])
        )
        return idx.reshape(-1), dist.reshape(-1)

    idx, dist = go(qp)
    return np.asarray(idx[:n]), np.sqrt(np.maximum(np.asarray(dist[:n]), 0))
