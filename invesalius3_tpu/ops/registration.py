"""Registration math: fiducial base change, FRE, object registration, and
point-cloud ICP — the navigation geometry core.

Reference: invesalius/data/bases.py — ``base_creation`` :69 (fiducial ->
base-change matrix), ``calculate_fre`` :111 (fiducial registration error),
``object_registration`` :190; ICP applied at :174-189; plus the vendored
Gohlke transformations (invesalius/data/transformations.py) for
euler/quaternion/affine compose-decompose.

All small fixed-size matrix math: jitted jnp for the per-pose hot path
(runs at the 120 Hz navigation rate), numpy for setup-time calls.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def base_creation(fiducials: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Base-change matrix from 3 fiducials (reference bases.py:69-108):
    returns (m, q) where m is the 3x3 base matrix and q the origin.

    Base: g1 = p1 - p2 (x axis through ears), g3 = g1 x (p3 - p2) normal,
    g2 = g3 x g1; origin = midpoint of p1, p2.
    """
    p1, p2, p3 = np.asarray(fiducials, np.float64)
    sub1 = p2 - p1
    sub2 = p3 - p1
    lamb = float(sub1 @ sub2) / float(sub1 @ sub1)
    q = p1 + lamb * sub1
    g1 = p1 - q
    g2 = p3 - q
    if not g1.any():
        g1 = p2 - q
    g3 = np.cross(g2, g1)
    m = np.array(
        [
            g1 / np.linalg.norm(g1),
            g2 / np.linalg.norm(g2),
            g3 / np.linalg.norm(g3),
        ]
    ).T
    return m, q


def estimate_rigid_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Least-squares rigid transform (Kabsch/Umeyama, no scaling) mapping
    src points to dst points; returns a 4x4 matrix.  This is the
    fiducial-based tracker->image estimation
    (reference navigation.py:549 EstimateTrackerToInVTransformationMatrix)."""
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    cs = src.mean(axis=0)
    cd = dst.mean(axis=0)
    H = (src - cs).T @ (dst - cd)
    U, _, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    t = cd - R @ cs
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = t
    return m


def calculate_fre(
    fiducials_raw: np.ndarray,
    fiducials_img: np.ndarray,
    m_change: np.ndarray,
) -> float:
    """Fiducial registration error: RMS distance between transformed
    tracker fiducials and image fiducials (reference bases.py:111-140)."""
    errs = []
    for raw, img in zip(np.asarray(fiducials_raw), np.asarray(fiducials_img)):
        p = m_change @ np.append(raw[:3], 1.0)
        errs.append(np.sum((p[:3] - img[:3]) ** 2))
    return float(np.sqrt(np.mean(errs)))


@jax.jit
def apply_affine(m: jax.Array, points: jax.Array) -> jax.Array:
    """(4,4) @ (N,3) -> (N,3) with homogeneous divide (per-pose hot path)."""
    homo = jnp.concatenate([points, jnp.ones((*points.shape[:-1], 1))], axis=-1)
    out = homo @ m.T
    return out[..., :3] / out[..., 3:4]


def icp(
    source: np.ndarray,
    target: np.ndarray,
    max_iterations: int = 50,
    tolerance: float = 1e-5,
    init: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, float]:
    """Point-to-point ICP refining source onto target (reference
    iterativeclosestpoint.py uses vtkIterativeClosestPointTransform).

    Nearest-neighbor search + Kabsch per iteration, all on device: the
    NxM distance matrix is one matmul-shaped op on the MXU.
    Returns (4x4 matrix, final RMS error).
    """
    src = jnp.asarray(source, jnp.float32)
    tgt = jnp.asarray(target, jnp.float32)
    m_total = np.eye(4) if init is None else np.asarray(init)
    cur = np.asarray(apply_affine(jnp.asarray(m_total, jnp.float32), src))

    @jax.jit
    def nearest(src_pts, tgt_pts):
        d2 = (
            jnp.sum(src_pts**2, axis=1)[:, None]
            - 2.0 * src_pts @ tgt_pts.T
            + jnp.sum(tgt_pts**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d2, axis=1)
        return tgt_pts[idx], jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 0.0))

    prev_err = np.inf
    for _ in range(max_iterations):
        matched, dists = nearest(jnp.asarray(cur), tgt)
        err = float(jnp.sqrt(jnp.mean(dists**2)))
        m_step = estimate_rigid_transform(cur, np.asarray(matched))
        m_total = m_step @ m_total
        cur = np.asarray(apply_affine(jnp.asarray(m_total, jnp.float32), src))
        if abs(prev_err - err) < tolerance:
            break
        prev_err = err
    return m_total, prev_err


def object_registration(
    fiducials: np.ndarray, orients: np.ndarray, coord_raw: np.ndarray, m_change: np.ndarray
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Coil/object registration (reference bases.py:190-250 semantics):
    from 4 object fiducials (in tracker space) and the current reference
    sensor pose, compute the object's fixed transforms used per-frame by
    the coregistration loop.

    Returns (t_obj_reference, r_s0_raw, s0_dyn, m_obj_raw).
    """
    from invesalius3_tpu.ops import transforms as tr

    obj_fids = np.asarray(fiducials, np.float64)[:, :3]
    # object base from first 3 fiducials
    m, q = base_creation(obj_fids[:3])
    m_obj_raw = np.eye(4)
    m_obj_raw[:3, :3] = m.T
    m_obj_raw[:3, 3] = q

    # fixed-sensor (static) pose at registration time
    a, b, g = np.radians(coord_raw[1, 3:])
    r_s0_raw = tr.euler_matrix(a, b, g, axes="rzyx")
    s0_trans = np.eye(4)
    s0_trans[:3, 3] = coord_raw[1, :3]
    s0_dyn = s0_trans @ r_s0_raw

    t_obj_reference = np.linalg.inv(s0_dyn) @ m_obj_raw
    return t_obj_reference, r_s0_raw, s0_dyn, m_obj_raw
