"""Per-Gaussian geometry: projection, 3D covariance, EWA 2D covariance, conic, radius.

Vectorized pure-jnp parity with the preprocess stage of the CUDA rasterizer
(forward.cu:232-319 and helpers forward.cu:79-149, auxiliary.h:41-56,149-171):

  * frustum cull at p_view.z > 0.2            (in_frustum, auxiliary.h:160)
  * p_w = 1 / (p_hom.w + 1e-7)                (forward.cu:280)
  * cov3D = R diag(s²) Rᵀ from normalized quat (computeCov3D, forward.cu:120-149)
  * EWA cov2D with frustum-clamped Jacobian + 0.3 dilation (computeCov2D,
    forward.cu:79-118; lims from camera.h:63-66)
  * conic = inverse 2×2; radius = ceil(3·√λ₁), λ₁ = mid + √max(0.1, mid²−det)
    (forward.cu:287-298)
  * pix = ndc2Pix(ndc) = ((ndc+1)·S − 1)/2    (auxiliary.h:41-44)

Everything is differentiable jnp; JAX AD supplies the analytic backward that
backward.cu:138-310 hand-writes (cov2D→cov3D→scale/rot, projection→mean), including
the clamp-masked gradients via jnp.clip/jnp.where.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gaussian_lic_tpu.camera import Camera

FRUSTUM_NEAR = 0.2        # auxiliary.h:160
COV2D_DILATION = 0.3      # forward.cu:115-116
OPACITY_THRESHOLD = 1.0 / 255.0  # forward.h OPACITY_THRESHOLD


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (w,x,y,z) → rotation matrix (...,3,3).

    Standard Hamilton convention; matches computeCov3D's R (forward.cu:133-137,
    accounting for glm's column-major constructor storing the transpose).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_cov3d(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Σ = R diag(s²) Rᵀ, returned as full (...,3,3) (computeCov3D, forward.cu:120-149).

    `scale` is the *activated* (exp'd) scale, `quat` need not be pre-normalized.
    """
    R = quat_to_rotmat(quat)
    RS = R * scale[..., None, :]  # R @ diag(s)
    # HIGHEST: bare @ lowers to bf16 MXU passes on TPU (PERF.md numerics note)
    return jnp.matmul(RS, jnp.swapaxes(RS, -1, -2),
                      precision=jax.lax.Precision.HIGHEST)


class ProjectionResult(NamedTuple):
    """Per-Gaussian screen-space quantities. All (P,...) float32 unless noted."""

    in_front: jnp.ndarray   # (P,) bool — passed near-plane cull
    depth: jnp.ndarray      # (P,) view-space z
    xy: jnp.ndarray         # (P,2) pixel-space mean
    cov2d: jnp.ndarray      # (P,3) packed (a, b, c) of [[a,b],[b,c]], dilated
    conic: jnp.ndarray      # (P,3) packed inverse (A, B, C)
    radius: jnp.ndarray     # (P,) float radius in pixels (ceil'd), 0 where culled
    det_valid: jnp.ndarray  # (P,) bool — 2D covariance invertible


def project_gaussians(
    xyz: jnp.ndarray,        # (P,3) world means
    scale: jnp.ndarray,      # (P,3) activated scales
    quat: jnp.ndarray,       # (P,4) rotations (normalized inside)
    camera: Camera,
) -> ProjectionResult:
    """Vectorized preprocess geometry (forward.cu:232-305, minus SH/culling counts)."""
    intr = camera.intr
    R_cw = camera.pose.R_cw
    t_cw = camera.pose.t_cw

    # world → view (transformPoint4x3 semantics); HIGHEST keeps these off the
    # bf16 MXU path — geometry at scene scale loses ~8 mantissa bits otherwise
    hi = jax.lax.Precision.HIGHEST
    p_view = jnp.matmul(xyz, R_cw.T, precision=hi) + t_cw
    depth = p_view[..., 2]
    in_front = depth > FRUSTUM_NEAR

    # world → clip → ndc → pixels (forward.cu:278-281, auxiliary.h:41)
    ph = jnp.matmul(xyz, camera.full_proj[:3, :3].T, precision=hi) + camera.full_proj[:3, 3]
    pw = jnp.matmul(xyz, camera.full_proj[3, :3].T, precision=hi) + camera.full_proj[3, 3]
    inv_w = 1.0 / (pw + 1e-7)
    ndc_xy = ph[..., :2] * inv_w[..., None]
    W = jnp.float32(intr.width)
    H = jnp.float32(intr.height)
    xy = jnp.stack(
        [
            ((ndc_xy[..., 0] + 1.0) * W - 1.0) * 0.5,
            ((ndc_xy[..., 1] + 1.0) * H - 1.0) * 0.5,
        ],
        axis=-1,
    )

    # EWA: clamp the Jacobian evaluation point (forward.cu:91-94)
    tz = jnp.where(jnp.abs(depth) > 1e-8, depth, 1e-8)
    tx = jnp.clip(p_view[..., 0] / tz, intr.limx_neg, intr.limx_pos) * tz
    ty = jnp.clip(p_view[..., 1] / tz, intr.limy_neg, intr.limy_pos) * tz

    # J = [[fx/tz, 0, −fx·tx/tz²], [0, fy/tz, −fy·ty/tz²]]  (forward.cu:96-99)
    fx = jnp.float32(intr.fx)
    fy = jnp.float32(intr.fy)
    inv_tz = 1.0 / tz
    inv_tz2 = inv_tz * inv_tz
    # M = J @ R_cw : rows kept as six (P,) components. The whole EWA chain below
    # is written as scalar-expanded (P,) arithmetic on purpose: batched (P,3,3)
    # dot_generals for these tiny contractions cost ~32 ms at P=1M on v5e
    # (pathological tiny-batched-matmul lowering), while the expanded form fuses
    # into one VPU pass (~1 ms) and gives AD an equally elementwise backward.
    J00 = fx * inv_tz
    J11 = fy * inv_tz
    J02 = -fx * tx * inv_tz2
    J12 = -fy * ty * inv_tz2
    m00 = J00 * R_cw[0, 0] + J02 * R_cw[2, 0]
    m01 = J00 * R_cw[0, 1] + J02 * R_cw[2, 1]
    m02 = J00 * R_cw[0, 2] + J02 * R_cw[2, 2]
    m10 = J11 * R_cw[1, 0] + J12 * R_cw[2, 0]
    m11 = J11 * R_cw[1, 1] + J12 * R_cw[2, 1]
    m12 = J11 * R_cw[1, 2] + J12 * R_cw[2, 2]

    # Σ = R diag(s²) Rᵀ, six unique entries as (P,) arrays (computeCov3D,
    # forward.cu:120-149, same math as build_cov3d without the rank-3 tensors)
    qn = quat / (jnp.linalg.norm(quat, axis=-1, keepdims=True) + 1e-12)
    qr, qx, qy, qz = qn[..., 0], qn[..., 1], qn[..., 2], qn[..., 3]
    R00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    R01 = 2.0 * (qx * qy - qr * qz)
    R02 = 2.0 * (qx * qz + qr * qy)
    R10 = 2.0 * (qx * qy + qr * qz)
    R11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    R12 = 2.0 * (qy * qz - qr * qx)
    R20 = 2.0 * (qx * qz - qr * qy)
    R21 = 2.0 * (qy * qz + qr * qx)
    R22 = 1.0 - 2.0 * (qx * qx + qy * qy)
    s0 = scale[..., 0] * scale[..., 0]
    s1 = scale[..., 1] * scale[..., 1]
    s2_ = scale[..., 2] * scale[..., 2]
    S00 = s0 * R00 * R00 + s1 * R01 * R01 + s2_ * R02 * R02
    S01 = s0 * R00 * R10 + s1 * R01 * R11 + s2_ * R02 * R12
    S02 = s0 * R00 * R20 + s1 * R01 * R21 + s2_ * R02 * R22
    S11 = s0 * R10 * R10 + s1 * R11 * R11 + s2_ * R12 * R12
    S12 = s0 * R10 * R20 + s1 * R11 * R21 + s2_ * R12 * R22
    S22 = s0 * R20 * R20 + s1 * R21 * R21 + s2_ * R22 * R22

    # cov2D = M Σ Mᵀ (quadratic forms, expanded)
    t0 = S00 * m00 + S01 * m01 + S02 * m02
    t1 = S01 * m00 + S11 * m01 + S12 * m02
    t2 = S02 * m00 + S12 * m01 + S22 * m02
    a = m00 * t0 + m01 * t1 + m02 * t2 + COV2D_DILATION
    b = m10 * t0 + m11 * t1 + m12 * t2
    u0 = S00 * m10 + S01 * m11 + S02 * m12
    u1 = S01 * m10 + S11 * m11 + S12 * m12
    u2 = S02 * m10 + S12 * m11 + S22 * m12
    c = m10 * u0 + m11 * u1 + m12 * u2 + COV2D_DILATION
    cov2d = jnp.stack([a, b, c], axis=-1)

    det = a * c - b * b
    det_valid = det != 0.0  # forward.cu:288
    safe_det = jnp.where(det_valid, det, 1.0)
    inv_det = 1.0 / safe_det
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    # radius (forward.cu:296-298)
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    radius = jnp.where(in_front & det_valid, radius, 0.0)

    return ProjectionResult(
        in_front=in_front,
        depth=depth,
        xy=xy,
        cov2d=cov2d,
        conic=conic,
        radius=radius,
        det_valid=det_valid,
    )


def max_contrib_power_rect(
    conic: jnp.ndarray,    # (..., 3) packed (A, B, C)
    xy: jnp.ndarray,       # (..., 2) Gaussian pixel center
    rect_min: jnp.ndarray, # (..., 2) tile pixel min (inclusive)
    rect_max: jnp.ndarray, # (..., 2) tile pixel max (inclusive)
) -> jnp.ndarray:
    """StopThePop exact tile culling on stacked inputs — see
    max_contrib_power_rect_components for the math and parity notes."""
    return max_contrib_power_rect_components(
        conic[..., 0], conic[..., 1], conic[..., 2],
        xy[..., 0], xy[..., 1],
        rect_min[..., 0], rect_min[..., 1],
        rect_max[..., 0], rect_max[..., 1],
    )


def max_contrib_power_rect_components(
    A, B, C,               # conic components, any broadcastable shape
    mx, my,                # Gaussian pixel center
    rminx, rminy,          # tile pixel min (inclusive)
    rmaxx, rmaxy,          # tile pixel max (inclusive)
) -> jnp.ndarray:
    """StopThePop exact tile culling: the minimum of the Gaussian power
    q(d) = 0.5(A dx² + C dy²) + B dx dy over a pixel rect.

    Parity with max_contrib_power_rect_gaussian_float (forward.h:39-80): a tile
    contributes iff this min-power ≤ log(opacity/THRESHOLD). Returns 0 when the
    center lies inside the rect. Component-array form so callers in any data
    layout avoid building (..., 2)/(..., 3) stacked intermediates.
    """
    x_min_diff = rminx - mx
    y_min_diff = rminy - my
    x_left = (x_min_diff > 0.0).astype(jnp.float32)
    y_above = (y_min_diff > 0.0).astype(jnp.float32)
    not_in_x = x_left + (mx > rmaxx).astype(jnp.float32)
    not_in_y = y_above + (my > rmaxy).astype(jnp.float32)

    size_x = rmaxx - rminx
    size_y = rmaxy - rminy

    px = x_left * rminx + (1.0 - x_left) * rmaxx
    py = y_above * rminy + (1.0 - y_above) * rmaxy

    dx = jnp.where(x_min_diff >= 0, size_x, -size_x)  # copysign(size, diff)
    dy = jnp.where(y_min_diff >= 0, size_y, -size_y)

    diffx = mx - px
    diffy = my - py

    eps = 1e-12
    rcp_dxdxA = 1.0 / (size_x * size_x * A + eps)
    rcp_dydyC = 1.0 / (size_y * size_y * C + eps)

    tx = not_in_y * jnp.clip((dx * A * diffx + dx * B * diffy) * rcp_dxdxA, 0.0, 1.0)
    ty = not_in_x * jnp.clip((dy * B * diffx + dy * C * diffy) * rcp_dydyC, 0.0, 1.0)
    qx = px + tx * dx
    qy = py + ty * dy

    ddx = mx - qx
    ddy = my - qy
    power = 0.5 * (A * ddx * ddx + C * ddy * ddy) + B * ddx * ddy
    outside = (not_in_x + not_in_y) > 0.0
    return jnp.where(outside, power, 0.0)
