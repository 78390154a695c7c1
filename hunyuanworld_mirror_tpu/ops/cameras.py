"""Distorted camera models + unscented-transform projection.

Behavioral parity target: reference submodules/gsplat/gsplat/cuda/csrc/
ProjectionUT3DGSFused.cu (310 LoC) + Cameras.cuh (1341 LoC) — UT-based splat
projection for cameras where the EWA Jacobian linearization breaks down:
OpenCV-style radial/tangential pinhole distortion and equidistant fisheye.

Method: the 3D Gaussian is represented by 7 sigma points (mean +- scaled
covariance square-root columns); each point runs through the EXACT nonlinear
camera (world -> cam -> model-specific pixel mapping), and the projected
mean/covariance are recovered from the UT weights (alpha=0.1, beta=2,
kappa=0 — the standard Merwe set gsplat uses). The dilated conic / radius /
culling tail is shared with the EWA path (projection.finish_projection), so
downstream tile binning and blending are identical: fisheye/distorted
rendering reuses the whole rasterizer stack.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .projection import Projected, finish_projection, quat_scale_to_covar

PINHOLE = "pinhole"
FISHEYE = "fisheye"
FTHETA = "ftheta"
ORTHO = "ortho"

# Rolling-shutter scan orders (reference cuda/_wrapper.py:31-36
# RollingShutterType). GLOBAL is a simultaneous exposure; the others read the
# sensor out along one image axis, so each pixel sees the camera at a
# different relative frame time in [0, 1].
SHUTTER_GLOBAL = "global"
SHUTTER_TOP_TO_BOTTOM = "top_to_bottom"
SHUTTER_LEFT_TO_RIGHT = "left_to_right"
SHUTTER_BOTTOM_TO_TOP = "bottom_to_top"
SHUTTER_RIGHT_TO_LEFT = "right_to_left"

# FThetaParams.reference_poly values (reference cuda/_wrapper.py:66-72
# FThetaPolynomialType): which of the two polynomials is authoritative —
# the other direction is recovered by Newton inversion.
PIXELDIST_TO_ANGLE = "pixeldist_to_angle"
ANGLE_TO_PIXELDIST = "angle_to_pixeldist"


class UTParams(NamedTuple):
    """Unscented-transform knobs (reference cuda/_wrapper.py:42-53
    UnscentedTransformParameters). Hashable so they ride through jit as a
    static argument."""
    alpha: float = 0.1
    beta: float = 2.0
    kappa: float = 0.0
    # validity margin as a fraction of the image extent
    in_image_margin_factor: float = 0.1
    # True: every sigma point must project validly; False: any one suffices
    require_all_sigma_points_valid: bool = True


class FThetaParams(NamedTuple):
    """NVIDIA f-theta camera distortion (reference Cameras.cuh:1049-1195,
    cuda/_wrapper.py:75-94 FThetaCameraDistortionParameters).

    The radial mapping is pixel_dist = f(theta) given directly as a degree-5
    polynomial (`angle_to_pixeldist_poly`) or implicitly as its inverse
    (`pixeldist_to_angle_poly`); `linear_cde` is the 2x2 skew [[c, d], [e, 1]]
    applied to the distorted offset before adding the principal point. The
    focal entries of K are unused — scale is baked into the polynomials; only
    the principal point (cx, cy) is read, offset by +0.5 because the f-theta
    convention puts the image origin at the first pixel's center
    (Cameras.cuh:1073-1077). All fields are plain floats/tuples so the params
    are hashable and ride through jit as static arguments.
    """
    reference_poly: str = ANGLE_TO_PIXELDIST
    pixeldist_to_angle_poly: Tuple[float, ...] = (0.0,) * 6
    angle_to_pixeldist_poly: Tuple[float, ...] = (0.0,) * 6
    max_angle: float = 3.141592653589793
    linear_cde: Tuple[float, float, float] = (1.0, 0.0, 0.0)


def _horner(coeffs, x: jnp.ndarray) -> jnp.ndarray:
    acc = jnp.full_like(x, float(coeffs[-1]))
    for c in reversed(coeffs[:-1]):
        acc = acc * x + float(c)
    return acc


def _poly_deriv(coeffs) -> Tuple[float, ...]:
    return tuple(float((i + 1) * c) for i, c in enumerate(coeffs[1:]))


def _newton_invert_poly(ref, approx, y: jnp.ndarray,
                        iters: int = 3) -> jnp.ndarray:
    """Solve ref(x) = y for x, seeded with x0 = approx(y) (reference
    Cameras.cuh eval_poly_inverse_horner_newton; default 3 iterations)."""
    dref = _poly_deriv(ref)
    x = _horner(approx, y)
    for _ in range(iters):
        f = _horner(ref, x) - y
        df = _horner(dref, x)
        safe = jnp.where(jnp.abs(df) > 1e-12, df, 1e-12)
        x = x - f / safe
    return x


def project_ftheta(means_c: jnp.ndarray, K: jnp.ndarray,
                   ftheta: FThetaParams) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> f-theta pixels (reference
    Cameras.cuh:1083-1140 camera_ray_to_image_point)."""
    x, y, z = means_c[..., 0], means_c[..., 1], means_c[..., 2]
    r = jnp.maximum(jnp.sqrt(x * x + y * y), 1e-12)
    theta = jnp.minimum(jnp.arctan2(r, z), ftheta.max_angle)
    if ftheta.reference_poly == PIXELDIST_TO_ANGLE:
        delta = _newton_invert_poly(ftheta.pixeldist_to_angle_poly,
                                    ftheta.angle_to_pixeldist_poly, theta)
    else:
        delta = _horner(ftheta.angle_to_pixeldist_poly, theta)
    c, d, e = ftheta.linear_cde
    ipx = delta * x / r
    ipy = delta * y / r
    u = c * ipx + d * ipy + K[..., 0, 2] + 0.5
    v = e * ipx + ipy + K[..., 1, 2] + 0.5
    return jnp.stack([u, v], -1)


def distort_opencv(xy: jnp.ndarray, radial: jnp.ndarray,
                   tangential: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """OpenCV pinhole distortion on normalized coords (..., 2).

    radial (..., up to 6): k1..k6 (rational model when k4..k6 given);
    tangential (..., 2): p1, p2.
    """
    k = jnp.zeros(xy.shape[:-1] + (6,), xy.dtype)
    k = k.at[..., :radial.shape[-1]].set(radial)
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4, r6 = r2 * r2, r2 * r2 * r2
    num = 1.0 + k[..., 0] * r2 + k[..., 1] * r4 + k[..., 2] * r6
    den = 1.0 + k[..., 3] * r2 + k[..., 4] * r4 + k[..., 5] * r6
    scale = num / den
    xd = x * scale
    yd = y * scale
    if tangential is not None:
        p1, p2 = tangential[..., 0], tangential[..., 1]
        xd = xd + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = yd + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], -1)


def project_fisheye(means_c: jnp.ndarray, K: jnp.ndarray,
                    radial: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Equidistant fisheye: theta*(1 + k1 th^2 + k2 th^4 + k3 th^6 + k4 th^8)
    along the radial direction (Kannala-Brandt / OpenCV fisheye)."""
    x, y, z = means_c[..., 0], means_c[..., 1], means_c[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    th2 = theta * theta
    d = theta
    if radial is not None:
        k = jnp.zeros(means_c.shape[:-1] + (4,), means_c.dtype)
        k = k.at[..., :radial.shape[-1]].set(radial)
        d = theta * (1.0 + k[..., 0] * th2 + k[..., 1] * th2 ** 2
                     + k[..., 2] * th2 ** 3 + k[..., 3] * th2 ** 4)
    scale = jnp.where(r > 1e-8, d / jnp.maximum(r, 1e-8), 1.0 / jnp.maximum(z, 1e-8))
    u = K[..., 0, 0] * x * scale + K[..., 0, 2]
    v = K[..., 1, 1] * y * scale + K[..., 1, 2]
    return jnp.stack([u, v], -1)


def camera_project(means_c: jnp.ndarray, K: jnp.ndarray,
                   camera_model: str = PINHOLE,
                   radial: Optional[jnp.ndarray] = None,
                   tangential: Optional[jnp.ndarray] = None,
                   ftheta: Optional[FThetaParams] = None) -> jnp.ndarray:
    """Camera-frame points (..., 3) -> pixels (..., 2) under the model."""
    if camera_model == FISHEYE:
        return project_fisheye(means_c, K, radial)
    if camera_model == FTHETA:
        return project_ftheta(means_c, K,
                              ftheta if ftheta is not None else FThetaParams())
    if camera_model == ORTHO:
        u = K[..., 0, 0] * means_c[..., 0] + K[..., 0, 2]
        v = K[..., 1, 1] * means_c[..., 1] + K[..., 1, 2]
        return jnp.stack([u, v], -1)
    z = jnp.maximum(means_c[..., 2], 1e-8)
    xy = means_c[..., :2] / z[..., None]
    if radial is not None or tangential is not None:
        xy = distort_opencv(
            xy,
            radial if radial is not None else jnp.zeros(xy.shape[:-1] + (1,)),
            tangential)
    u = K[..., 0, 0] * xy[..., 0] + K[..., 0, 2]
    v = K[..., 1, 1] * xy[..., 1] + K[..., 1, 2]
    return jnp.stack([u, v], -1)


# ---------------------------------------------------------------------------
# Rolling shutter: pose interpolation + iterative world->image projection
# (reference Cameras.cuh:276-430 interpolate_shutter_pose /
# shutter_relative_frame_time / world_point_to_image_point_shutter_pose).
# Quaternions are XYZW scalar-last throughout (utils/rotation.py convention).
# ---------------------------------------------------------------------------

def _quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (..., 3) by XYZW unit quaternions q (..., 4)."""
    qv, qw = q[..., :3], q[..., 3:4]
    t2 = 2.0 * jnp.cross(qv, v)
    return v + qw * t2 + jnp.cross(qv, t2)


def _quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def _quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray,
                t: jnp.ndarray) -> jnp.ndarray:
    """Shortest-path slerp between XYZW quats, vectorized over t (...,)."""
    d = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(d[..., None] < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta)
                   / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_t))
    q = w0[..., None] * q0 + w1[..., None] * q1
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _viewmat_pose(viewmat: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """world->cam (4, 4) -> (XYZW quat, translation)."""
    from ..utils.rotation import rotmat_to_quat
    return rotmat_to_quat(viewmat[..., :3, :3]), viewmat[..., :3, 3]


def shutter_relative_time(uv: jnp.ndarray, width: int, height: int,
                          shutter_type: str) -> jnp.ndarray:
    """Pixel (..., 2) -> relative frame time in [0, 1] for the scan order
    (reference Cameras.cuh:300-330 shutter_relative_frame_time)."""
    u, v = uv[..., 0], uv[..., 1]
    if shutter_type == SHUTTER_TOP_TO_BOTTOM:
        return jnp.floor(v) / (height - 1)
    if shutter_type == SHUTTER_LEFT_TO_RIGHT:
        return jnp.floor(u) / (width - 1)
    if shutter_type == SHUTTER_BOTTOM_TO_TOP:
        return (height - jnp.ceil(v)) / (height - 1)
    if shutter_type == SHUTTER_RIGHT_TO_LEFT:
        return (width - jnp.ceil(u)) / (width - 1)
    return jnp.zeros_like(u)


def _project_valid(pts_c: jnp.ndarray, uv: jnp.ndarray, width: int,
                   height: int, margin: float) -> jnp.ndarray:
    """Frontal-hemisphere + margin-expanded in-image test (the reference's
    per-model valid flags, Cameras.cuh camera_ray_to_image_point, with
    UnscentedTransformParameters.in_image_margin_factor = 0.1 default)."""
    mx, my = margin * width, margin * height
    inside = ((uv[..., 0] >= -mx) & (uv[..., 0] <= width + mx)
              & (uv[..., 1] >= -my) & (uv[..., 1] <= height + my))
    return inside & (pts_c[..., 2] > 1e-6)


def world_point_to_image_shutter(
    pts_w: jnp.ndarray,          # (..., 3) world points
    K: jnp.ndarray,
    pose_start: Tuple[jnp.ndarray, jnp.ndarray],  # (quat XYZW, t) world->cam
    pose_end: Tuple[jnp.ndarray, jnp.ndarray],
    width: int, height: int, shutter_type: str,
    camera_model: str = PINHOLE,
    radial: Optional[jnp.ndarray] = None,
    tangential: Optional[jnp.ndarray] = None,
    ftheta: Optional[FThetaParams] = None,
    iters: int = 10, margin: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rolling-shutter world->image projection: fixed-point iteration on the
    pixel's shutter time (reference Cameras.cuh:358-430, 10 iterations).

    Returns (uv (..., 2), valid (...,)) — valid iff the start- or end-pose
    projection lands inside the margin-expanded image (reference: both
    invalid -> point marked invalid)."""
    q0, t0 = pose_start
    q1, t1 = pose_end

    def proj(q, t):
        pts_c = _quat_rotate(q, pts_w) + t
        uv = camera_project(pts_c, K, camera_model, radial, tangential,
                            ftheta=ftheta)
        return uv, _project_valid(pts_c, uv, width, height, margin)

    uv0, v0 = proj(q0, t0)
    if shutter_type == SHUTTER_GLOBAL:
        return uv0, v0
    uv1, v1 = proj(q1, t1)
    uv = jnp.where(v0[..., None], uv0, uv1)
    for _ in range(iters):
        tr = shutter_relative_time(uv, width, height, shutter_type)
        q = _quat_slerp(q0, q1, tr)
        t = (1.0 - tr)[..., None] * t0 + tr[..., None] * t1
        uv, _ = proj(q, t)
    return uv, v0 | v1


def _sigma_points(means: jnp.ndarray, covars: jnp.ndarray,
                  alpha: float = 0.1, beta: float = 2.0, kappa: float = 0.0):
    """Merwe sigma points for (..., 3) gaussians.

    Returns (points (..., 7, 3), w_mean (7,), w_cov (7,))."""
    n = 3
    lam = alpha * alpha * (n + kappa) - n
    # covariance square root; jitter keeps flat splats (tiny s_z) factorable
    L = jnp.linalg.cholesky(covars + 1e-10 * jnp.eye(3, dtype=means.dtype))
    scaled = jnp.sqrt(n + lam) * L                       # columns are offsets
    offsets = jnp.concatenate([
        jnp.zeros_like(means)[..., None, :],
        jnp.swapaxes(scaled, -1, -2),
        -jnp.swapaxes(scaled, -1, -2),
    ], axis=-2)                                          # (..., 7, 3)
    pts = means[..., None, :] + offsets
    w_m = jnp.full((2 * n + 1,), 1.0 / (2 * (n + lam)))
    w_m = w_m.at[0].set(lam / (n + lam))
    w_c = w_m.at[0].set(lam / (n + lam) + 1.0 - alpha * alpha + beta)
    return pts, w_m, w_c


def fully_fused_projection_ut(
    means: jnp.ndarray, covars: jnp.ndarray, viewmats: jnp.ndarray,
    Ks: jnp.ndarray, width: int, height: int,
    camera_model: str = PINHOLE,
    radial_coeffs: Optional[jnp.ndarray] = None,     # (C, k) per camera
    tangential_coeffs: Optional[jnp.ndarray] = None,  # (C, 2)
    ftheta_coeffs: Optional[FThetaParams] = None,    # shared across cameras
    eps2d: float = 0.3, near_plane: float = 0.01, far_plane: float = 1e10,
    calc_compensations: bool = False,
    rolling_shutter: str = SHUTTER_GLOBAL,
    viewmats_rs: Optional[jnp.ndarray] = None,       # (C, 4, 4) end-of-frame
    ut_params: UTParams = UTParams(),
    radius_clip: float = 0.0,
) -> Projected:
    """UT projection of N world gaussians into C (possibly distorted) cameras.

    Same output contract as projection.fully_fused_projection, so the result
    feeds the standard tile binning + blending unchanged.

    With `rolling_shutter` != "global" and `viewmats_rs` (the end-of-frame
    pose), each sigma point is projected by the 10-step fixed-point shutter
    solve and depth uses the mid-frame pose (reference
    ProjectionUT3DGSFused.cu:72-99).
    """
    R = viewmats[:, :3, :3]
    t = viewmats[:, :3, 3]
    pts_w, w_m, w_c = _sigma_points(means, covars, alpha=ut_params.alpha,
                                    beta=ut_params.beta, kappa=ut_params.kappa)
    rs = rolling_shutter != SHUTTER_GLOBAL and viewmats_rs is not None

    def per_camera(Rc, tc, K, rad, tang, vm_rs):
        if rs:
            from ..utils.rotation import rotmat_to_quat
            q0 = rotmat_to_quat(Rc)
            q1, t1 = _viewmat_pose(vm_rs)
            uv, valid_s = world_point_to_image_shutter(
                pts_w, K, (q0, tc), (q1, t1), width, height, rolling_shutter,
                camera_model, rad, tang, ftheta_coeffs,
                margin=ut_params.in_image_margin_factor)   # (N, 7, 2/·)
            valid = (jnp.all(valid_s, axis=-1)
                     if ut_params.require_all_sigma_points_valid
                     else jnp.any(valid_s, axis=-1))
            q_mid = _quat_slerp(q0, q1, jnp.full((), 0.5))
            t_mid = 0.5 * (tc + t1)
            depth = (_quat_rotate(q_mid, means) + t_mid)[..., 2]
        else:
            pts_c = jnp.einsum("ij,nsj->nsi", Rc, pts_w) + tc      # (N, 7, 3)
            uv = camera_project(pts_c, K, camera_model, rad, tang,
                                ftheta=ftheta_coeffs)               # (N, 7, 2)
            valid = jnp.ones(means.shape[:1], bool)
            depth = jnp.einsum("ij,nj->ni", Rc, means)[..., 2] + tc[2]
        mean2d = jnp.einsum("s,nsi->ni", w_m, uv)
        d = uv - mean2d[:, None, :]
        cov2d = jnp.einsum("s,nsi,nsj->nij", w_c, d, d)
        return mean2d, cov2d, depth, valid

    m2d, cov2d, dep, valid = jax.vmap(per_camera)(
        R, t, Ks, radial_coeffs, tangential_coeffs, viewmats_rs)

    # fisheye sees behind-the-lens points; keep the frontal hemisphere only
    extra = valid if rs else None
    if camera_model == FISHEYE:
        extra = dep > 0 if extra is None else extra & (dep > 0)
    elif camera_model == FTHETA:
        # frontal hemisphere AND inside the polynomial's valid cone
        # (reference Cameras.cuh:1099-1106: FOV-clamped projections invalid)
        fth = ftheta_coeffs if ftheta_coeffs is not None else FThetaParams()
        means_c = jnp.einsum("cij,nj->cni", R, means) + t[:, None, :]
        r_xy = jnp.linalg.norm(means_c[..., :2], axis=-1)
        theta = jnp.arctan2(r_xy, means_c[..., 2])
        cone = (dep > 0) & (theta <= fth.max_angle)
        extra = cone if extra is None else extra & cone
    return finish_projection(m2d, cov2d, dep, width, height, eps2d,
                             near_plane, far_plane, calc_compensations,
                             extra_valid=extra, radius_clip=radius_clip)


# ---------------------------------------------------------------------------
# Inverse camera models: pixels -> world rays (for world-space eval3d
# rasterization, reference RasterizeToPixelsFromWorld3DGSFwd.cu:92-146 and
# Cameras.cuh image_point_to_world_ray_shutter_pose).
# ---------------------------------------------------------------------------

def undistort_opencv(xy_d: jnp.ndarray, radial: jnp.ndarray,
                     tangential: Optional[jnp.ndarray] = None,
                     iters: int = 10) -> jnp.ndarray:
    """Invert distort_opencv by fixed-point iteration on normalized coords."""
    k = jnp.zeros(xy_d.shape[:-1] + (6,), xy_d.dtype)
    k = k.at[..., :radial.shape[-1]].set(radial)

    def step(xy, _):
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        r4, r6 = r2 * r2, r2 * r2 * r2
        num = 1.0 + k[..., 0] * r2 + k[..., 1] * r4 + k[..., 2] * r6
        den = 1.0 + k[..., 3] * r2 + k[..., 4] * r4 + k[..., 5] * r6
        scale = num / den
        dx = dy = 0.0
        if tangential is not None:
            p1, p2 = tangential[..., 0], tangential[..., 1]
            dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        nxt = jnp.stack([(xy_d[..., 0] - dx) / scale,
                         (xy_d[..., 1] - dy) / scale], -1)
        return nxt, None

    xy, _ = jax.lax.scan(step, xy_d, None, length=iters)
    return xy


def _invert_fisheye_theta(rd: jnp.ndarray, radial: Optional[jnp.ndarray],
                          iters: int = 10) -> jnp.ndarray:
    """Solve rd = theta * (1 + k1 th^2 + ... + k4 th^8) for theta (Newton)."""
    if radial is None:
        return rd
    k = jnp.zeros(rd.shape + (4,), rd.dtype)
    k = k.at[..., :radial.shape[-1]].set(radial)

    def step(theta, _):
        th2 = theta * theta
        poly = 1.0 + k[..., 0] * th2 + k[..., 1] * th2 ** 2 \
            + k[..., 2] * th2 ** 3 + k[..., 3] * th2 ** 4
        dpoly = (3.0 * k[..., 0] * th2 + 5.0 * k[..., 1] * th2 ** 2
                 + 7.0 * k[..., 2] * th2 ** 3 + 9.0 * k[..., 3] * th2 ** 4)
        f = theta * poly - rd
        df = poly + dpoly
        return theta - f / jnp.maximum(jnp.abs(df), 1e-8) * jnp.sign(df), None

    theta, _ = jax.lax.scan(step, rd, None, length=iters)
    return theta


def image_point_to_world_ray(
    px_xy: jnp.ndarray,           # (..., 2) pixel coords
    viewmat: jnp.ndarray,         # (4, 4) world->cam
    K: jnp.ndarray,               # (3, 3)
    camera_model: str = PINHOLE,
    radial: Optional[jnp.ndarray] = None,       # (k,)
    tangential: Optional[jnp.ndarray] = None,   # (2,)
    ftheta: Optional[FThetaParams] = None,
    rolling_shutter: str = SHUTTER_GLOBAL,
    viewmat_rs: Optional[jnp.ndarray] = None,   # (4, 4) end-of-frame pose
    width: Optional[int] = None, height: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pixels -> (camera origin, unit world ray dirs (..., 3)).

    Inverts camera_project for the supported models. Under a rolling shutter
    (`rolling_shutter` != "global" with `viewmat_rs` + width/height given),
    each pixel uses the pose interpolated at its shutter-relative time
    (reference Cameras.cuh:331-351 image_point_to_world_ray_shutter_pose) and
    the returned origin is per-pixel (..., 3); global shutter returns a
    single (3,) origin.
    """
    rs = (rolling_shutter != SHUTTER_GLOBAL and viewmat_rs is not None
          and width is not None and height is not None)
    if camera_model == FTHETA:
        # reference Cameras.cuh:1142-1195 image_point_to_camera_ray: undo the
        # linear skew A=[c,d;e,1] via A^-1=[1,-d;-e,c]/(c-ed), then invert the
        # radial polynomial for theta.
        fth = ftheta if ftheta is not None else FThetaParams()
        c, d, e = fth.linear_cde
        ipx = px_xy[..., 0] - (K[0, 2] + 0.5)
        ipy = px_xy[..., 1] - (K[1, 2] + 0.5)
        det = c - e * d
        ux = (ipx - d * ipy) / det
        uy = (-e * ipx + c * ipy) / det
        delta = jnp.sqrt(ux * ux + uy * uy)
        if fth.reference_poly == PIXELDIST_TO_ANGLE:
            theta = _horner(fth.pixeldist_to_angle_poly, delta)
        else:
            theta = _newton_invert_poly(fth.angle_to_pixeldist_poly,
                                        fth.pixeldist_to_angle_poly, delta)
        center = delta < 1e-6
        s = jnp.where(center, 0.0,
                      jnp.sin(theta) / jnp.maximum(delta, 1e-6))
        dirs_c = jnp.stack([s * ux, s * uy,
                            jnp.where(center, 1.0, jnp.cos(theta))], -1)
        return _camera_rays_to_world(dirs_c, px_xy, viewmat, rs,
                                     rolling_shutter, viewmat_rs,
                                     width, height)

    xd = (px_xy[..., 0] - K[0, 2]) / K[0, 0]
    yd = (px_xy[..., 1] - K[1, 2]) / K[1, 1]
    xy = jnp.stack([xd, yd], -1)

    if camera_model == FISHEYE:
        rd = jnp.linalg.norm(xy, axis=-1)
        theta = _invert_fisheye_theta(rd, radial)
        s = jnp.where(rd > 1e-8, jnp.sin(theta) / jnp.maximum(rd, 1e-8), 1.0)
        dirs_c = jnp.stack([xy[..., 0] * s, xy[..., 1] * s,
                            jnp.cos(theta)], -1)
    else:
        if radial is not None or tangential is not None:
            xy = undistort_opencv(
                xy, radial if radial is not None else jnp.zeros((1,)),
                tangential)
        dirs_c = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], -1)
        dirs_c = dirs_c / jnp.linalg.norm(dirs_c, axis=-1, keepdims=True)

    return _camera_rays_to_world(dirs_c, px_xy, viewmat, rs, rolling_shutter,
                                 viewmat_rs, width, height)


def _camera_rays_to_world(dirs_c, px_xy, viewmat, rs, rolling_shutter,
                          viewmat_rs, width, height):
    """Camera-frame unit rays -> (origin, world dirs); per-pixel shutter pose
    when `rs` (reference Cameras.cuh:262-273 camera_ray_to_world_ray)."""
    if not rs:
        R = viewmat[:3, :3]
        t = viewmat[:3, 3]
        origin = -jnp.einsum("ij,i->j", R, t, precision="highest")
        dirs_w = jnp.einsum("ij,...i->...j", R, dirs_c, precision="highest")
        return origin, dirs_w
    q0, t0 = _viewmat_pose(viewmat)
    q1, t1 = _viewmat_pose(viewmat_rs)
    tr = shutter_relative_time(px_xy, width, height, rolling_shutter)
    q = _quat_slerp(q0, q1, tr)                                 # (..., 4)
    t = (1.0 - tr)[..., None] * t0 + tr[..., None] * t1
    q_inv = _quat_conj(q)
    origin = -_quat_rotate(q_inv, t)                            # (..., 3)
    dirs_w = _quat_rotate(q_inv, dirs_c)
    return origin, dirs_w
