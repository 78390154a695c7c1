"""Levenberg-Marquardt bundle adjustment with Schur-complement reduction.

Refines the feed-forward model's camera predictions (BASELINE.json configs
4-5: "pose-graph/BA refinement ... distributed Schur-complement BA"). The
reference repo has no such stage; this is new TPU-first design.

Problem: minimize  sum_{j,s} w_js || pi(K_s, T_s, X_j) - uv_js ||^2
over per-view world->camera poses T_s (SE(3), left-multiplied twist updates)
and landmarks X_j, with fixed intrinsics.

Structure exploited: the Gauss-Newton Hessian is arrow-shaped — camera blocks
B (S x 6x6), landmark blocks C (M x 3x3), coupling E (M x S x 6x3). Landmarks
are eliminated via the Schur complement  S_red = B - E C^-1 E^T  (a dense
(6S x 6S) system, tiny for S <= 64 views), then back-substituted. Everything
is batched einsum — XLA maps the block contractions straight onto the MXU;
there is no per-observation loop anywhere.

Distribution: landmarks are sharded over a mesh axis (each device owns
M/axis_size tracks with their full observation rows). B, the Schur reduction
term, the reduced RHS, and the cost are `psum`-reduced over the axis; the
(replicated) camera solve is duplicated per device; landmark back-substitution
stays local. One collective per LM iteration — the reduced system is
6S x 6S + 6S floats, negligible on ICI.

Observations come from `build_tracks`: stride-sampled pixels become landmarks
(initialized from the world point map), re-observed in other views via
reprojection + the same depth-consistency gate the NVS frustum mask uses
(utils/frustum.py; reference src/models/utils/frustum.py:7-98).
"""

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..utils.rotation import hat, se3_exp


class Tracks(NamedTuple):
    points: jnp.ndarray   # (M, 3) landmark initializations (world)
    uv: jnp.ndarray       # (M, S, 2) pixel observations
    mask: jnp.ndarray     # (M, S) bool: observation present
    weight: jnp.ndarray   # (M, S) confidence weights


def _project(points: jnp.ndarray, w2c: jnp.ndarray, K: jnp.ndarray):
    """points (M,3), w2c (S,4,4), K (S,3,3) -> uv (M,S,2), z (M,S), Xc (M,S,3)."""
    R = w2c[:, :3, :3]
    t = w2c[:, :3, 3]
    Xc = jnp.einsum("sij,mj->msi", R, points) + t[None, :, :]
    z = Xc[..., 2]
    zs = jnp.maximum(z, 1e-6)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cx, cy = K[:, 0, 2], K[:, 1, 2]
    u = fx[None] * Xc[..., 0] / zs + cx[None]
    v = fy[None] * Xc[..., 1] / zs + cy[None]
    return jnp.stack([u, v], -1), z, Xc


def reprojection_cost(points, w2c, K, tracks: Tracks) -> jnp.ndarray:
    uv, z, _ = _project(points, w2c, K)
    w = tracks.weight * tracks.mask * (z > 1e-6)
    r = uv - tracks.uv
    return jnp.sum(w * jnp.sum(r * r, -1))


def _gn_system(points, w2c, K, tracks: Tracks):
    """Build residuals + Jacobians, batched over (M, S).

    Returns (r (M,S,2), Jc (M,S,2,6), Jp (M,S,2,3), w (M,S)).
    Twist convention: T <- exp([omega, upsilon]) T, so
    dXc/domega = -[Xc]x, dXc/dupsilon = I.
    """
    uv, z, Xc = _project(points, w2c, K)
    w = (tracks.weight * tracks.mask * (z > 1e-6)).astype(points.dtype)
    r = uv - tracks.uv  # (M, S, 2)

    zs = jnp.maximum(z, 1e-6)
    fx, fy = K[:, 0, 0][None], K[:, 1, 1][None]  # (1, S)
    zero = jnp.zeros_like(zs)
    # dpi/dXc: (M, S, 2, 3)
    dpi = jnp.stack([
        jnp.stack([fx / zs, zero, -fx * Xc[..., 0] / zs ** 2], -1),
        jnp.stack([zero, fy / zs, -fy * Xc[..., 1] / zs ** 2], -1),
    ], -2)
    # camera jacobian: dXc/ddelta = [-[Xc]x | I]  -> (M, S, 3, 6)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), Xc.shape + (3,))
    dXc = jnp.concatenate([-hat(Xc), eye], -1)
    Jc = jnp.einsum("msai,msij->msaj", dpi, dXc)           # (M, S, 2, 6)
    Jp = jnp.einsum("msai,sij->msaj", dpi, w2c[:, :3, :3])  # (M, S, 2, 3)
    return r, Jc, Jp, w


def _schur_step(points, w2c, K, tracks: Tracks, lam, axis_name: Optional[str],
                fix_first: bool = True):
    """One damped GN step via Schur complement. Returns (new_w2c, new_points).

    fix_first pins camera 0 (no update) — frame 0 is the world anchor
    throughout the pipeline, and removing those 6 dof from the reduced solve
    kills most of the gauge null-space that otherwise makes the f32 solve
    swing along global-similarity directions.
    """
    M, S = tracks.mask.shape
    r, Jc, Jp, w = _gn_system(points, w2c, K, tracks)

    wJc = w[..., None, None] * Jc
    wJp = w[..., None, None] * Jp
    B = jnp.einsum("msai,msaj->sij", wJc, Jc)      # (S, 6, 6)
    b = -jnp.einsum("msai,msa->si", wJc, r)        # (S, 6)
    C = jnp.einsum("msai,msaj->mij", wJp, Jp)      # (M, 3, 3)
    c = -jnp.einsum("msai,msa->mi", wJp, r)        # (M, 3)
    E = jnp.einsum("msai,msaj->msij", wJc, Jp)     # (M, S, 6, 3)

    # LM damping (additive; multiplicative diag damping is less stable when a
    # landmark row is nearly unobserved).
    C = C + lam * jnp.eye(3, dtype=points.dtype)
    Cinv = jnp.linalg.inv(C)

    ECE = jnp.einsum("msij,mjk,mtlk->sitl", E, Cinv, E)    # (S,6,S,6)
    ECc = jnp.einsum("msij,mjk,mk->si", E, Cinv, c)        # (S, 6)
    if axis_name is not None:
        B = lax.psum(B, axis_name)
        b = lax.psum(b, axis_name)
        ECE = lax.psum(ECE, axis_name)
        ECc = lax.psum(ECc, axis_name)

    # block-diag(B) as a dense (S,6,S,6) without a python loop:
    Bd = jnp.zeros((S, 6, S, 6), points.dtype)
    Bd = Bd.at[jnp.arange(S), :, jnp.arange(S), :].set(B)
    A4 = Bd - ECE
    rhs2 = b - ECc
    if fix_first:
        A4, rhs2 = A4[1:, :, 1:, :], rhs2[1:]
    s_eff = A4.shape[0]
    n = s_eff * 6
    A = A4.reshape(n, n) + lam * jnp.eye(n, dtype=points.dtype)
    d_cam = jnp.linalg.solve(A, rhs2.reshape(n)).reshape(s_eff, 6)
    if fix_first:
        d_cam = jnp.concatenate([jnp.zeros((1, 6), points.dtype), d_cam], 0)

    # back-substitute landmarks: d_p = Cinv (c - E^T d_cam)
    Etd = jnp.einsum("msij,si->mj", E, d_cam)
    d_p = jnp.einsum("mjk,mk->mj", Cinv, c - Etd)

    new_w2c = se3_exp(d_cam) @ w2c
    new_points = points + d_p
    return new_w2c, new_points


def _ba_loop(w2c, K, points, uv, mask, weight, iters: int, init_lambda: float,
             axis_name: Optional[str] = None):
    tracks = Tracks(points, uv, mask, weight)

    def cost_of(pts, poses):
        c = reprojection_cost(pts, poses, K, tracks)
        if axis_name is not None:
            c = lax.psum(c, axis_name)
        return c

    def body(carry, _):
        poses, pts, lam, cost = carry
        new_poses, new_pts = _schur_step(pts, poses, K, tracks, lam, axis_name)
        new_cost = cost_of(new_pts, new_poses)
        accept = new_cost < cost
        poses = jnp.where(accept, new_poses, poses)
        pts = jnp.where(accept, new_pts, pts)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        return (poses, pts, lam, cost), cost

    lam0 = jnp.asarray(init_lambda, points.dtype)
    cost0 = cost_of(points, w2c)
    (poses, pts, _, cost), _ = lax.scan(
        body, (w2c, points, lam0, cost0), None, length=iters)
    return poses, pts, cost0, cost


def bundle_adjust(w2c: jnp.ndarray, K: jnp.ndarray, tracks: Tracks,
                  iters: int = 12, init_lambda: float = 1e-3,
                  mesh: Optional[Mesh] = None, point_axis: str = "view"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LM bundle adjustment. Returns (w2c', points', cost0, cost).

    Args:
      w2c: (S, 4, 4) world->camera poses (refined in place of prediction).
      K: (S, 3, 3) intrinsics (fixed).
      tracks: observation bundle (see Tracks). M must be divisible by the
        mesh axis size when `mesh` is given.
      mesh: optional device mesh — landmarks shard over `point_axis`; the
        reduced camera system is psum-reduced (one collective per iteration).
    """
    if mesh is None or mesh.shape.get(point_axis, 1) == 1:
        return _ba_loop(w2c, K, tracks.points, tracks.uv, tracks.mask,
                        tracks.weight, iters, init_lambda)

    pspec = P(point_axis)
    inner = shard_map(
        partial(_ba_loop, iters=iters, init_lambda=init_lambda,
                axis_name=point_axis),
        mesh=mesh,
        in_specs=(P(), P(), pspec, pspec, pspec, pspec),
        out_specs=(P(), pspec, P(), P()),
        check_vma=False)
    return inner(w2c, K, tracks.points, tracks.uv, tracks.mask, tracks.weight)


def build_tracks(pts3d: jnp.ndarray, conf: jnp.ndarray, depth: jnp.ndarray,
                 w2c: jnp.ndarray, K: jnp.ndarray,
                 stride: int = 16, depth_tol: float = 0.05,
                 pad_to: Optional[int] = None) -> Tracks:
    """Data association from feed-forward predictions (single scene).

    Every `stride`-th pixel of every view becomes a landmark (world position
    from that view's point map); it is re-observed in view t if its
    reprojection lands in-bounds AND view t's own depth map agrees within
    `depth_tol` (relative) — the frustum-mask gate. The observation pixel is
    the reprojection under the initial cameras; the landmark init is the
    *mean* of the agreeing views' unprojections, so the initial bundle is
    inconsistent exactly where the per-view geometry disagrees — that
    disagreement is the signal BA minimizes.

    Args:
      pts3d: (S, H, W, 3) world point maps. conf: (S, H, W). depth: (S, H, W).
      w2c: (S, 4, 4). K: (S, 3, 3).
    Returns a Tracks with M = S * ceil(H/stride) * ceil(W/stride) landmarks
    (padded/truncated to `pad_to` if given — sharding needs divisibility).
    """
    from ..utils.frustum import bilinear_sample

    S, H, W, _ = pts3d.shape
    ys = jnp.arange(0, H, stride)
    xs = jnp.arange(0, W, stride)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gy, gx = gy.reshape(-1), gx.reshape(-1)
    m_per = gy.shape[0]

    X = pts3d[:, gy, gx].reshape(S * m_per, 3)            # (M, 3)
    w_src = conf[:, gy, gx].reshape(S * m_per)            # (M,)
    src_view = jnp.repeat(jnp.arange(S), m_per)           # (M,)

    uv, z, _ = _project(X, w2c, K)                         # (M, S, 2), (M, S)
    u, v = uv[..., 0], uv[..., 1]
    inb = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1) & (z > 1e-6)

    # sample each view's own depth at the reprojection; bilinear_sample takes
    # (H, W, C) images and (N, 2) uv.
    d_at = jax.vmap(lambda dm, uvs: bilinear_sample(dm[..., None], uvs)[..., 0],
                    in_axes=(0, 1), out_axes=1)(depth, uv)  # (M, S)
    agree = jnp.abs(d_at - z) < depth_tol * jnp.maximum(z, 1e-6)
    mask = inb & agree
    # the generating view always observes its own landmark
    own = jax.nn.one_hot(src_view, S, dtype=bool)
    mask = mask | own

    # Landmark init: consensus over agreeing views. Each agreeing view t
    # believes the landmark sits at depth d_at along the same ray; re-scale
    # the camera-space point to that depth and unproject back to world, then
    # average. Where per-view geometry disagrees, this mean matches no single
    # view exactly — that residual is the BA signal.
    uvh = jnp.stack([u, v, jnp.ones_like(u)], -1)              # (M, S, 3)
    rays_c = jnp.einsum("sij,msj->msi", jnp.linalg.inv(K), uvh)
    Yc = rays_c * d_at[..., None]                               # (M, S, 3)
    Rt = jnp.swapaxes(w2c[:, :3, :3], -1, -2)
    Yw = jnp.einsum("sij,msj->msi", Rt, Yc - w2c[None, :, :3, 3])
    mw = mask[..., None].astype(X.dtype)
    consensus = (Yw * mw).sum(1) / jnp.maximum(mw.sum(1), 1e-6)

    n_obs = mask.sum(-1)
    keep = n_obs >= 2  # landmarks seen once constrain nothing
    X = jnp.where(keep[:, None], consensus, X)
    weight = mask * w_src[:, None]
    weight = weight * keep[:, None]
    mask = mask & keep[:, None]

    tracks = Tracks(points=X, uv=uv, mask=mask, weight=weight.astype(jnp.float32))
    if pad_to is not None:
        M = tracks.points.shape[0]
        if pad_to < M:
            tracks = Tracks(*[t[:pad_to] for t in tracks])
        elif pad_to > M:
            pad = pad_to - M
            tracks = Tracks(
                points=jnp.pad(tracks.points, ((0, pad), (0, 0))),
                uv=jnp.pad(tracks.uv, ((0, pad), (0, 0), (0, 0))),
                mask=jnp.pad(tracks.mask, ((0, pad), (0, 0))),
                weight=jnp.pad(tracks.weight, ((0, pad), (0, 0))))
    return tracks


def refine_cameras(predictions: Dict[str, jnp.ndarray],
                   stride: int = 16, iters: int = 12,
                   mesh: Optional[Mesh] = None) -> Dict[str, jnp.ndarray]:
    """Pipeline glue: BA-refine a prediction dict (batch element 0).

    Consumes pts3d/pts3d_conf/depth/camera_poses/camera_intrs, returns the
    dict with camera_poses (c2w) replaced by the refined ones plus
    'ba_cost0'/'ba_cost' diagnostics.
    """
    from ..utils.camera import se3_inverse

    pts3d = predictions["pts3d"][0]
    conf = predictions["pts3d_conf"][0]
    depth = predictions["depth"][0, ..., 0]
    c2w = predictions["camera_poses"][0]
    K = predictions["camera_intrs"][0]
    w2c = se3_inverse(c2w)

    pad_to = None
    if mesh is not None:
        ax = mesh.shape.get("view", 1)
        S, H, W, _ = pts3d.shape
        m = S * ((H + stride - 1) // stride) * ((W + stride - 1) // stride)
        pad_to = ((m + ax - 1) // ax) * ax

    tracks = build_tracks(pts3d, conf, depth, w2c, K, stride=stride,
                          pad_to=pad_to)
    w2c_ref, _, cost0, cost = bundle_adjust(w2c, K, tracks, iters=iters,
                                            mesh=mesh)
    out = dict(predictions)
    out["camera_poses"] = se3_inverse(w2c_ref)[None]
    out["ba_cost0"] = cost0
    out["ba_cost"] = cost
    return out
