"""Registration support utilities (keypoints, graphs, filters, cost volumes).

Capability parity with the non-MIND parts of `deep_staple/mindssc.py`
(:20-247): normalized<->world keypoint/flow conversions, random keypoint
sampling, kNN graphs, separable 1D filtering, Gaussian/mean smoothing,
pairwise distances, SSD cost volumes over displacement search windows, and
min-convolutions for message passing — the toolbox for deeds/convex-style
discrete registration that produced the reference's atlas label artifacts.

JAX throughout; the SSD cost volume's correlation rides `conv_general_dilated`
on the MXU instead of the reference's grouped conv trick.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .grid_sample import grid_sample_3d


def _whd(shape, dtype=jnp.float32):
    D, H, W = shape
    return jnp.asarray([W, H, D], dtype)


def kpts_pt(kpts_world, shape, align_corners=None):
    """World (z,y,x)-ordered voxel coords -> normalized (x,y,z) in [-1,1]
    (reference :20-29)."""
    s = _whd(shape)
    out = (jnp.flip(kpts_world, -1) / (s - 1)) * 2 - 1
    if not align_corners:
        out = out * (s - 1) / s
    return out


def kpts_world(kpts_pt_, shape, align_corners=None):
    s = _whd(shape)
    k = kpts_pt_
    if not align_corners:
        k = k / ((s - 1) / s)
    return jnp.flip(((k + 1) / 2) * (s - 1), -1)


def flow_pt(flow_world, shape, align_corners=None):
    s = _whd(shape)
    out = (jnp.flip(flow_world, -1) / (s - 1)) * 2
    if not align_corners:
        out = out * (s - 1) / s
    return out


def flow_world(flow_pt_, shape, align_corners=None):
    s = _whd(shape)
    f = flow_pt_
    if not align_corners:
        f = f / ((s - 1) / s)
    return jnp.flip((f / 2) * (s - 1), -1)


def random_kpts(mask, d: int, num_points=None, key=None):
    """Normalized keypoints of nonzero mask voxels on a stride-d grid
    (reference :72-81). Returns (1, N, 3)."""
    _, _, D, H, W = mask.shape
    sub = mask[0, 0, ::d, ::d, ::d]
    kpts = jnp.argwhere(sub > 0).astype(jnp.float32)[None]
    if num_points is not None and key is not None:
        n = kpts.shape[1]
        perm = jax.random.permutation(key, n)[:num_points]
        kpts = kpts[:, perm]
    return kpts_pt(kpts, (D // d, H // d, W // d))


def pdist(x, p: int = 2):
    """Pairwise distances within a point set (B, N, C) (reference :160-168)."""
    if p == 1:
        return jnp.sum(jnp.abs(x[:, :, None] - x[:, None, :]), axis=3)
    xx = jnp.sum(x**2, axis=2)[:, :, None]
    dist = xx + jnp.swapaxes(xx, 1, 2) - 2.0 * jnp.einsum("bnc,bmc->bnm", x, x)
    n = x.shape[1]
    return dist.at[:, jnp.arange(n), jnp.arange(n)].set(0)


def pdist2(x, y, p: int = 2):
    if p == 1:
        return jnp.sum(jnp.abs(x[:, :, None] - y[:, None, :]), axis=3)
    xx = jnp.sum(x**2, axis=2)[:, :, None]
    yy = jnp.sum(y**2, axis=2)[:, None, :]
    return xx + yy - 2.0 * jnp.einsum("bnc,bmc->bnm", x, y)


def knn_graph(kpts, k: int, include_self: bool = False):
    """(indices, masked distances, adjacency) of the kNN graph (reference :85-95)."""
    B, N, _ = kpts.shape
    dist = pdist(kpts)
    k_eff = k + (1 - int(include_self))
    _, ind = jax.lax.top_k(-dist, k_eff)
    ind = ind[:, :, 1 - int(include_self) :]
    A = jnp.zeros((B, N, N))
    rows = jnp.repeat(jnp.arange(N), ind.shape[2])
    cols = ind.reshape(B, -1)
    A = A.at[:, rows, cols[0]].set(1.0)
    A = A.at[:, cols[0], rows].set(1.0)
    return ind, dist * A, A


def lbp_graph(kpts_fixed, k: int):
    """Edge list + reverse-edge index for loopy belief propagation (reference :99-108)."""
    A = knn_graph(kpts_fixed, k, include_self=False)[2][0]
    edges = jnp.argwhere(A > 0)
    n = A.shape[0]
    edge_idx = jnp.zeros((n, n), jnp.int32).at[edges[:, 0], edges[:, 1]].set(
        jnp.arange(edges.shape[0], dtype=jnp.int32)
    )
    reverse_idx = edge_idx[edges[:, 1], edges[:, 0]]
    return edges, reverse_idx


def filter1d(img, weight, dim: int, padding_mode: str = "replicate"):
    """Separable 1D conv along spatial dim of (B, C, D, H, W) (reference :113-125)."""
    n = weight.shape[0]
    pad = n // 2
    axis = dim + 2
    if padding_mode == "replicate":
        first = jnp.take(img, jnp.zeros(pad, jnp.int32), axis=axis)
        last = jnp.take(img, jnp.full(pad, img.shape[axis] - 1, jnp.int32), axis=axis)
        img = jnp.concatenate([first, img, last], axis=axis)
    else:
        cfg = [(0, 0)] * img.ndim
        cfg[axis] = (pad, pad)
        img = jnp.pad(img, cfg)
    out = 0.0
    L = img.shape[axis] - 2 * pad
    for i in range(n):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + L)
        out = out + weight[i] * img[tuple(sl)]
    return out


def smooth(img, sigma: float):
    """Gaussian smoothing (reference :129-142)."""
    n = int(math.ceil(sigma * 3.0 / 2.0)) * 2 + 1
    xs = np.linspace(-(n // 2), n // 2, n)
    w = np.exp(-(xs**2) / (2 * sigma**2))
    w = jnp.asarray((w / w.sum()).astype(np.float32))
    for dim in (0, 1, 2):
        img = filter1d(img, w, dim)
    return img


def mean_filter(img, r: int):
    w = jnp.full((2 * r + 1,), 1.0 / (2 * r + 1), jnp.float32)
    for dim in (0, 1, 2):
        img = filter1d(img, w, dim)
    return img


def ssd_cost_volume(kpts_fixed, feat_fixed, feat_moving, orig_shape,
                    disp_radius: int = 16, disp_step: int = 2, patch_radius: int = 3):
    """SSD cost volume over a displacement search window per keypoint
    (reference :183-221). Returns (1, N, w, w, w), w = 2*disp_radius + 1.

    Formulation: for each keypoint, sample a fixed patch P and a moving search
    window S; cost(d) = sum_patch (P - S_d)^2 = -2<P,S_d> + |P|^2 + |S_d|^2.
    The correlation term is one batched conv (MXU)."""
    D, H, W = orig_shape
    C = feat_fixed.shape[1]
    N = kpts_fixed.shape[1]
    step = disp_step

    patch_r = patch_radius // step  # patch half-size in step units
    pw = 2 * patch_r + 1
    dw = 2 * disp_radius + 1
    sw = dw + 2 * patch_r  # search window incl. patch margin

    offs = jnp.arange(-(disp_radius + patch_r), disp_radius + patch_r + 1) * step
    oz, oy, ox = jnp.meshgrid(offs, offs, offs, indexing="ij")
    win = jnp.stack([oz, oy, ox], -1).reshape(-1, 3).astype(jnp.float32)
    win_pt = flow_pt(win, (D, H, W), align_corners=True).reshape(1, 1, -1, 1, 3)

    poffs = jnp.arange(-patch_r, patch_r + 1) * step
    pz, py, px = jnp.meshgrid(poffs, poffs, poffs, indexing="ij")
    patch = jnp.stack([pz, py, px], -1).reshape(-1, 3).astype(jnp.float32)
    patch_pt = flow_pt(patch, (D, H, W), align_corners=True).reshape(1, 1, -1, 1, 3)

    base = kpts_fixed.reshape(1, -1, 1, 1, 3)
    f_patch = grid_sample_3d(
        feat_fixed, base + patch_pt, padding_mode="border", align_corners=True
    ).reshape(C, N, pw, pw, pw)
    f_win = grid_sample_3d(
        feat_moving, base + win_pt, padding_mode="border", align_corners=True
    ).reshape(C, N, sw, sw, sw)

    # correlation <P, S_d>: conv of windows with per-(keypoint, channel) patch
    lhs = f_win.reshape(1, C * N, sw, sw, sw)
    rhs = f_patch.reshape(C * N, 1, pw, pw, pw)
    corr = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1, 1), "VALID", feature_group_count=C * N,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    ).reshape(C, N, dw, dw, dw)

    patch_sq = jnp.sum(f_patch**2, axis=(2, 3, 4)).reshape(C, N, 1, 1, 1)
    ones = jnp.ones((1, 1, pw, pw, pw), jnp.float32)
    win_sq = jax.lax.conv_general_dilated(
        (f_win**2).reshape(C * N, 1, sw, sw, sw), ones, (1, 1, 1), "VALID",
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    ).reshape(C, N, dw, dw, dw)

    cost = jnp.sum(-2 * corr + patch_sq + win_sq, axis=0)[None]
    return cost / (pw**3)


def minconv(cost):
    """Separable min-convolution with quadratic regularizer (reference :227-240).
    cost: (..., w, w, w)."""
    w = cost.shape[-1]
    disp1d = jnp.linspace(-(w // 2), w // 2, w)
    reg = (disp1d[None, :] - disp1d[:, None]) ** 2

    out = jnp.min(cost.reshape(-1, w, 1, w, w) + reg.reshape(1, w, w, 1, 1), axis=1)
    out = jnp.min(out.reshape(-1, w, w, 1, w) + reg.reshape(1, 1, w, w, 1), axis=2)
    out = jnp.min(out.reshape(-1, w, w, w, 1) + reg.reshape(1, 1, 1, w, w), axis=3)
    out = out - jnp.min(out.reshape(-1, w**3), axis=1).reshape(-1, 1, 1, 1)
    return out.reshape(cost.shape)


def sparse_minconv(multi_data_cost, candidates_edges0, candidates_edges1):
    """Sparse min-conv over candidate displacement sets (reference :244-246)."""
    diff = candidates_edges0[:, None, :, :] - candidates_edges1[:, :, None, :]
    return jnp.min(multi_data_cost[:, None, :] + jnp.sum(diff**2, axis=3), axis=2)


# ---------------------------------------------------------------------------
# Continuous affine registration (first-party replacement for the reference's
# BRAINSResample registration step, data_conversion.py:210-234).
# ---------------------------------------------------------------------------


def _normalized_affine_grid(mat, trans, out_shape):
    """Grid (1, D, H, W, 3) of normalized (x, y, z) sample coords for
    grid_sample_3d (align_corners=False): n_mov = mat @ n_fix + trans in
    (x, y, z) == (W, H, D) axis order."""
    D, H, W = out_shape
    zs = (2.0 * jnp.arange(D, dtype=jnp.float32) + 1.0) / D - 1.0
    ys = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    xs = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    gz, gy, gx = jnp.meshgrid(zs, ys, xs, indexing="ij")
    base = jnp.stack([gx, gy, gz], axis=-1)  # (D, H, W, 3) in (x, y, z)
    warped = jnp.einsum("dhwj,ij->dhwi", base, mat) + trans
    return warped[None]


def _resample_normalized(vol, mat, trans, out_shape, mode="bilinear"):
    grid = _normalized_affine_grid(mat, trans, out_shape)
    out = grid_sample_3d(vol[None, None], grid, mode=mode, padding_mode="border",
                         align_corners=False)
    return out[0, 0]


def _znorm(v):
    v = v.astype(jnp.float32)
    return (v - jnp.mean(v)) / (jnp.std(v) + 1e-6)


def affine_register(fixed, moving, scales=(4, 2, 1), iters=(120, 80, 40),
                    lr: float = 0.03) -> np.ndarray:
    """Estimate the affine map from FIXED voxel indices to MOVING voxel
    indices by multi-resolution SSD gradient descent.

    First-party equivalent of the registration the reference consumes as
    pre-computed `.tfm` files (`data_conversion.py:491-516` — the TCIA
    dataset ships `inv_T1_LPS_to_T2_LPS.tfm` per case; this estimator covers
    datasets that don't). Parameterizes the map in align_corners=False
    normalized coordinates (invariant under resampling, so the SAME
    parameters are optimized at every pyramid scale), optimizes
    z-normalized-intensity SSD with Adam via jax.grad through the trilinear
    sampler, and returns a (4, 4) homogeneous matrix in (i, j, k) == (D, H, W)
    voxel-index convention: ``v_mov = M @ v_fix``.

    fixed/moving: (D, H, W) float arrays (need not be the same shape).
    """
    import optax

    from .resample import resize_nd

    fixed = _znorm(jnp.asarray(fixed))
    moving = _znorm(jnp.asarray(moving))

    params = {
        "mat": jnp.eye(3, dtype=jnp.float32),
        "trans": jnp.zeros((3,), jnp.float32),
    }

    for scale, n_it in zip(scales, iters):
        f_s = resize_nd(fixed, tuple(max(1, s // scale) for s in fixed.shape),
                        mode="linear") if scale > 1 else fixed
        m_s = resize_nd(moving, tuple(max(1, s // scale) for s in moving.shape),
                        mode="linear") if scale > 1 else moving

        def loss_fn(p, f_s=f_s, m_s=m_s):
            warped = _resample_normalized(m_s, p["mat"], p["trans"], f_s.shape)
            return jnp.mean((warped - f_s) ** 2)

        tx = optax.adam(lr)
        opt_state = tx.init(params)

        @jax.jit
        def step(carry, _):
            p, s = carry
            g = jax.grad(loss_fn)(p)
            updates, s = tx.update(g, s, p)
            return (optax.apply_updates(p, updates), s), None

        (params, _), _ = jax.lax.scan(step, (params, opt_state), None, length=n_it)

    # Normalized (x,y,z) map -> voxel (i,j,k) map. n = diag(2/s) v + (1/s - 1)
    # per axis, with (x,y,z) = (W,H,D): build N_fix / N_mov and conjugate.
    def _n(shape):  # voxel (i,j,k) -> normalized (x,y,z) homogeneous
        D, H, W = shape
        n = np.zeros((4, 4), np.float64)
        n[0, 2], n[0, 3] = 2.0 / W, 1.0 / W - 1.0
        n[1, 1], n[1, 3] = 2.0 / H, 1.0 / H - 1.0
        n[2, 0], n[2, 3] = 2.0 / D, 1.0 / D - 1.0
        n[3, 3] = 1.0
        return n

    A = np.eye(4)
    A[:3, :3] = np.asarray(params["mat"], np.float64)
    A[:3, 3] = np.asarray(params["trans"], np.float64)
    return np.linalg.inv(_n(moving.shape)) @ A @ _n(fixed.shape)
