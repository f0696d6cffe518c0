"""Inverse / forward linear blend skinning against a motion weight volume.

TPU-first reformulation of the reference's per-bone python loops
(ref: 2nd_State_Conditional_Human-Object/core/nets/human_nerf/network.py:
302-396).

Two formulations, numerically identical (<=4e-7, tests):

* ONE-HOT MATMUL (default): the trilinear volume lookup is factorized as
  an xy-bilinear one-hot row matrix [N, H*W] (4 weighted taps, built with
  a lane-iota compare — no gather) matmul'd against the bone's volume
  [H*W, D], then a 2-tap z interpolation. This moves the lookup onto the
  MXU. Fetch-forced v5e timing at production size (262144 samples x 26
  bones x 32^3): forward 92 ms / grad 152 ms, vs the gather form's
  466 / 416 ms — 5.0x / 2.7x. (Round-1 recorded 76 vs 442 ms; those were
  deferred-execution artifacts of the relay — see utils/benchtools.py.)
  Each bone's weight computation is `jax.checkpoint`ed so the [N, H*W]
  one-hot rows are rebuilt in backward instead of saved (26 x 1 GB
  residuals otherwise). XLA still materializes the one-hot rows in HBM
  (~80% of the runtime is that traffic); ops/pallas/lbs.py builds them
  in VMEM instead and is the production TPU path.

* GATHER (`*_gather` variants, kept for A/B and CPU tests): 8 corner
  gathers from the flattened volume per bone.

Layout note (v5e): materializing per-point weights as [N, 26] puts the
bone axis on the 128-lane dimension and pads 26 -> 128 (4.9x memory blowup,
observed in XLA memory dumps). Both forms therefore run a STATIC loop over
bones with [N]-shaped accumulators — every intermediate is (8,128)-tileable
with no padding waste — and never materialize the [N, B] weight matrix on
the backward-critical path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from hosnerf_tpu.ops import grid_sample

_PREC = jax.lax.Precision.HIGHEST


def normalize_coords(pos: jnp.ndarray, cnl_bbox_min_xyz: jnp.ndarray,
                     cnl_bbox_scale_xyz: jnp.ndarray) -> jnp.ndarray:
    """World -> [-1, 1] volume coords (ref: network.py:319-320)."""
    return (pos - cnl_bbox_min_xyz) * cnl_bbox_scale_xyz - 1.0


def _trilinear_taps(coords: jnp.ndarray, D: int, H: int, W: int):
    """Shared trilinear tap setup: returns per-corner (lin_index [N],
    weight [N]) pairs for 8 corners, zeros-padding masked."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx, ty, tz = fx - x0, fy - y0, fz - z0

    taps = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                cx, cy, cz = x0 + dx, y0 + dy, z0 + dz
                w = (jnp.where(dx, tx, 1.0 - tx)
                     * jnp.where(dy, ty, 1.0 - ty)
                     * jnp.where(dz, tz, 1.0 - tz))
                valid = ((cx >= 0) & (cx <= W - 1) & (cy >= 0)
                         & (cy <= H - 1) & (cz >= 0) & (cz <= D - 1))
                ix = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                iy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
                iz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
                taps.append(((iz * H + iy) * W + ix, w * valid))
    return taps


def _sample_channel(vol_flat_b: jnp.ndarray, taps) -> jnp.ndarray:
    """Trilinear sample of ONE channel given precomputed taps -> [N]."""
    out = None
    for lin, w in taps:
        contrib = w * vol_flat_b[lin]
        out = contrib if out is None else out + contrib
    return out


def _onehot_taps(coords: jnp.ndarray, D: int, H: int, W: int):
    """Factorized trilinear taps: xy-bilinear one-hot rows [N, H*W]
    (4 weighted taps) + z selection rows [N, D] (2 weighted taps), built
    with lane-iota compares (no gather). Out-of-bounds taps masked to 0
    exactly like `_trilinear_taps` (torch grid_sample zeros padding)."""
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]
    fx = (x + 1.0) * 0.5 * (W - 1)
    fy = (y + 1.0) * 0.5 * (H - 1)
    fz = (z + 1.0) * 0.5 * (D - 1)
    x0, y0, z0 = jnp.floor(fx), jnp.floor(fy), jnp.floor(fz)
    tx, ty, tz = fx - x0, fy - y0, fz - z0

    n = coords.shape[0]
    hw_iota = jax.lax.broadcasted_iota(jnp.int32, (1, H * W), 1)
    onehot_xy = jnp.zeros((n, H * W), coords.dtype)
    for dx in (0, 1):
        for dy in (0, 1):
            cx, cy = x0 + dx, y0 + dy
            w = jnp.where(dx, tx, 1.0 - tx) * jnp.where(dy, ty, 1.0 - ty)
            valid = ((cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1))
            idx = (jnp.clip(cy, 0, H - 1).astype(jnp.int32) * W
                   + jnp.clip(cx, 0, W - 1).astype(jnp.int32))
            onehot_xy = onehot_xy + (w * valid)[:, None] * (
                idx[:, None] == hw_iota)

    d_iota = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1)
    zsel = jnp.zeros((n, D), coords.dtype)
    for dz in (0, 1):
        cz = z0 + dz
        w = jnp.where(dz, tz, 1.0 - tz)
        valid = (cz >= 0) & (cz <= D - 1)
        iz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
        zsel = zsel + (w * valid)[:, None] * (iz[:, None] == d_iota)
    return onehot_xy, zsel


@functools.partial(jax.checkpoint, static_argnums=())
def _bone_weight_onehot(pos_b, vol_b_hw_d, cnl_bbox_min_xyz,
                        cnl_bbox_scale_xyz):
    """Trilinear motion weight of ONE bone at [N, 3] observation points,
    via the MXU one-hot matmul. vol_b_hw_d: [H*W, D]. Rematerialized in
    backward (the [N, H*W] rows are cheap to rebuild, expensive to keep)."""
    D = vol_b_hw_d.shape[-1]
    HW = vol_b_hw_d.shape[0]
    # infer H == W == G for the cubic volumes used here
    coords = normalize_coords(pos_b, cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    G = int(round(HW ** 0.5))
    onehot_xy, zsel = _onehot_taps(coords, D, G, G)
    zcols = jnp.matmul(onehot_xy, vol_b_hw_d, precision=_PREC)  # [N, D]
    return jnp.sum(zcols * zsel, axis=-1)


def inverse_lbs(pts: jnp.ndarray, motion_scale_Rs: jnp.ndarray,
                motion_Ts: jnp.ndarray, motion_weights_vol: jnp.ndarray,
                cnl_bbox_min_xyz: jnp.ndarray,
                cnl_bbox_scale_xyz: jnp.ndarray):
    """Warp observation points to canonical space (one-hot-matmul form).

    pts [N, 3]; motion_scale_Rs [B, 3, 3]; motion_Ts [B, 3];
    motion_weights_vol [B+1, D, H, W] (bg channel dropped, network.py:314).
    Returns x_skel [N, 3], fg_likelihood_mask [N, 1], weights [B, N].
    """
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    assert H == W, "one-hot LBS assumes square xy slices; use *_gather"
    # channel b as [H*W, D]: xy flattened on the contraction axis
    vol_hw_d = motion_weights_vol[:B].reshape(B, D, H * W).transpose(0, 2, 1)

    wsum = jnp.zeros(pts.shape[0], pts.dtype)
    acc = jnp.zeros_like(pts)
    weights = []
    for b in range(B):  # static loop: [N]-shaped ops only; no [B, N, 3]
        pos_b = jnp.matmul(pts, motion_scale_Rs[b].T,
                           precision=_PREC) + motion_Ts[b]
        w_b = _bone_weight_onehot(pos_b, vol_hw_d[b], cnl_bbox_min_xyz,
                                  cnl_bbox_scale_xyz)
        weights.append(w_b)
        wsum = wsum + w_b
        acc = acc + w_b[:, None] * pos_b

    x_skel = acc / jnp.maximum(wsum, 1e-4)[:, None]
    return x_skel, wsum[:, None], jnp.stack(weights, 0)


def inverse_lbs_gather(pts: jnp.ndarray, motion_scale_Rs: jnp.ndarray,
                       motion_Ts: jnp.ndarray,
                       motion_weights_vol: jnp.ndarray,
                       cnl_bbox_min_xyz: jnp.ndarray,
                       cnl_bbox_scale_xyz: jnp.ndarray):
    """Gather-form inverse LBS (8 corner gathers per bone); kept for A/B
    and non-square volumes."""
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    vol_flat = motion_weights_vol.reshape(B + 1, -1)

    wsum = jnp.zeros(pts.shape[0], pts.dtype)
    acc = jnp.zeros_like(pts)
    weights = []
    for b in range(B):
        # giant intermediate (1.6 GB at 4M points in XLA dumps)
        pos_b = jnp.matmul(pts, motion_scale_Rs[b].T,
                           precision=_PREC) + motion_Ts[b]
        coords_b = normalize_coords(pos_b, cnl_bbox_min_xyz,
                                    cnl_bbox_scale_xyz)
        taps = _trilinear_taps(coords_b, D, H, W)
        w_b = _sample_channel(vol_flat[b], taps)
        weights.append(w_b)
        wsum = wsum + w_b
        acc = acc + w_b[:, None] * pos_b

    x_skel = acc / jnp.maximum(wsum, 1e-4)[:, None]
    return x_skel, wsum[:, None], jnp.stack(weights, 0)


@functools.partial(jax.checkpoint, static_argnums=())
def _all_bone_weights_onehot(cnl_pts, vol_hw_d, cnl_bbox_min_xyz,
                             cnl_bbox_scale_xyz):
    """Weights of ALL bones at the SAME canonical points (forward LBS
    samples every channel at one position): one one-hot build, B matmuls.
    vol_hw_d [B, H*W, D] -> [B, N]."""
    D = vol_hw_d.shape[-1]
    G = int(round(vol_hw_d.shape[1] ** 0.5))
    coords = normalize_coords(cnl_pts, cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    onehot_xy, zsel = _onehot_taps(coords, D, G, G)
    ws = []
    for b in range(vol_hw_d.shape[0]):
        zcols = jnp.matmul(onehot_xy, vol_hw_d[b], precision=_PREC)
        ws.append(jnp.sum(zcols * zsel, axis=-1))
    return jnp.stack(ws, 0)


def forward_lbs(cnl_pts: jnp.ndarray, motion_scale_Rs_fwd: jnp.ndarray,
                motion_Ts_fwd: jnp.ndarray, motion_weights_vol: jnp.ndarray,
                cnl_bbox_min_xyz: jnp.ndarray,
                cnl_bbox_scale_xyz: jnp.ndarray):
    """Warp canonical points to observation space (cycle/flow branches),
    one-hot-matmul form.

    Weights sampled ONCE at the canonical position for all channels.
    Returns x_deform [N, 3], fg_likelihood_fwd [N, 1].
    ref: network.py:355-396.
    """
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    assert H == W, "one-hot LBS assumes square xy slices; use *_gather"
    vol_hw_d = motion_weights_vol[:B].reshape(B, D, H * W).transpose(0, 2, 1)
    weights = _all_bone_weights_onehot(cnl_pts, vol_hw_d, cnl_bbox_min_xyz,
                                       cnl_bbox_scale_xyz)  # [B, N]

    wsum = jnp.zeros(cnl_pts.shape[0], cnl_pts.dtype)
    acc = jnp.zeros_like(cnl_pts)
    for b in range(B):
        pos_b = jnp.matmul(cnl_pts, motion_scale_Rs_fwd[b].T,
                           precision=_PREC) + motion_Ts_fwd[b]
        wsum = wsum + weights[b]
        acc = acc + weights[b][:, None] * pos_b

    x_deform = acc / jnp.maximum(wsum, 1e-4)[:, None]
    return x_deform, wsum[:, None]


def forward_lbs_gather(cnl_pts: jnp.ndarray,
                       motion_scale_Rs_fwd: jnp.ndarray,
                       motion_Ts_fwd: jnp.ndarray,
                       motion_weights_vol: jnp.ndarray,
                       cnl_bbox_min_xyz: jnp.ndarray,
                       cnl_bbox_scale_xyz: jnp.ndarray):
    """Gather-form forward LBS (kept for A/B and non-square volumes)."""
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    vol_flat = motion_weights_vol.reshape(B + 1, -1)

    coords = normalize_coords(cnl_pts, cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    taps = _trilinear_taps(coords, D, H, W)

    wsum = jnp.zeros(cnl_pts.shape[0], cnl_pts.dtype)
    acc = jnp.zeros_like(cnl_pts)
    for b in range(B):
        w_b = _sample_channel(vol_flat[b], taps)
        pos_b = jnp.matmul(cnl_pts, motion_scale_Rs_fwd[b].T,
                           precision=_PREC) + motion_Ts_fwd[b]
        wsum = wsum + w_b
        acc = acc + w_b[:, None] * pos_b

    x_deform = acc / jnp.maximum(wsum, 1e-4)[:, None]
    return x_deform, wsum[:, None]


# ---------------------------------------------------------------------------
# implementation dispatch (XLA forms above; fused Pallas kernels on TPU)
# ---------------------------------------------------------------------------


def resolve_impl(impl: str, motion_weights_vol) -> str:
    """'auto' -> the right form per backend: 'pallas' on TPU for cubic
    power-of-two volumes, 'xla' (one-hot matmul) for other TPU shapes,
    'gather' off-TPU — CPU/GPU gathers are cheap and the one-hot matmul
    form is a TPU workaround (measured 19x slower than gather on the
    CPU backend at production sizes)."""
    if impl != "auto":
        return impl
    D, H, W = motion_weights_vol.shape[1:]
    if jax.default_backend() == "tpu":
        if D == H == W and D & (D - 1) == 0 and D <= 128:
            return "pallas"
        return "xla"
    return "gather"


def inverse_warp(pts, motion_scale_Rs, motion_Ts, motion_weights_vol,
                 cnl_bbox_min_xyz, cnl_bbox_scale_xyz, impl: str = "auto"):
    """Inverse LBS returning (x_skel [N,3], fg_likelihood_mask [N,1]).

    The per-bone weights output of `inverse_lbs` is dropped — no caller
    uses it (ref network.py:302-353 keeps it only for its own weighted
    sum). impl: 'pallas' (fused kernel, bf16 taps), 'xla' (one-hot
    matmul), 'gather', or 'auto'.
    """
    impl = resolve_impl(impl, motion_weights_vol)
    if impl in ("pallas", "pallas_dense"):
        from hosnerf_tpu.ops.pallas import lbs as plbs
        return plbs.inverse_lbs(pts, motion_scale_Rs, motion_Ts,
                                motion_weights_vol, cnl_bbox_min_xyz,
                                cnl_bbox_scale_xyz,
                                pair_grid=(impl == "pallas"))
    fn = inverse_lbs if impl == "xla" else inverse_lbs_gather
    x_skel, fg, _ = fn(pts, motion_scale_Rs, motion_Ts,
                       motion_weights_vol, cnl_bbox_min_xyz,
                       cnl_bbox_scale_xyz)
    return x_skel, fg


def bone_weights(pts, motion_weights_vol, cnl_bbox_min_xyz,
                 cnl_bbox_scale_xyz, impl: str = "auto") -> jnp.ndarray:
    """All-bone trilinear weights at shared points -> [N, B].

    The forward-LBS sampling pattern (ref network.py:355-396): every
    weight channel sampled at the same canonical point. Computing this
    ONCE and applying different bone transforms (`apply_forward_lbs`)
    serves both the cycle and prev-frame flow branches, which the
    reference evaluates as two full `_sample_motion_fields_forward`
    passes over identical points (network.py:472-535).
    """
    impl = resolve_impl(impl, motion_weights_vol)
    if impl == "pallas":
        from hosnerf_tpu.ops.pallas import lbs as plbs
        return plbs.bone_weights(pts, motion_weights_vol,
                                 cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    B = motion_weights_vol.shape[0] - 1
    D, H, W = motion_weights_vol.shape[1:]
    if impl == "xla" and H == W:
        vol_hw_d = motion_weights_vol[:B].reshape(
            B, D, H * W).transpose(0, 2, 1)
        return _all_bone_weights_onehot(pts, vol_hw_d, cnl_bbox_min_xyz,
                                        cnl_bbox_scale_xyz).T
    vol_flat = motion_weights_vol.reshape(B + 1, -1)
    coords = normalize_coords(pts, cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    taps = _trilinear_taps(coords, D, H, W)
    return jnp.stack([_sample_channel(vol_flat[b], taps)
                      for b in range(B)], axis=1)


def forward_warp_multi(pts, motion_scale_Rs_fwd, motion_Ts_fwd,
                       motion_weights_vol, cnl_bbox_min_xyz,
                       cnl_bbox_scale_xyz, impl: str = "auto"):
    """Forward LBS for K stacked transform sets at shared points:
    (x_deform [K,N,3], wsum [N,1]) — the one-call form of
    bone_weights + apply_forward_lbs_multi (ref network.py:355-396;
    the cycle and prev-frame flow branches blend the SAME weights with
    different bone transforms, network.py:472-535).

    On TPU this runs the fully fused Pallas kernel (weights never leave
    VMEM; measured 23.4 -> 21.7 ms fwd+bwd at 262k samples, K=2 — the
    residual is the shared-tap sampling itself, see
    ops/pallas/lbs.py); elsewhere it composes the XLA/gather forms."""
    impl = resolve_impl(impl, motion_weights_vol)
    if impl == "pallas":
        from hosnerf_tpu.ops.pallas import lbs as plbs
        return plbs.forward_lbs_multi(
            pts, motion_scale_Rs_fwd, motion_Ts_fwd, motion_weights_vol,
            cnl_bbox_min_xyz, cnl_bbox_scale_xyz)
    w = bone_weights(pts, motion_weights_vol, cnl_bbox_min_xyz,
                     cnl_bbox_scale_xyz, impl=impl)
    return apply_forward_lbs_multi(w, pts, motion_scale_Rs_fwd,
                                   motion_Ts_fwd)


def apply_forward_lbs(weights: jnp.ndarray, pts: jnp.ndarray,
                      motion_scale_Rs_fwd: jnp.ndarray,
                      motion_Ts_fwd: jnp.ndarray):
    """Blend per-bone forward transforms with precomputed weights.

    weights [N,B] from `bone_weights`; returns (x_deform [N,3],
    wsum [N,1]) — identical math to `forward_lbs` given the same
    weights (ref network.py:374-396).
    """
    wsum = jnp.sum(weights, axis=1)
    acc = (jnp.einsum("nb,bij,nj->ni", weights, motion_scale_Rs_fwd, pts,
                      precision=_PREC)
           + jnp.matmul(weights, motion_Ts_fwd, precision=_PREC))
    x_deform = acc / jnp.maximum(wsum, 1e-4)[:, None]
    return x_deform, wsum[:, None]


def apply_forward_lbs_multi(weights: jnp.ndarray, pts: jnp.ndarray,
                            motion_scale_Rs_fwd: jnp.ndarray,
                            motion_Ts_fwd: jnp.ndarray):
    """`apply_forward_lbs` for K transform sets at once.

    The cycle and prev-frame flow branches blend the SAME weights/points
    with different bone transforms (ref network.py:472-535 runs two full
    passes); stacking the transforms to [K,B,3,3]/[K,B,3] folds both
    blends into one einsum. Returns (x_deform [K,N,3], wsum [N,1])."""
    wsum = jnp.sum(weights, axis=1)
    acc = (jnp.einsum("nb,kbij,nj->kni", weights, motion_scale_Rs_fwd, pts,
                      precision=_PREC)
           + jnp.einsum("nb,kbi->kni", weights, motion_Ts_fwd,
                        precision=_PREC))
    x_deform = acc / jnp.maximum(wsum, 1e-4)[None, :, None]
    return x_deform, wsum[:, None]
