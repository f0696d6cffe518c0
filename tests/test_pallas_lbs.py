"""Pallas LBS kernels vs the XLA gather forms (interpret mode on CPU).

Covers values and gradients for both kernels and both precision modes,
including padding (N not a multiple of the tile) and the documented
epsilon-clamp caveat (x_skel parity only where wsum > 1e-4 — below it
the output is the meaningless eps-clamped ratio in both impls).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hosnerf_tpu.ops import lbs as xlbs
from hosnerf_tpu.ops.pallas import lbs as plbs

B, G = 5, 8


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    N = 700  # not a multiple of TILE: exercises pad/unpad
    pts = jnp.asarray(rng.randn(N, 3) * 0.7, jnp.float32)
    Rs = jnp.asarray(
        np.stack([np.eye(3) + 0.1 * rng.randn(3, 3) for _ in range(B)]),
        jnp.float32)
    Ts = jnp.asarray(0.2 * rng.randn(B, 3), jnp.float32)
    vol = jax.nn.softmax(
        jnp.asarray(rng.randn(B + 1, G, G, G), jnp.float32), axis=0)
    bmin = jnp.asarray([-1.3, -1.1, -1.2], jnp.float32)
    bscale = jnp.asarray([0.9, 1.0, 1.1], jnp.float32)
    return pts, Rs, Ts, vol, bmin, bscale


def test_inverse_values_highest(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    xs_ref, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin,
                                                bscale)
    xs, fg = plbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale,
                              precision="highest")
    np.testing.assert_allclose(fg, fg_ref, atol=2e-6)
    m = fg_ref[:, 0] > 1e-4
    err = jnp.abs(xs - xs_ref).max(axis=1)
    assert float(err[m].max()) < 1e-5


def test_inverse_values_bf16(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    xs_ref, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin,
                                                bscale)
    xs, fg = plbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale,
                              precision="bf16")
    np.testing.assert_allclose(fg, fg_ref, atol=2e-2)
    m = fg_ref[:, 0] > 1e-4
    err = jnp.abs(xs - xs_ref).max(axis=1)
    assert float(err[m].max()) < 2e-2  # bf16 tap-weight contract


def test_inverse_grads_highest(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    _, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin, bscale)
    m = (fg_ref[:, 0] > 1e-4).astype(jnp.float32)[:, None]

    def loss_ref(p, R, T, v):
        xs, fg, _ = xlbs.inverse_lbs_gather(p, R, T, v, bmin, bscale)
        return jnp.sum(jnp.sin(xs) * m) + jnp.sum(fg * fg)

    def loss_p(p, R, T, v):
        xs, fg = plbs.inverse_lbs(p, R, T, v, bmin, bscale,
                                  precision="highest")
        return jnp.sum(jnp.sin(xs) * m) + jnp.sum(fg * fg)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(pts, Rs, Ts, vol)
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(pts, Rs, Ts, vol)
    for a, b in zip(gr, gp):
        scale = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_shared_weights_and_grads(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    coords = xlbs.normalize_coords(pts, bmin, bscale)
    taps = xlbs._trilinear_taps(coords, G, G, G)
    vf = vol.reshape(B + 1, -1)
    w_ref = jnp.stack([xlbs._sample_channel(vf[b], taps)
                       for b in range(B)], axis=1)
    w_hi = plbs.bone_weights(pts, vol, bmin, bscale, precision="highest")
    np.testing.assert_allclose(w_hi, w_ref, atol=1e-6)
    w_bf = plbs.bone_weights(pts, vol, bmin, bscale, precision="bf16")
    np.testing.assert_allclose(w_bf, w_ref, atol=2e-2)

    def loss_ref(p, v):
        c = xlbs.normalize_coords(p, bmin, bscale)
        t = xlbs._trilinear_taps(c, G, G, G)
        w = jnp.stack([xlbs._sample_channel(v.reshape(B + 1, -1)[b], t)
                       for b in range(B)], axis=1)
        return jnp.sum(jnp.cos(w * 3.0))

    def loss_p(p, v):
        return jnp.sum(jnp.cos(plbs.bone_weights(
            p, v, bmin, bscale, precision="highest") * 3.0))

    gr = jax.grad(loss_ref, argnums=(0, 1))(pts, vol)
    gp = jax.grad(loss_p, argnums=(0, 1))(pts, vol)
    for a, b in zip(gr, gp):
        scale = float(jnp.abs(a).max()) + 1e-6
        assert float(jnp.abs(a - b).max()) / scale < 1e-5


def test_dispatch_forward_pair_matches_forward_lbs(data):
    """bone_weights + apply_forward_lbs == forward_lbs (the shared-tap
    refactor of the cycle/flow branches, models/human.py)."""
    pts, Rs, Ts, vol, bmin, bscale = data
    x_ref, ws_ref = xlbs.forward_lbs(pts, Rs, Ts, vol, bmin, bscale)
    w = xlbs.bone_weights(pts, vol, bmin, bscale, impl="xla")
    x, ws = xlbs.apply_forward_lbs(w, pts, Rs, Ts)
    np.testing.assert_allclose(x, x_ref, atol=1e-5)
    np.testing.assert_allclose(ws, ws_ref, atol=1e-5)


def test_inverse_warp_dispatch(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    xs_ref, fg_ref, _ = xlbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale)
    for impl in ("xla", "gather", "pallas"):
        xs, fg = xlbs.inverse_warp(pts, Rs, Ts, vol, bmin, bscale,
                                   impl=impl)
        m = fg_ref[:, 0] > 1e-4
        tol = 2e-2 if impl == "pallas" else 1e-5  # pallas default = bf16
        assert float(jnp.abs(xs - xs_ref).max(axis=1)[m].max()) < tol
        np.testing.assert_allclose(fg, fg_ref, atol=tol)


# ---------------------------------------------------------------------------
# pair-grid kernel (compacted (tile, bone) pairs, dynamic grid)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def data_pg():
    """Production-shaped small case: G=32 (NGB=4, 7 quads/tile), 26 bones,
    HALF the bones translated far outside the grid so the support
    predicate has real work to do."""
    rng = np.random.RandomState(1)
    Bb, Gg = 26, 32
    N = 700
    pts = jnp.asarray(rng.randn(N, 3) * 0.7, jnp.float32)
    Rs = np.stack([np.eye(3) + 0.1 * rng.randn(3, 3) for _ in range(Bb)])
    Ts = 0.2 * rng.randn(Bb, 3)
    Ts[::2] += 50.0  # every other bone far out of support
    vol = jax.nn.softmax(
        jnp.asarray(rng.randn(Bb + 1, Gg, Gg, Gg), jnp.float32), axis=0)
    bmin = jnp.asarray([-1.3, -1.1, -1.2], jnp.float32)
    bscale = jnp.asarray([0.9, 1.0, 1.1], jnp.float32)
    return (pts, jnp.asarray(Rs, jnp.float32), jnp.asarray(Ts, jnp.float32),
            vol, bmin, bscale)


def test_pairgrid_values_match_dense_and_gather(data_pg):
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    xs_ref, fg_ref, _ = xlbs.inverse_lbs_gather(pts, Rs, Ts, vol, bmin,
                                                bscale)
    xs, fg = plbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale,
                              precision="highest", pair_grid=True)
    np.testing.assert_allclose(fg, fg_ref, atol=3e-6)
    m = fg_ref[:, 0] > 1e-4
    err = jnp.abs(xs - xs_ref).max(axis=1)
    assert float(err[m].max()) < 1e-5
    xs_d, fg_d = plbs.inverse_lbs(pts, Rs, Ts, vol, bmin, bscale,
                                  precision="highest", pair_grid=False)
    np.testing.assert_allclose(fg, fg_d, atol=3e-6)


def test_pairgrid_actually_compacts(data_pg):
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    Bb, Gg = 26, 32
    s, o = plbs._grid_affine(bmin, bscale, Gg)
    rg = (Rs * s[None, :, None]).reshape(Bb, 9)
    tg = Ts * s[None, :] + o[None, :]
    NGB, BPD = plbs._pg_pad_shapes(Bb, Gg)
    rgp = jnp.pad(rg, ((0, BPD - Bb), (0, 0)))
    tgp = jnp.pad(tg, ((0, BPD - Bb), (0, 0)))
    pts_p, _ = plbs._pad_rows(pts, plbs.TILE_PG)
    perm, _ = plbs._group_sort_perm(pts_p)
    pair_tile, pair_bone, n_pairs = plbs._build_pairs(
        pts_p[perm], rgp, tgp, Bb, BPD, Gg)
    cap = pair_tile.shape[0]
    n_tiles = pts_p.shape[0] // plbs.TILE_PG
    assert int(n_pairs) >= n_tiles          # quad 0 forced per tile
    # half the bones are far away -> at most ~(13 alive + pad)/bone-quads
    assert int(n_pairs) <= n_tiles * (13 // NGB + 2)
    # pairs sorted by tile, contiguous
    t = np.asarray(pair_tile)[: int(n_pairs)]
    assert (np.diff(t) >= 0).all()
    # dummy bones only in dead slots, real bones distinct per tile
    pb = np.asarray(pair_bone)[: int(n_pairs)]
    for tile in range(n_tiles):
        bones = pb[t == tile].reshape(-1)
        real = bones[bones < Bb]
        assert len(np.unique(real)) == len(real)


def test_forward_lbs_multi_fused_matches_composition(data):
    """The fused shared-tap + blend kernel == bone_weights followed by
    apply_forward_lbs_multi, values and grads (K=2 transform sets)."""
    pts, Rs, Ts, vol, bmin, bscale = data
    rng = np.random.RandomState(3)
    Rs2 = jnp.asarray(np.stack(
        [np.eye(3) + 0.1 * rng.randn(3, 3) for _ in range(B)]), jnp.float32)
    Ts2 = jnp.asarray(0.2 * rng.randn(B, 3), jnp.float32)
    Rk = jnp.stack([Rs, Rs2])
    Tk = jnp.stack([Ts, Ts2])

    def ref(p, v, R, T):
        w = xlbs.bone_weights(p, v, bmin, bscale, impl="gather")
        return xlbs.apply_forward_lbs_multi(w, p, R, T)

    x_ref, ws_ref = ref(pts, vol, Rk, Tk)
    x, ws = plbs.forward_lbs_multi(pts, Rk, Tk, vol, bmin, bscale,
                                   precision="highest")
    np.testing.assert_allclose(x, x_ref, atol=2e-4)
    np.testing.assert_allclose(ws, ws_ref, atol=1e-5)
    x_bf, _ = plbs.forward_lbs_multi(pts, Rk, Tk, vol, bmin, bscale,
                                     precision="bf16")
    np.testing.assert_allclose(x_bf, x_ref, atol=5e-2)

    def loss(fn, p, v, R, T):
        x, ws = fn(p, v, R, T)
        return (jnp.sum(jnp.sin(x) * jnp.arange(x.size).reshape(x.shape))
                + jnp.sum(ws * ws))

    import functools
    f_fused = lambda p, v, R, T: plbs.forward_lbs_multi(  # noqa: E731
        p, R, T, v, bmin, bscale, precision="highest")
    g_ref = jax.grad(lambda *a: loss(ref, *a), argnums=(0, 1, 2, 3))(
        pts, vol, Rk, Tk)
    g_f = jax.grad(lambda *a: loss(f_fused, *a), argnums=(0, 1, 2, 3))(
        pts, vol, Rk, Tk)
    for nm, a, b in zip(["dpts", "dvol", "dR", "dT"], g_f, g_ref):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-5, err_msg=nm)


def test_forward_warp_multi_dispatch(data):
    pts, Rs, Ts, vol, bmin, bscale = data
    Rk = jnp.stack([Rs, Rs])
    Tk = jnp.stack([Ts, Ts + 0.1])
    x_ref, ws_ref = xlbs.forward_warp_multi(pts, Rk, Tk, vol, bmin,
                                            bscale, impl="gather")
    for impl in ("xla", "pallas"):
        x, ws = xlbs.forward_warp_multi(pts, Rk, Tk, vol, bmin, bscale,
                                        impl=impl)
        tol = 5e-2 if impl == "pallas" else 1e-5  # pallas default = bf16
        np.testing.assert_allclose(x, x_ref, atol=tol)
        np.testing.assert_allclose(ws, ws_ref, atol=tol)


def test_windowed_pairgrid_values_and_grads_match_dense(data_pg):
    """The windowed pair-grid (x-window tap planes, exact by column
    additivity) == the dense tile kernel, values and all gradients."""
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    Bb, Gg = 26, 32
    s, o = plbs._grid_affine(bmin, bscale, Gg)
    rg = (Rs * s[None, :, None]).reshape(Bb, 9)
    tg = Ts * s[None, :] + o[None, :]
    vol_qz = jnp.transpose(vol[:Bb], (0, 3, 2, 1)).reshape(Bb, Gg * Gg, Gg)

    acc_w = plbs.inverse_core_pgw(pts, rg, tg, vol_qz, "highest")
    acc_d = plbs.inverse_core(pts, rg, tg, vol_qz, "highest")
    scale = float(jnp.abs(acc_d).max())
    np.testing.assert_allclose(np.asarray(acc_w) / scale,
                               np.asarray(acc_d) / scale, atol=2e-6)

    def loss(core, p, R, T, v):
        a = core(p, R, T, v, "highest")
        return jnp.sum(jnp.sin(a) * jnp.arange(a.size).reshape(a.shape))

    g_w = jax.grad(lambda *a: loss(plbs.inverse_core_pgw, *a),
                   argnums=(0, 1, 2, 3))(pts, rg, tg, vol_qz)
    g_d = jax.grad(lambda *a: loss(plbs.inverse_core, *a),
                   argnums=(0, 1, 2, 3))(pts, rg, tg, vol_qz)
    for nm, a, b in zip(["dpts", "drg", "dtg", "dvol"], g_w, g_d):
        sc = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / sc,
                                   np.asarray(b) / sc,
                                   atol=5e-5, err_msg=nm)


def test_windowed_pairs_are_exact_cover(data_pg):
    """Every alive (tile, bone) is covered by windows whose column
    ranges are disjoint and contain all supported taps."""
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    Bb, Gg = 26, 32
    s, o = plbs._grid_affine(bmin, bscale, Gg)
    rg = (Rs * s[None, :, None]).reshape(Bb, 9)
    tg = Ts * s[None, :] + o[None, :]
    NGB, BPD = plbs._pg_pad_shapes(Bb, Gg)
    rgp = jnp.pad(rg, ((0, BPD - Bb), (0, 0)))
    tgp = jnp.pad(tg, ((0, BPD - Bb), (0, 0)))
    pts_p, n = plbs._pad_rows(pts, plbs.TILE_PG)
    sup, f = plbs._sample_support(pts_p, rgp, tgp, Gg, return_f=True)
    sup = sup & (jnp.arange(BPD) < Bb)[None, :]
    sup = sup & (jnp.arange(pts_p.shape[0]) < n)[:, None]
    perm, _ = plbs._sig_morton_perm(pts_p, sup)
    x0 = jnp.clip(jnp.floor(f[..., 0]), -1, Gg).astype(jnp.int32)
    pair_tile, wwin, pair_bone, n_pairs, n_total = \
        plbs._build_window_pairs(sup[perm], x0[perm], Bb, BPD, Gg)
    assert int(n_total) <= pair_tile.shape[0], "capacity overflow"
    npairs = int(n_pairs)
    W = plbs._win_w(Gg)
    tiles = np.asarray(pair_tile)[:npairs]
    words = np.asarray(wwin).reshape(-1, NGB // 2)[:npairs]
    sup_s = np.asarray(sup[perm])
    x0_s = np.asarray(x0[perm])
    nt = pts_p.shape[0] // plbs.TILE_PG
    # reconstruct per-(tile, bone) covered column sets
    covered = {}
    for p in range(npairs):
        for j in range(NGB):
            w = int(words[p, j // 2]) >> (16 * (j % 2))
            b, xs = w & 0xFF, (w >> 8) & 0xFF
            if b == BPD - 1:
                continue
            key = (int(tiles[p]), b)
            rng = set(range(xs, xs + W))
            assert covered.get(key, set()).isdisjoint(rng), key
            covered.setdefault(key, set()).update(rng)
    # every supported tap column must be covered
    T = plbs.TILE_PG
    for t in range(nt):
        st = sup_s[t * T:(t + 1) * T]
        xt = x0_s[t * T:(t + 1) * T]
        for b in range(Bb):
            rows = np.nonzero(st[:, b])[0]
            if rows.size == 0:
                continue
            cols = covered[(t, b)]
            for r in rows[:8]:
                for tap in (xt[r, b], xt[r, b] + 1):
                    if 0 <= tap < Gg:
                        assert tap in cols, (t, b, tap)


def test_pairgrid_grads_match_dense(data_pg):
    pts, Rs, Ts, vol, bmin, bscale = data_pg

    def loss(fn, p, R, T, v):
        xs, fg = fn(p, R, T, v, bmin, bscale)
        w = jnp.concatenate([jnp.cos(xs), jnp.sin(fg)], axis=1)
        return jnp.sum(w * jnp.arange(w.size).reshape(w.shape))

    import functools
    f_pg = functools.partial(plbs.inverse_lbs, precision="highest",
                             pair_grid=True)
    f_dn = functools.partial(plbs.inverse_lbs, precision="highest",
                             pair_grid=False)
    g_pg = jax.grad(lambda *a: loss(f_pg, *a), argnums=(0, 1, 2, 3))(
        pts, Rs, Ts, vol)
    g_dn = jax.grad(lambda *a: loss(f_dn, *a), argnums=(0, 1, 2, 3))(
        pts, Rs, Ts, vol)
    names = ["dpts", "dRs", "dTs", "dvol"]
    for nm, a, b in zip(names, g_pg, g_dn):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=5e-5, err_msg=nm)


# ---------------------------------------------------------------------------
# bone-packed pair-grid kernel (4 independent (tile, bone) pairs per step)
# ---------------------------------------------------------------------------


def test_bonepacked_values_match_dense(data_pg):
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    Bb, Gg = 26, 32
    s, o = plbs._grid_affine(bmin, bscale, Gg)
    rg = (Rs * s[None, :, None]).reshape(Bb, 9)
    tg = Ts * s[None, :] + o[None, :]
    vol_qz = jnp.transpose(vol[:Bb], (0, 3, 2, 1)).reshape(Bb, Gg * Gg, Gg)
    acc_bp = plbs.inverse_core_bp(pts, rg, tg, vol_qz, "highest")
    acc_d = plbs.inverse_core(pts, rg, tg, vol_qz, "highest")
    np.testing.assert_allclose(np.asarray(acc_bp), np.asarray(acc_d),
                               atol=3e-5, rtol=1e-5)


def test_bonepacked_grads_match_dense(data_pg):
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    import os
    os.environ["HOSNERF_PG_IMPL"] = "bp"
    try:
        def loss(fn, p, R, T, v):
            xs, fg = fn(p, R, T, v, bmin, bscale)
            w = jnp.concatenate([jnp.cos(xs), jnp.sin(fg)], axis=1)
            return jnp.sum(w * jnp.arange(w.size).reshape(w.shape))

        import functools
        f_bp = functools.partial(plbs.inverse_lbs, precision="highest",
                                 pair_grid=True)
        f_dn = functools.partial(plbs.inverse_lbs, precision="highest",
                                 pair_grid=False)
        g_bp = jax.grad(lambda *a: loss(f_bp, *a), argnums=(0, 1, 2, 3))(
            pts, Rs, Ts, vol)
        g_dn = jax.grad(lambda *a: loss(f_dn, *a), argnums=(0, 1, 2, 3))(
            pts, Rs, Ts, vol)
        for nm, a, b in zip(["dpts", "dRs", "dTs", "dvol"], g_bp, g_dn):
            scale = max(float(jnp.abs(b).max()), 1e-6)
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       atol=2e-6, err_msg=nm)
    finally:
        del os.environ["HOSNERF_PG_IMPL"]


def test_bonepacked_slot_pairs_cover_exactly(data_pg):
    """Every alive (tile, bone) pair appears exactly once across the
    slot streams; pads are dummy bones on the slot's last tile; per-slot
    tile sequences are non-decreasing."""
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    Bb, Gg = 26, 32
    s, o = plbs._grid_affine(bmin, bscale, Gg)
    rg = (Rs * s[None, :, None]).reshape(Bb, 9)
    tg = Ts * s[None, :] + o[None, :]
    NGB, BPD = plbs._pg_pad_shapes(Bb, Gg)
    rgp = jnp.pad(rg, ((0, BPD - Bb), (0, 0)))
    tgp = jnp.pad(tg, ((0, BPD - Bb), (0, 0)))
    pts_p, n = plbs._pad_rows(pts, plbs.TILE_PG)
    sup = plbs._sample_support(pts_p, rgp, tgp, Gg)
    sup = sup & (jnp.arange(BPD) < Bb)[None, :]
    sup = sup & (jnp.arange(pts_p.shape[0]) < n)[:, None]
    perm, _ = plbs._support_sort_perm(sup)
    n_tiles = pts_p.shape[0] // plbs.TILE_PG
    alive = np.asarray(jnp.any(
        sup[perm].reshape(n_tiles, plbs.TILE_PG, BPD), axis=1))
    ptile16, pbone, slot_of, n_steps = plbs._slot_pairs(
        jnp.asarray(alive), Bb, BPD, Gg)
    NS = 128 // Gg
    L = int(n_steps)
    t16 = np.asarray(ptile16)
    cap2 = t16.shape[1]
    tiles = np.zeros((NS, cap2 * 2), np.int64)
    tiles[:, 0::2] = t16 & 0xFFFF
    tiles[:, 1::2] = (t16 >> 16) & 0xFFFF
    # pbone is [cap] with NS byte-packed bones per step
    pb = np.asarray(pbone)
    bones = np.stack([(pb >> (8 * j)) & 0xFF for j in range(NS)], 0)

    seen = set()
    so = np.asarray(slot_of)
    for j in range(NS):
        tj = tiles[j, :L]
        bj = bones[j, :L]
        assert (np.diff(tj) >= 0).all(), f"slot {j} tiles not sorted"
        for t, b in zip(tj, bj):
            if b < Bb:
                assert alive[t, b], (j, t, b)
                assert so[t] == j
                assert (t, b) not in seen
                seen.add((t, b))
    expect = {(t, b) for t in range(n_tiles) for b in range(Bb)
              if alive[t, b]}
    assert seen == expect


def test_forward_lbs_multi_live_suffix(data_pg):
    """k0_blocks skips the dead prefix: rows >= k0*TILE_SH match the
    k0=0 run exactly (values and grads through a masked loss)."""
    pts, Rs, Ts, vol, bmin, bscale = data_pg
    rng = np.random.RandomState(5)
    Rk = jnp.stack([Rs, Rs])
    Tk = jnp.stack([Ts, Ts])
    n = pts.shape[0]
    k0 = 1
    boundary = k0 * plbs.TILE_SH

    def loss(p, v, k0b):
        x, w = plbs.forward_lbs_multi(p, Rk, Tk, v, bmin, bscale,
                                      precision="highest", k0_blocks=k0b)
        mask = (jnp.arange(n) >= boundary).astype(jnp.float32)
        return (jnp.sum(jnp.where(mask[None, :, None] > 0, x, 0.0))
                + jnp.sum(jnp.where(mask[:, None] > 0, w, 0.0)))

    # n=700 pads to 1024 = 2 TILE_SH blocks; k0=1 skips the first
    l0, g0 = jax.value_and_grad(loss, argnums=(0, 1))(pts, vol, 0)
    l1, g1 = jax.value_and_grad(loss, argnums=(0, 1))(pts, vol, k0)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(g0, g1):
        # dead-prefix rows of dpts are unwritten garbage under k0 — the
        # masked-loss contract zeroes their cotangents, so only live
        # rows and the (full) dvol must agree
        if a.shape == pts.shape:
            np.testing.assert_allclose(np.asarray(b)[boundary:],
                                       np.asarray(a)[boundary:],
                                       atol=1e-6, rtol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-6, rtol=1e-5)


def test_fused_embed_trunk_live_suffix():
    """fused_embed_trunk k0_blocks: live rows and param grads match the
    full run under a dead-prefix-masked loss."""
    from hosnerf_tpu.ops.pallas import mlp as pmlp
    rng = jax.random.key(0)
    N, tile = 700, 256
    x = jax.random.normal(rng, (N, 3))
    aux = jax.random.normal(rng, (16,))
    layers = []
    for i in range(4):
        d_in = 63 + 16 if i == 0 else (32 + 63 + 16 if i == 2 else 32)
        layers.append((jax.random.normal(jax.random.fold_in(rng, i),
                                         (d_in, 32)) * 0.1,
                       jnp.zeros((32,))))
    out_p = (jax.random.normal(jax.random.fold_in(rng, 9),
                               (32, 4)) * 0.1, jnp.zeros((4,)))
    k0 = 1
    boundary = k0 * tile

    def loss(xx, params, k0b):
        ls = [(params[2 * i], params[2 * i + 1]) for i in range(4)]
        op = (params[8], params[9])
        o = pmlp.fused_embed_trunk(
            xx, aux, None, ls, op, kind="fourier", multires=10,
            aux_mode="broadcast", aux_first=False, skip_before=2,
            skip_source="full_input", precision="highest", tile=tile,
            k0_blocks=k0b)
        mask = (jnp.arange(N) >= boundary).astype(jnp.float32)[:, None]
        return jnp.sum(jnp.where(mask > 0, o, 0.0))

    flat = [p for wb in layers for p in wb] + list(out_p)
    l0, g0 = jax.value_and_grad(loss, argnums=(1,))(x, flat, 0)
    l1, g1 = jax.value_and_grad(loss, argnums=(1,))(x, flat, k0)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(g0[0], g1[0]):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-5)
