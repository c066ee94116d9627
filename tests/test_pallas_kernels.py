"""Pallas kernel twins vs their jnp reference implementations (SURVEY §4
'kernel-vs-reference: every Pallas kernel gets an interpret-mode twin')."""

import numpy as np
import pytest
import jax.numpy as jnp

from ascii_renderer_tpu.ascii.modal import modal_filter
from ascii_renderer_tpu.ops.ascii_kernel import modal_filter_pallas


@pytest.mark.slow
def test_modal_pallas_twin_matches_jnp():
    rng = np.random.default_rng(0)
    for (h, w) in [(36, 96), (70, 130), (64, 128)]:
        for radius, thresh in [(1, 5), (2, 12), (3, 24)]:
            idx = rng.integers(0, 10, (h, w)).astype(np.int32)
            ovr = rng.random((h, w)) < 0.1
            a = np.asarray(modal_filter(jnp.asarray(idx), jnp.asarray(ovr),
                                        radius, thresh))
            b = np.asarray(modal_filter_pallas(jnp.asarray(idx),
                                               jnp.asarray(ovr), radius,
                                               thresh, interpret=True))
            np.testing.assert_array_equal(
                a, b, err_msg=f"{w}x{h} r{radius} t{thresh}")


def test_modal_pallas_edge_clamping():
    # lone corner outlier in a uniform field gets smoothed at the boundary
    idx = np.zeros((12, 40), np.int32)
    idx[0, 0] = 3
    ovr = np.zeros((12, 40), bool)
    out = np.asarray(modal_filter_pallas(jnp.asarray(idx), jnp.asarray(ovr),
                                         1, 5, interpret=True))
    assert out[0, 0] == 0
    ref = np.asarray(modal_filter(jnp.asarray(idx), jnp.asarray(ovr), 1, 5))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_pt_megakernel_twin_deterministic_parts():
    """Kernel vs XLA tracer: miss/env, light hits, glyph overrides and the
    fetched flag are RNG-free at bounces=1/nee=False — must match exactly."""
    import jax
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build()
    cam = Camera.create(pos=(0, 2.5, 5.2), yaw=-np.pi / 2)  # faces the poster
    rd = primary_ray_dirs(cam, 24, 48, 0.5)
    rox = jnp.broadcast_to(scene.camera.pos * 0 + jnp.asarray(cam.pos), rd.shape)
    lc, lr = PT.get_light_sphere(scene, 0.0)
    lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3
    a_lo, a_ov, a_f = PT.trace_eye_paths(
        scene, rox, rd, jax.random.key(0), lc, lr, bounces=1,
        light_color=lcol, nee=False)
    k_lo, k_ov, k_f = PT.trace_eye_paths_kernel(
        scene, rox, rd, 0, lc, lr, bounces=1, light_color=lcol, nee=False,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(a_ov), np.asarray(k_ov))
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(k_f))
    np.testing.assert_allclose(np.asarray(a_lo), np.asarray(k_lo), atol=1e-5)
    assert (np.asarray(a_ov) > 0).sum() > 10  # the poster is actually hit


def test_pt_megakernel_big_and_padded_atlas():
    """The two-level one-hot gather must stay exact for atlases beyond
    the old 1024-texel cap (64x64 = 4096 texels used to fall back to the
    XLA core) and for texel counts that are not 128-multiples (26x24 =
    624 -> a padded tail slab)."""
    import jax
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs

    for aw, ah in ((64, 64), (26, 24)):
        sb = create_demo_scene()
        sb.set_atlas(demo_atlas(aw, ah))
        scene = sb.build()
        cam = Camera.create(pos=(0, 2.5, 5.2), yaw=-np.pi / 2)
        rd = primary_ray_dirs(cam, 16, 32, 0.5)
        rox = jnp.broadcast_to(jnp.asarray(cam.pos), rd.shape)
        lc, lr = PT.get_light_sphere(scene, 0.0)
        lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3
        a_lo, a_ov, a_f = PT.trace_eye_paths(
            scene, rox, rd, jax.random.key(0), lc, lr, bounces=1,
            light_color=lcol, nee=False)
        k_lo, k_ov, k_f = PT.trace_eye_paths_kernel(
            scene, rox, rd, 0, lc, lr, bounces=1, light_color=lcol,
            nee=False, interpret=True)
        np.testing.assert_array_equal(np.asarray(a_ov), np.asarray(k_ov),
                                      err_msg=f"{aw}x{ah}")
        np.testing.assert_array_equal(np.asarray(a_f), np.asarray(k_f),
                                      err_msg=f"{aw}x{ah}")
        np.testing.assert_allclose(np.asarray(a_lo), np.asarray(k_lo),
                                   atol=1e-5, err_msg=f"{aw}x{ah}")
        assert (np.asarray(a_f)).sum() > 0, f"{aw}x{ah}: poster never hit"


def _pt_atlas_render(scene, layout_rows=None):
    """One deterministic megakernel render of `scene` (interpret mode),
    optionally forcing the atlas layout by monkeying GATHER_MAX_ROWS
    (0 = always the transposed one-hot fallback)."""
    import jax
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.ops import pt_kernel as PK
    from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs

    cam = Camera.create(pos=(0, 2.5, 5.2), yaw=-np.pi / 2)
    rd = primary_ray_dirs(cam, 16, 32, 0.5)
    ro = jnp.broadcast_to(jnp.asarray(cam.pos), rd.shape)
    lc, lr = PT.get_light_sphere(scene, 0.0)
    lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3
    old = PK.GATHER_MAX_ROWS
    if layout_rows is not None:
        PK.GATHER_MAX_ROWS = layout_rows
    try:
        return PT.trace_eye_paths_kernel(
            scene, ro, rd, 0, lc, lr, bounces=1, light_color=lcol,
            nee=False, interpret=True)
    finally:
        PK.GATHER_MAX_ROWS = old


def test_pt_atlas_gather_vs_onehot_layouts_bit_identical():
    """The slab-major dynamic-gather atlas layout (small atlases) and the
    transposed one-hot fallback (big atlases) must produce bit-identical
    renders for the same atlas content: both move the texel bytes
    verbatim (gather/where vs exact one-hot dot), so only speed may
    differ. Forcing GATHER_MAX_ROWS=0 routes the SAME 32x32 atlas through
    the fallback — packer and kernel both key off use_gather_layout, so
    one knob flips layout + fetch together."""
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build()
    fast = _pt_atlas_render(scene)            # 8 slab rows -> gather
    slow = _pt_atlas_render(scene, layout_rows=0)  # forced one-hot
    for a, b in zip(fast, slow):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.asarray(fast[2]).sum() > 0, "poster never hit"


def test_pt_megakernel_onehot_fallback_big_atlas():
    """An atlas beyond GATHER_MAX_ROWS slab rows (128x64 = 8192 texels =
    64 rows) naturally takes the one-hot fallback; it must stay exact vs
    the XLA-core twin (the coverage the gather fast path would otherwise
    have stolen from test_pt_megakernel_big_and_padded_atlas)."""
    import jax
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.ops import pt_kernel as PK
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas(128, 64))
    scene = sb.build()
    assert not PK.use_gather_layout(128 * 64)
    cam = Camera.create(pos=(0, 2.5, 5.2), yaw=-np.pi / 2)
    rd = primary_ray_dirs(cam, 16, 32, 0.5)
    ro = jnp.broadcast_to(jnp.asarray(cam.pos), rd.shape)
    lc, lr = PT.get_light_sphere(scene, 0.0)
    lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3
    a_lo, a_ov, a_f = PT.trace_eye_paths(
        scene, ro, rd, jax.random.key(0), lc, lr, bounces=1,
        light_color=lcol, nee=False)
    k_lo, k_ov, k_f = PT.trace_eye_paths_kernel(
        scene, ro, rd, 0, lc, lr, bounces=1, light_color=lcol,
        nee=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a_ov), np.asarray(k_ov))
    np.testing.assert_array_equal(np.asarray(a_f), np.asarray(k_f))
    np.testing.assert_allclose(np.asarray(a_lo), np.asarray(k_lo),
                               atol=1e-5)
    assert np.asarray(a_f).sum() > 0, "poster never hit"


@pytest.mark.slow
def test_pt_megakernel_twin_statistical():
    """Multi-bounce MC estimates agree in the mean (different RNG streams)."""
    import jax
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.core.camera import primary_ray_dirs

    scene = create_demo_scene().build()
    cam = scene.camera
    rd = primary_ray_dirs(cam, 6, 12, 0.5)
    ro = jnp.broadcast_to(cam.pos, rd.shape)
    lc, lr = PT.get_light_sphere(scene, 0.0)
    lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3
    N = 24
    acc_a = np.zeros((6, 12, 3))
    acc_k = np.zeros((6, 12, 3))
    for i in range(N):
        a_lo, _, _ = PT.trace_eye_paths(scene, ro, rd, jax.random.key(i),
                                        lc, lr, bounces=3, light_color=lcol,
                                        nee=True)
        k_lo, _, _ = PT.trace_eye_paths_kernel(scene, ro, rd, i, lc, lr,
                                               bounces=3, light_color=lcol,
                                               nee=True, interpret=True)
        acc_a += np.asarray(a_lo)
        acc_k += np.asarray(k_lo)
    # whole-image mean radiance within 3%
    assert abs(acc_a.mean() - acc_k.mean()) / acc_a.mean() < 0.03


def test_packed_subtile_kernel_matches_expanded_twin():
    """tile_eval_packed (packed [r_cap, 128] rows + MXU lane expansion)
    must select the same winners as tile_eval_subtile (expanded
    [r_cap, 16, 128] rows) on identical bins: same z, same tie-breaks."""
    import jax
    from ascii_renderer_tpu.ops import raster_subtile as RS

    rng = np.random.default_rng(7)
    n_tiles, tiles_x = 6, 3
    n_bins = n_tiles * RS.N_SUB
    V = 300
    # random small triangles in global pixel space, as edge/depth planes
    src = np.zeros((V + 1, 16), np.float32)
    for v in range(V):
        t = rng.integers(0, n_tiles)
        ty, tx = divmod(t, tiles_x)
        cx = tx * 128 + rng.uniform(4, 124)
        cy = ty * 8 + rng.uniform(1, 7)
        pts = np.stack([cx + rng.uniform(-6, 6, 3),
                        cy + rng.uniform(-4, 4, 3)], axis=1)
        if np.cross(pts[1] - pts[0], pts[2] - pts[0]) > 0:
            pts = pts[::-1]
        acs, bcs, gcs = [], [], []
        for k in range(3):
            (x1, y1), (x2, y2) = pts[(k + 1) % 3], pts[(k + 2) % 3]
            acs.append(-(y2 - y1)); bcs.append(x2 - x1)
            gcs.append((y2 - y1) * x1 - (x2 - x1) * y1)
        z = rng.uniform(0.05, 0.95)
        src[v, :12] = [acs[0], bcs[0], gcs[0], acs[1], bcs[1], gcs[1],
                       acs[2], bcs[2], gcs[2], 0.0, 0.0, z]
    srcj = jnp.asarray(src)

    # random sorted pair keys over those triangles
    pairs = []
    for v in range(V):
        for b in rng.choice(n_bins, size=rng.integers(1, 4), replace=False):
            pairs.append((int(b) << RS.SUB_SHIFT) | v)
    keys = jnp.asarray(np.sort(np.asarray(pairs, np.int64)).astype(np.int32))

    r_cap = 512
    rows_e, ptr_e, nr_e, np_e = RS.build_subtile_rows(
        srcj, keys, tiles_x, n_tiles, r_cap, entry="tri")
    z_e, e_e = RS.tile_eval_subtile(rows_e, ptr_e, tiles_x, n_tiles,
                                    interpret=True)
    rows_p, ptr_p, nr_p, np_p = RS.build_packed_rows(
        srcj, keys, tiles_x, n_tiles, r_cap, entry="tri")
    z_p, e_p = RS.tile_eval_packed(rows_p, ptr_p, tiles_x, n_tiles,
                                   interpret=True)
    assert int(np_e) == int(np_p)
    np.testing.assert_array_equal(np.asarray(e_e), np.asarray(e_p))
    np.testing.assert_allclose(np.asarray(z_e), np.asarray(z_p),
                               rtol=1e-5, atol=1e-5)


def test_pack_channels_matches_stack():
    """ops/pack.pack_channels must equal jnp.stack(axis=-1) + zero pad,
    bit-exactly (identity dot at HIGHEST precision)."""
    from ascii_renderer_tpu.ops.pack import pack_channels

    rng = np.random.default_rng(2)
    for c, n in ((21, 1024), (13, 512), (8, 4096)):
        chans = [jnp.asarray(rng.normal(size=n).astype(np.float32))
                 for _ in range(c)]
        got = np.asarray(pack_channels(chans, interpret=True))
        w = -(-c // 8) * 8
        want = np.zeros((n, w), np.float32)
        want[:, :c] = np.stack([np.asarray(x) for x in chans], axis=-1)
        np.testing.assert_array_equal(got, want)


def test_pack_exact3_split_is_bit_exact():
    """The 3-way bf16 split transpose (PACK_EXACT3) must be bit-equal to
    the HIGHEST-precision identity dot on hostile f32 inputs: huge/tiny
    exponents, full-mantissa values, negatives, exact bf16 values, and
    zeros — everything above the documented |x| ~ 1e-33 subnormal-residue
    floor (exactness argument + caveat in ops/pack.py)."""
    from ascii_renderer_tpu.ops import pack as P

    rng = np.random.default_rng(7)
    n = 1024
    parts = [
        rng.normal(size=n // 4).astype(np.float32) * 1e30,
        rng.normal(size=n // 4).astype(np.float32) * 1e-25,
        np.float32(1.0) + rng.random(n // 4, np.float32),  # dense mantissa
        np.round(rng.normal(size=n // 4).astype(np.float32) * 8) / 8,
    ]
    x = np.concatenate(parts)
    rng.shuffle(x)
    chans = jnp.asarray(np.stack([np.roll(x, i) for i in range(16)]))

    old = P.PACK_EXACT3
    try:
        P.PACK_EXACT3 = True
        got = [np.asarray(o) for o in
               P.pack_channels_split(chans, [(0, 16)], interpret=True)]
        P.PACK_EXACT3 = False
        want = [np.asarray(o) for o in
                P.pack_channels_split(chans, [(0, 16)], interpret=True)]
    finally:
        P.PACK_EXACT3 = old
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[0], np.asarray(chans).T)


def test_exact3_split_barriers_survive_lowering():
    """The exact-3-split's correctness on TPU depends on the
    optimization_barrier around each bf16 part: XLA's excess-precision
    pass otherwise folds the f32->bf16->f32 round-trip to identity and
    collapses the split to bf16(x) (TPU pipeline only — the CPU
    backend does not fold, so this canary checks the lowered IR
    instead of values). Guards ops/mxu._split3 and ops/pack."""
    import jax
    from ascii_renderer_tpu.ops import mxu

    def f(x):
        return mxu.select_dot(
            x, jnp.eye(128, dtype=jnp.float32), (((1,), (1,)), ((), ())),
            sel_on_left=True)

    x = jnp.zeros((8, 128), jnp.float32)
    txt = jax.jit(f).lower(x).as_text()
    assert txt.count("optimization_barrier") >= 3, txt[:2000]


def test_pack_split_blocked_matches_flat():
    """pack_channels_split_blocked over the setup kernel's native
    [C, N/128, 128] tiling must equal pack_channels_split over the flat
    [C, N] view bit-exactly (it exists purely to avoid XLA's operand
    relayout copies; ops/pack.py docstring)."""
    from ascii_renderer_tpu.ops import pack as P

    rng = np.random.default_rng(11)
    c, n = 40, 8192
    cm = jnp.asarray(rng.normal(size=(c, n)).astype(np.float32) * 1e3)
    spans = [(0, 16), (16, 40)]
    flat = P.pack_channels_split(cm, spans, interpret=True)
    blocked = P.pack_channels_split_blocked(
        cm.reshape(c, n // 128, 128), spans, interpret=True)
    for f, b in zip(flat, blocked):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(b))


def test_pt_megakernel_layouts_bit_identical():
    """The scalar (packed descriptor rows) and vec (lane-replicated
    entries) stream layouts must be bit-identical: same candidate order,
    same arithmetic — only the channel-access instruction class differs.
    (Also keeps the scalar fallback path — used beyond MAX_VEC_ENTRIES —
    under test now that vec is the default.)"""
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.ops import pt_kernel as PK
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build()
    cam = Camera.create(pos=(0, 2.5, 5.2), yaw=-np.pi / 2)
    rd = primary_ray_dirs(cam, 16, 32, 0.5)
    ro = jnp.broadcast_to(jnp.asarray(cam.pos), rd.shape)
    lc, lr = PT.get_light_sphere(scene, 0.0)
    lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3

    outs = {}
    for layout in ("scalar", "vec"):
        old = PK.PRIM_LAYOUT
        PK.PRIM_LAYOUT = layout
        try:
            outs[layout] = PT.trace_eye_paths_kernel(
                scene, ro, rd, 3, lc, lr, bounces=3, light_color=lcol,
                nee=True, interpret=True)
        finally:
            PK.PRIM_LAYOUT = old
    for a, b in zip(outs["scalar"], outs["vec"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pt_megakernel_rng_placement_invariant():
    """The kernel RNG is a pure function of (ray uid, seed): permuting
    the rays (with their uids) must permute every output BIT-EXACTLY —
    the property render_pt's adaptive compaction relies on for its
    adaptive==full trajectory identity (a block/lane-positional stream,
    like the hardware PRNG this replaced, fails this)."""
    import jax
    from ascii_renderer_tpu.backends import pathtrace as PT
    from ascii_renderer_tpu.scene.demo import create_demo_scene
    from ascii_renderer_tpu.atlas.io import demo_atlas
    from ascii_renderer_tpu.core.camera import Camera, primary_ray_dirs

    sb = create_demo_scene()
    sb.set_atlas(demo_atlas())
    scene = sb.build()
    cam = Camera.create(pos=(0, 2.5, 5.2), yaw=-np.pi / 2)
    rd = primary_ray_dirs(cam, 16, 128, 0.5).reshape(-1, 3)  # 2048 rays
    ro = jnp.broadcast_to(jnp.asarray(cam.pos), rd.shape)
    lc, lr = PT.get_light_sphere(scene, 0.0)
    lcol = jnp.asarray((16.86, 10.76, 8.2)) * 1.3
    R = rd.shape[0]
    perm = np.random.default_rng(7).permutation(R)

    base = PT.trace_eye_paths_kernel_packed(
        scene, ro, rd, 5, lc, lr, bounces=3, light_color=lcol, nee=True,
        interpret=True, ray_uid=jnp.arange(R, dtype=jnp.int32))
    shuf = PT.trace_eye_paths_kernel_packed(
        scene, ro, jnp.asarray(rd)[perm], 5, lc, lr, bounces=3,
        light_color=lcol, nee=True, interpret=True,
        ray_uid=jnp.asarray(perm, jnp.int32))
    for a, b in zip(base, shuf):
        np.testing.assert_array_equal(np.asarray(a)[perm], np.asarray(b))


def test_hash_unit_jitter_stream_sanity():
    """backends.pathtrace._hash_unit (the jnp mirror of the kernel's
    lowbias32 draw, used for placement-invariant AA jitter): range,
    determinism, seed sensitivity, neighbor decorrelation, and mean."""
    from ascii_renderer_tpu.backends.pathtrace import _hash_unit

    uid = jnp.arange(1 << 14, dtype=jnp.int32)
    a = np.asarray(_hash_unit(uid, jnp.int32(42), 0x40000001))
    b = np.asarray(_hash_unit(uid, jnp.int32(42), 0x40000001))
    c = np.asarray(_hash_unit(uid, jnp.int32(43), 0x40000001))
    d = np.asarray(_hash_unit(uid, jnp.int32(42), 0x40000002))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.1 and np.abs(a - d).max() > 0.1
    assert a.min() >= 0.0 and a.max() < 1.0
    assert abs(a.mean() - 0.5) < 0.01
    assert abs(np.corrcoef(a[:-1], a[1:])[0, 1]) < 0.05
