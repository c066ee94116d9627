"""Tests for the round-3 headline raster path: the fused Pallas 2DH setup
(ops/setup2dh) and the depth-sorted grouped bin walk (ops/raster_group,
kernel="subtile3"). Oracle strategy per SURVEY §4: every new kernel gets
a pure-jnp twin / the scan-oracle comparison the older generations use."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ascii_renderer_tpu.backends import raster as R
from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.scene.builder import SceneBuilder


def _rand_scene():
    return (SceneBuilder().set_env_light([0.2, 0.2, 0.25], 1.0)
            .add_dir_light([-0.5, -0.7, -0.6], [1, 1, 1], 0.9).build())


def _rand_soup(T, seed=5):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-2, 2, (3 * T, 3)).astype(np.float32)
    nrm = rng.normal(size=(3 * T, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    col = rng.uniform(0.2, 1.0, (3 * T, 3)).astype(np.float32)
    return pos, nrm, col


def test_fused_setup_matches_xla_setup():
    """setup_2dh_fused must reproduce every setup_2dh output channel on
    valid triangles (the kernel is the same math in VMEM; on TPU it was
    measured bit-identical, here interpret mode allows tiny FMA noise)."""
    from ascii_renderer_tpu.ops.setup2dh import setup_2dh_fused

    T = 700
    pos, nrm, col = _rand_soup(T)
    attrs = np.concatenate([nrm, col], axis=1)
    pos9 = R.positions_to_pos9(jnp.asarray(pos))
    attrs_t = jnp.asarray(attrs.reshape(T, 18).T)
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    mvp = R.camera_mvp(cam, 48, 96, 0.5)
    ach = R.setup_2dh(pos9, attrs_t, mvp, 48, 96)
    cm, bbox = setup_2dh_fused(pos9, attrs_t, mvp, 48, 96)
    cm = np.asarray(cm).reshape(cm.shape[0], -1)[:, :T]
    ok = np.asarray(ach["valid"])
    assert np.array_equal(np.asarray(bbox["valid"])[:T], ok)
    names = ("e0a", "e0b", "e0c", "e1a", "e1b", "e1c", "e2a", "e2b",
             "e2c", "zx", "zy", "zc")
    for i, nm in enumerate(names):
        a = np.asarray(ach[nm])[ok]
        np.testing.assert_allclose(cm[i][ok], a, rtol=5e-4, atol=1e-5,
                                   err_msg=nm)
    for j, nm in enumerate(R._plane_keys_2dh(6)):
        a = np.asarray(ach[nm])[ok]
        np.testing.assert_allclose(cm[16 + j][ok], a, rtol=5e-4,
                                   atol=1e-5, err_msg=nm)
    for k, nm in enumerate(("bx0", "bx1", "by0", "by1")):
        a = np.asarray(ach[nm])[ok]
        b = np.asarray(bbox[nm])[:T][ok]
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-2, err_msg=nm)
    # id iota channel + pad-slot validity
    assert np.allclose(cm[12], np.arange(T))
    assert not np.asarray(bbox["valid"])[T:].any()


def _check_vs_scan(pos, nrm, col, scene, cam, big_cap, rows=48, cols=96,
                   max_bad=6):
    T = pos.shape[0] // 3
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    f_scan = jax.jit(functools.partial(R.render_soup, rows=rows, cols=cols,
                                       pixel_aspect=0.5, method="scan"))
    f_3 = jax.jit(functools.partial(
        R.render_soup, rows=rows, cols=cols, pixel_aspect=0.5,
        method="subtile3", v_cap=4096, big_cap=big_cap, r_cap=32 * 512,
        pair_cap=8 * T + big_cap * 48 * 8 + 4096,
        tile_cap=(-(-rows // 8)) * (-(-cols // 128)) * 8))
    a = np.asarray(f_scan(*args))
    b = np.asarray(f_3(*args))
    bad = (np.abs(a - b).max(-1) > 2e-3).sum()
    assert bad <= max_bad, f"{bad} pixels differ from the scan oracle"


def test_subtile3_matches_scan_oracle():
    pos, nrm, col = _rand_soup(3000)
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    _check_vs_scan(pos, nrm, col, _rand_scene(), cam, big_cap=2048)


def test_subtile3_near_plane_crossers():
    s = 5.0
    floor = [(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)]
    wall = [(-s, 0, -s), (-s, 4, -s), (s, 4, -s), (s, 0, -s)]

    def qt(q):
        a, b, c, d = q
        return [a, b, c, a, c, d]

    pos = np.asarray(qt(floor) + qt(wall), np.float32)
    nrm = np.zeros_like(pos)
    nrm[:6] = (0, 1, 0)
    nrm[6:] = (0, 0, 1)
    col = np.tile(np.asarray([[0.7, 0.6, 0.5]], np.float32), (12, 1))
    cam = Camera.create(pos=(0.0, 1.0, 2.0), yaw=-1.57, pitch=-0.5)
    _check_vs_scan(pos, nrm, col, _rand_scene(), cam, big_cap=16)


def test_subtile3_point_light_scene():
    scene = (SceneBuilder().set_env_light([0.15, 0.15, 0.2], 1.0)
             .add_point_light([1.0, 2.0, 1.0], [1.0, 0.9, 0.8], 1.0)
             .build())
    pos, nrm, col = _rand_soup(2000, seed=9)
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    _check_vs_scan(pos, nrm, col, scene, cam, big_cap=1024)


def test_subtile3_overflow_detected_and_retry_exact():
    """Undersized grouped caps must be detected via diag (n_used over the
    bin cap / n_rows / n_pairs) and the retried render must match the
    generously-capped one (no silent drops)."""
    pos, nrm, col = _rand_soup(1200, seed=3)
    scene = _rand_scene()
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, kernel="subtile3",
              v_cap=4096, big_cap=512)
    tiny = jax.jit(functools.partial(
        R.render_soup_diag, r_cap=64, pair_cap=4096, tile_cap=8, **kw))
    _rgb_t, diag = tiny(*args)
    counts = tuple(int(diag[k]) for k in
                   ("n_valid", "n_big", "n_rows", "n_pairs", "n_tiles_nz"))
    assert counts[2] > 64 or counts[3] > 4096 or counts[4] > 8
    caps = R.suggest_caps_grouped(*counts)
    assert caps[2] >= counts[2] and caps[3] >= counts[3]
    assert caps[4] >= counts[4]
    # production retry loop (RasterBackend.render): a TRUNCATED render
    # undercounts n_rows/n_used (they are derived from the pairs that fit
    # pair_cap), so with the tight margin policy convergence can take
    # more than one retry; caps grow monotonically and n_pairs is always
    # exact, so it converges within the backend's 4-attempt budget.
    d2 = diag
    a = None
    for _ in range(4):
        retry = jax.jit(functools.partial(
            R.render_soup_diag, r_cap=caps[2], pair_cap=caps[3],
            tile_cap=caps[4], **kw))
        a, d2 = retry(*args)
        counts = tuple(int(d2[k]) for k in
                       ("n_valid", "n_big", "n_rows", "n_pairs",
                        "n_tiles_nz"))
        if all(c <= cap for c, cap in zip(counts[1:], caps[1:])):
            break
        caps = R.suggest_caps_grouped(*counts)
    big = jax.jit(functools.partial(
        R.render_soup_diag, r_cap=32 * 512, pair_cap=1 << 17,
        tile_cap=48, **kw))
    b, _ = big(*args)
    assert all(int(d2[k]) <= c for k, c in
               zip(("n_rows", "n_pairs", "n_tiles_nz"),
                   (caps[2], caps[3], caps[4])))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_assemble_group_image_roundtrip():
    """assemble_group_image must place every bin's 8x16 block at its
    (tile, subtile) screen location and background-fill uncovered bins."""
    from ascii_renderer_tpu.ops import raster_group as RG

    tiles_y, tiles_x = 3, 1
    n_tiles = tiles_y * tiles_x
    n_bins = n_tiles * 8
    grp_cap = 2
    rng = np.random.default_rng(0)
    gbins = rng.permutation(n_bins)[:grp_cap * 8].astype(np.int32)
    vals = rng.normal(size=(grp_cap, 8, 128)).astype(np.float32)
    img = np.asarray(RG.assemble_group_image(
        jnp.asarray(vals), jnp.asarray(gbins), n_tiles, tiles_y, tiles_x,
        24, 128, fill=-7.0))
    expect = np.full((24, 128), -7.0, np.float32)
    for slot, b in enumerate(gbins):
        t, s = b // 8, b % 8
        ty, tx = t // tiles_x, t % tiles_x
        g, lane = slot // 8, slot % 8
        expect[ty * 8:(ty + 1) * 8, tx * 128 + s * 16:tx * 128 + (s + 1) * 16] = \
            vals[g, :, lane * 16:(lane + 1) * 16]
    np.testing.assert_array_equal(img, expect)


@pytest.mark.slow
def test_perf_variant_flags_bit_identical():
    """The perf A/B knobs must not change output: SHADE_TABLE_W pads the
    deferred-shade gather width (cols past 3A+3 are junk that is never
    read) and CHUNK_RG only re-slabs the walk's DMA chunking. Render the
    same frame under each flag value and require bitwise equality with
    the defaults (tools/ab_slope.py relies on this invariance)."""
    from ascii_renderer_tpu.ops import raster_group as RG

    pos, nrm, col = _rand_soup(900, seed=11)
    scene = _rand_scene()
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    T = pos.shape[0] // 3
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, method="subtile3",
              v_cap=4096, big_cap=1024, r_cap=32 * 512,
              pair_cap=8 * T + 1024 * 48 * 8 + 4096,
              tile_cap=(-(-48 // 8)) * (-(-96 // 128) or 1) * 8)

    def render():
        # fresh callable per variant: jit must retrace under the flags
        return np.asarray(jax.jit(
            lambda *a: R.render_soup(*a, **kw))(*args))

    base = render()
    saved = (R.SHADE_TABLE_W, RG.CHUNK_RG)
    try:
        R.SHADE_TABLE_W = 24
        np.testing.assert_array_equal(render(), base)
        R.SHADE_TABLE_W = 32
        np.testing.assert_array_equal(render(), base)
        R.SHADE_TABLE_W = saved[0]
        RG.CHUNK_RG = 16
        np.testing.assert_array_equal(render(), base)
        RG.CHUNK_RG = saved[1]
        R.PACK_SPLIT = True  # contiguous split-pack (ops/pack)
        np.testing.assert_array_equal(render(), base)
        R.SHADE_TABLE_W = 32  # split + padded table width
        np.testing.assert_array_equal(render(), base)
    finally:
        R.SHADE_TABLE_W, RG.CHUNK_RG = saved
        R.PACK_SPLIT = False


def _multi_entry_walk_case(kernel, seed, T):
    pos, nrm, col = _rand_soup(T, seed=seed)
    scene = _rand_scene()
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col),
            scene, cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5,
              v_cap=4096, big_cap=1024, r_cap=32 * 512,
              pair_cap=8 * T + 1024 * 48 * 8 + 4096,
              tile_cap=(-(-48 // 8)) * (-(-96 // 128) or 1) * 8)
    a = np.asarray(jax.jit(functools.partial(
        R.render_soup, method="subtile3", **kw))(*args))
    b = np.asarray(jax.jit(functools.partial(
        R.render_soup, method=kernel, **kw))(*args))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_subtile5_bit_identical_to_subtile3():
    """The K2 walk (two entries per gather row, kernel=subtile5) must be
    bit-identical to the base grouped walk: same entry visit order per
    bin, same strict-less-than depth merge, and the expand matmul is a
    pure 0/1 selection (exact at HIGHEST precision). Random soups give
    odd CSR offsets, exercising the gskip sub-entry window."""
    for seed, T in ((5, 3000), (11, 900)):
        _multi_entry_walk_case("subtile5", seed, T)


@pytest.mark.slow
def test_subtile6_bit_identical_to_subtile3():
    """The K4 walk (four entries per gather row relaid to the K2 kernel
    format, kernel=subtile6) must also be bit-identical: the relayout is
    a pure permutation and gskip in [0, 3] masks mid-row bin starts."""
    for seed, T in ((5, 3000), (7, 1100)):
        _multi_entry_walk_case("subtile6", seed, T)


@pytest.mark.slow  # compile long pole (r4 item 6)
def test_subtile7_subtile8_bit_identical_to_subtile3():
    """The K-gather generations (K4/K8 slot gather relaid to the base
    single-entry layout, walked by the skip-window base kernel) must be
    bit-identical: the relayout is a pure permutation, the skip window
    masks exactly the leading mid-row entries of non-K-aligned bins, and
    the walk's visit order/merge are unchanged from subtile3."""
    for kernel in ("subtile7", "subtile8"):
        for seed, T in ((5, 3000), (11, 900)):
            _multi_entry_walk_case(kernel, seed, T)


@pytest.mark.slow
def test_setup_packed_and_srccopy_bit_identical():
    """The fused setup+pack kernel (SETUP_PACKED, ops/setup2dh
    setup_2dh_fused_packed) and the gather source copy (GATHER_SRC_COPY,
    +0.0 is exact on all finite values and kept by XLA) are layout-only
    perf knobs: render the K8 headline kernel under each toggle and
    require bitwise equality with the defaults."""
    from ascii_renderer_tpu.ops import raster_group as RG

    pos, nrm, col = _rand_soup(900, seed=13)
    scene = _rand_scene()
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    T = pos.shape[0] // 3
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, method="subtile8",
              v_cap=4096, big_cap=1024, r_cap=32 * 512,
              pair_cap=8 * T + 1024 * 48 * 8 + 4096,
              tile_cap=(-(-48 // 8)) * (-(-96 // 128) or 1) * 8)

    def render():
        return np.asarray(jax.jit(
            lambda *a: R.render_soup(*a, **kw))(*args))

    base = render()
    saved = (R.SETUP_PACKED, R.PACK_SPLIT16, RG.GATHER_SRC_COPY)
    try:
        R.SETUP_PACKED = not saved[0]
        if not R.SETUP_PACKED:
            R.PACK_SPLIT16 = True  # the two-kernel alternative
        np.testing.assert_array_equal(render(), base)
        R.PACK_SPLIT16 = False  # single wide pack, lane slices
        np.testing.assert_array_equal(render(), base)
        R.SETUP_PACKED, R.PACK_SPLIT16 = saved[0], saved[1]
        RG.GATHER_SRC_COPY = True
        np.testing.assert_array_equal(render(), base)
    finally:
        R.SETUP_PACKED, R.PACK_SPLIT16, RG.GATHER_SRC_COPY = saved


def test_gather_full_rows_bit_identical():
    """GATHER_FULL_ROWS (r5 default: the full-row pair gather that
    restored the fast row-DMA path — see raster_group.py:89) is a
    layout-only knob: gathering full 32-lane rows then slicing must be
    bitwise equal to the sliced-source gather it replaced."""
    from ascii_renderer_tpu.ops import raster_group as RG

    pos, nrm, col = _rand_soup(900, seed=17)
    scene = _rand_scene()
    cam = Camera.create(pos=(2.4, 1.6, 2.9), yaw=-2.25, pitch=-0.32)
    T = pos.shape[0] // 3
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, method="subtile8",
              v_cap=4096, big_cap=1024, r_cap=32 * 512,
              pair_cap=8 * T + 1024 * 48 * 8 + 4096,
              tile_cap=(-(-48 // 8)) * (-(-96 // 128) or 1) * 8)

    def render():
        return np.asarray(jax.jit(
            lambda *a: R.render_soup(*a, **kw))(*args))

    saved = RG.GATHER_FULL_ROWS
    try:
        RG.GATHER_FULL_ROWS = True
        on = render()
        RG.GATHER_FULL_ROWS = False
        off = render()
    finally:
        RG.GATHER_FULL_ROWS = saved
    np.testing.assert_array_equal(on, off)


@pytest.mark.slow
def test_subtile6_near_plane_crossers_match_subtile3():
    s = 5.0
    floor = [(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)]
    wall = [(-s, 0, -s), (-s, 4, -s), (s, 4, -s), (s, 0, -s)]

    def qt(q):
        a, b, c, d = q
        return [a, b, c, a, c, d]

    pos = np.asarray(qt(floor) + qt(wall), np.float32)
    nrm = np.zeros_like(pos)
    nrm[:6] = (0, 1, 0)
    nrm[6:] = (0, 0, 1)
    col = np.tile(np.asarray([[0.7, 0.6, 0.5]], np.float32), (12, 1))
    cam = Camera.create(pos=(0.0, 1.0, 2.0), yaw=-1.57, pitch=-0.5)
    scene = _rand_scene()
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, v_cap=4096, big_cap=16,
              r_cap=32 * 512, pair_cap=65536,
              tile_cap=(-(-48 // 8)) * 8)
    a = np.asarray(jax.jit(functools.partial(
        R.render_soup, method="subtile3", **kw))(*args))
    b = np.asarray(jax.jit(functools.partial(
        R.render_soup, method="subtile6", **kw))(*args))
    np.testing.assert_array_equal(a, b)


def test_subtile5_near_plane_crossers_match_subtile3():
    s = 5.0
    floor = [(-s, 0, -s), (s, 0, -s), (s, 0, s), (-s, 0, s)]
    wall = [(-s, 0, -s), (-s, 4, -s), (s, 4, -s), (s, 0, -s)]

    def qt(q):
        a, b, c, d = q
        return [a, b, c, a, c, d]

    pos = np.asarray(qt(floor) + qt(wall), np.float32)
    nrm = np.zeros_like(pos)
    nrm[:6] = (0, 1, 0)
    nrm[6:] = (0, 0, 1)
    col = np.tile(np.asarray([[0.7, 0.6, 0.5]], np.float32), (12, 1))
    cam = Camera.create(pos=(0.0, 1.0, 2.0), yaw=-1.57, pitch=-0.5)
    scene = _rand_scene()
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, v_cap=4096, big_cap=16,
              r_cap=32 * 512, pair_cap=65536,
              tile_cap=(-(-48 // 8)) * 8)
    a = np.asarray(jax.jit(functools.partial(
        R.render_soup, method="subtile3", **kw))(*args))
    b = np.asarray(jax.jit(functools.partial(
        R.render_soup, method="subtile5", **kw))(*args))
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_morton_reorder_is_permutation_and_renders_same():
    """geom/reorder: the Morton pass must be a true triangle permutation,
    and on a mesh without exact z-tie pixels at this pose the reordered
    soup must rasterize to the identical image (submission order only
    breaks exact depth ties — see the module docstring)."""
    from ascii_renderer_tpu.geom.reorder import reorder_soup
    from ascii_renderer_tpu.geom import meshes

    v, i = meshes.bunny_like(1500)
    pos, nrm, col = meshes.mesh_to_soup(v, i, color=(0.8, 0.7, 0.6))
    p2, n2, c2, perm = reorder_soup(pos, nrm, col)
    T = pos.shape[0] // 3
    assert sorted(perm.tolist()) == list(range(T))
    tri0 = np.asarray(pos).reshape(T, 9)
    tri2 = np.asarray(p2).reshape(T, 9)
    np.testing.assert_array_equal(tri0[perm], tri2)

    scene = _rand_scene()
    cam = Camera.create(pos=(2.4, 1.4, 2.8), yaw=-2.28, pitch=-0.3)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, method="subtile8",
              v_cap=4096, big_cap=64, r_cap=32 * 512,
              pair_cap=8 * T + 4096, tile_cap=(-(-48 // 8)) * 8)
    a = np.asarray(jax.jit(functools.partial(
        R.render_soup, **kw))(jnp.asarray(pos), jnp.asarray(nrm),
                              jnp.asarray(col), scene, cam))
    b = np.asarray(jax.jit(functools.partial(
        R.render_soup, **kw))(jnp.asarray(p2), jnp.asarray(n2),
                              jnp.asarray(c2), scene, cam))
    np.testing.assert_array_equal(a, b)


def test_bucket_depth_grouping_bit_identical():
    """DEPTH_GROUPING='bucket' (sort-free counting order) must render
    bit-identically to the exact depth sort: grouping is layout-only and
    the image assembly is a permutation-invariant bin gather."""
    from ascii_renderer_tpu.ops import raster_group as RG

    pos, nrm, col = _rand_soup(1200, seed=9)
    scene = _rand_scene()
    cam = Camera.create(pos=(2.5, 1.5, 3.0), yaw=-2.3, pitch=-0.3)
    T = pos.shape[0] // 3
    args = (jnp.asarray(pos), jnp.asarray(nrm), jnp.asarray(col), scene,
            cam)
    kw = dict(rows=48, cols=96, pixel_aspect=0.5, method="subtile8",
              v_cap=4096, big_cap=1024, r_cap=32 * 512,
              pair_cap=8 * T + 1024 * 48 * 8 + 4096,
              tile_cap=(-(-48 // 8)) * 8)

    def render():
        return np.asarray(jax.jit(
            lambda *a: R.render_soup(*a, **kw))(*args))

    base = render()
    saved = RG.DEPTH_GROUPING
    try:
        RG.DEPTH_GROUPING = "bucket"
        np.testing.assert_array_equal(render(), base)
    finally:
        RG.DEPTH_GROUPING = saved
