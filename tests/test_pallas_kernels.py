"""Pallas kernel twins vs their jnp reference implementations (SURVEY §4
'kernel-vs-reference: every Pallas kernel gets an interpret-mode twin')."""

import numpy as np
import jax.numpy as jnp

from ascii_renderer_tpu.ascii.modal import modal_filter
from ascii_renderer_tpu.ops.ascii_kernel import modal_filter_pallas


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
