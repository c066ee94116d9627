"""Modal (majority-vote) glyph smoothing — order-exact Boyer-Moore.

Reproduces the reference shader's two-pass neighborhood vote
(js/ascii_pass_shader.js:77-138) bit-for-bit:

  pass 1: Boyer-Moore majority candidate over the K x K neighborhood
          (center excluded, UI-override neighbors excluded, out-of-grid
          neighbors CLAMPED to the edge — i.e. edge cells revote their
          border neighbors), scanning dy then dx in ascending order.
  pass 2: count true votes for the candidate.
  adopt:  candidate replaces the center's ramp index iff
          cand >= 0 and votes >= thresh and cand != baseIdx
          (color/tint is NOT changed - ascii_pass_shader.js:181-183).

Boyer-Moore is order-dependent when no strict majority exists, so the scan
order here must never change.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


_PAD = 3  # MAX_MODE_RADIUS


def _shifted(padded: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Neighbor lookup with edge clamping (ref: clampCell,
    ascii_pass_shader.js:71-73): one edge-pad (done by the caller) + static
    slices — TPU-friendly, no gathers, XLA fuses the slices."""
    h = padded.shape[0] - 2 * _PAD
    w = padded.shape[1] - 2 * _PAD
    return jax.lax.slice(padded, (_PAD + dy, _PAD + dx),
                         (_PAD + dy + h, _PAD + dx + w))


def _offsets(radius: int):
    # Scan order matches the GLSL loops: dy -3..3 outer, dx -3..3 inner,
    # entries outside `radius` or at the center skipped.
    out = []
    for dy in range(-3, 4):
        for dx in range(-3, 4):
            if abs(dy) > radius or abs(dx) > radius:
                continue
            if dy == 0 and dx == 0:
                continue
            out.append((dy, dx))
    return out


def modal_candidate(idx: jnp.ndarray, override: jnp.ndarray, radius: int):
    """Per-cell Boyer-Moore candidate + true vote count.

    Args:
      idx: int32 [H, W] ramp indices (pre-smoothing).
      override: bool [H, W] cells carrying an alpha override (excluded as
        voters everywhere they appear as neighbors).
      radius: 1 (3x3), 2 (5x5) or 3 (7x7) — static.

    Returns (cand int32 [H,W] with -1 = none, votes int32 [H,W]).
    """
    offs = _offsets(radius)
    idx_p = jnp.pad(idx, _PAD, mode="edge")
    ovr_p = jnp.pad(override, _PAD, mode="edge")
    neigh = [(_shifted(idx_p, dy, dx),
              jnp.logical_not(_shifted(ovr_p, dy, dx))) for dy, dx in offs]

    cand = jnp.full(idx.shape, -1, dtype=jnp.int32)
    cnt = jnp.zeros(idx.shape, dtype=jnp.int32)
    for ni, valid in neigh:
        zero = cnt == 0
        match = ni == cand
        new_cand = jnp.where(valid & zero, ni, cand)
        new_cnt = jnp.where(
            valid,
            jnp.where(zero, 1, jnp.where(match, cnt + 1, cnt - 1)),
            cnt,
        )
        cand, cnt = new_cand, new_cnt

    votes = jnp.zeros(idx.shape, dtype=jnp.int32)
    for ni, valid in neigh:
        votes = votes + (valid & (ni == cand)).astype(jnp.int32)
    return cand, votes


def modal_filter(idx: jnp.ndarray, override: jnp.ndarray, radius: int,
                 thresh: int) -> jnp.ndarray:
    """Apply the smoothing decision (ascii_pass_shader.js:169-185).
    Override cells are never modified (handled by the caller's final select
    too, but masked here for clarity)."""
    cand, votes = modal_candidate(idx, override, radius)
    adopt = (cand >= 0) & (votes >= thresh) & (cand != idx) & jnp.logical_not(override)
    return jnp.where(adopt, cand, idx)
