"""Sharded inverse-rendering training step (the framework's "training" path).

Optimizes soft-raster scene parameters (vertex positions + colors) to match
target images — gradients flow through the luminance -> glyph assignment
(BASELINE config 5). The step is a real SPMD program over a 2-D mesh:

  axis "dp"  — data parallel over target views (each device owns a view
               shard; the many-view analog of batch parallelism)
  axis "sp"  — spatial parallel over grid row bands (the sequence-parallel
               analog for this workload, SURVEY §5)

Parameters are replicated; each device renders only its (view-shard,
row-band) block, computes the local loss gradient, and grads are
psum'd over BOTH axes (the collective rides ICI). Optimizer: optax adam.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ascii_renderer_tpu.core.camera import Camera
from ascii_renderer_tpu.diff.soft_raster import soft_render, soft_luminance_loss


class TrainState(NamedTuple):
    verts: jnp.ndarray  # f32 [V, 3]
    colors: jnp.ndarray  # f32 [V, 3]
    opt_state: optax.OptState


def init_train_state(verts, colors, optimizer) -> TrainState:
    params = {"verts": jnp.asarray(verts), "colors": jnp.asarray(colors)}
    return TrainState(params["verts"], params["colors"],
                      optimizer.init(params))


def make_train_step(mesh: Mesh, faces, rows: int, cols: int, *,
                    optimizer=None, pixel_aspect: float = 1.0,
                    sigma: float = 1e-2, gamma: float = 1e-2,
                    ramp_len: int = 10):
    """Build the jitted sharded train step:

      step(state, cameras [B...], targets f32 [B, rows, cols, 3])
          -> (state', loss)

    B must divide mesh.shape['dp']; rows must divide mesh.shape['sp'].
    """
    optimizer = optimizer or optax.adam(1e-2)
    ndp = mesh.shape["dp"]
    nsp = mesh.shape["sp"]
    assert rows % nsp == 0
    band = rows // nsp

    def local_loss(params, cameras, targets):
        """Loss over this device's (view shard, row band)."""
        sp_i = jax.lax.axis_index("sp")

        def one_view(cam_leaf, target):
            img = soft_render(params["verts"], params["colors"], faces,
                              cam_leaf, rows, cols, pixel_aspect,
                              sigma=sigma, gamma=gamma)
            band_img = jax.lax.dynamic_slice_in_dim(img, sp_i * band, band, 0)
            return soft_luminance_loss(band_img, target, ramp_len)

        losses = jax.vmap(one_view)(cameras, targets)
        # soft_luminance_loss is a per-pixel MEAN over the local row band;
        # psum over 'sp' adds nsp band-means, so divide to keep the total
        # equal to the full-image mean regardless of mesh shape.
        return jnp.sum(losses) / nsp

    def sharded_step(state: TrainState, cameras: Camera, targets):
        params = {"verts": state.verts, "colors": state.colors}
        loss, grads = jax.value_and_grad(local_loss)(params, cameras, targets)
        # the only collectives in the framework: grad + loss reduction
        grads = jax.lax.psum(grads, axis_name=("dp", "sp"))
        loss = jax.lax.psum(loss, axis_name=("dp", "sp"))
        updates, opt_state = optimizer.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        return TrainState(params["verts"], params["colors"], opt_state), loss

    # Shardings: params/opt replicated; cameras + targets split over dp;
    # targets additionally split over sp rows.
    step = shard_map(
        sharded_step, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp", "sp")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def make_train_steps(mesh: Mesh, faces, rows: int, cols: int, *,
                     n_steps: int, optimizer=None, pixel_aspect: float = 1.0,
                     sigma: float = 1e-2, gamma: float = 1e-2,
                     ramp_len: int = 10):
    """Multi-step trainer: lax.scan n_steps optimizer steps inside ONE
    device dispatch (same semantics as calling make_train_step's step
    n_steps times on fixed cameras/targets — verified by test). At the
    bench's 36x96 scale a single step is host-dispatch-bound; scanning
    amortizes that overhead the way any production train loop would.

      steps(state, cameras, targets) -> (state', losses f32 [n_steps])
    """
    optimizer = optimizer or optax.adam(1e-2)
    one = make_train_step(mesh, faces, rows, cols, optimizer=optimizer,
                          pixel_aspect=pixel_aspect, sigma=sigma,
                          gamma=gamma, ramp_len=ramp_len)

    def steps(state: TrainState, cameras: Camera, targets):
        def body(st, _):
            st2, loss = one(st, cameras, targets)
            return st2, loss

        return jax.lax.scan(body, state, None, length=n_steps)

    return jax.jit(steps)


def make_targets_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("dp", "sp"))
