"""Multi-chip execution: rays sharded, scene replicated, gradients psum'd.

The reference has no distributed path (single-process std::thread,
SURVEY.md §2.3); the TPU-native scaling axis is the pixel/ray batch. We build
a 1-D device mesh over axis "rays", shard the pixel axis of the accumulation
buffer, replicate scene/BVH arrays, and in the differentiable path all-reduce
material/volume-parameter gradients with psum inside shard_map (XLA overlaps
the reduction with the backward computation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "rays") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Join the jax.distributed multi-host runtime (SURVEY.md §2.3 mapping:
    the reference's single-process parallel_for becomes a (process x
    local-device) world; collectives ride ICI within a slice and DCN across
    hosts). Parameters default from the environment:

      VPT_COORDINATOR  host:port of process 0 (also JAX_COORDINATOR_ADDRESS)
      VPT_NUM_PROCESSES / VPT_PROCESS_ID (also JAX_NUM_PROCESSES/JAX_PROCESS_ID)

    Returns True when the distributed runtime was initialized; False when no
    coordinator is configured (single-process mode — everything else works
    unchanged on the local devices). After this, jax.devices() is the GLOBAL
    device list and make_mesh() spans all hosts; shard_map/psum in the render
    and grad paths need no changes.

    On CPU the cross-process collectives use the gloo transport
    (jax_cpu_collectives_implementation), exercised by
    tests/test_distributed.py with a 2-process x 4-virtual-device world.
    """
    import os

    coordinator = (coordinator or os.environ.get("VPT_COORDINATOR")
                   or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not coordinator:
        return False
    if num_processes is None:
        num_processes = int(os.environ.get(
            "VPT_NUM_PROCESSES", os.environ.get("JAX_NUM_PROCESSES", "1")))
    if process_id is None:
        process_id = int(os.environ.get(
            "VPT_PROCESS_ID", os.environ.get("JAX_PROCESS_ID", "0")))
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return True


def local_shard_bounds(total: int) -> tuple[int, int]:
    """[lo, hi) slice of a `total`-sized leading axis owned by this process
    when sharded over the global device list (equal per-device blocks; the
    caller pads `total` to a multiple of the device count)."""
    devs = jax.devices()
    per = total // len(devs)
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    # the slice form assumes this process's devices are a contiguous run in
    # the global ordering; if a JAX version ever interleaves processes the
    # returned span would silently cover other processes' shards
    assert max(mine) - min(mine) + 1 == len(mine), (
        "process devices are not contiguous in jax.devices(); "
        f"indices={mine}")
    return min(mine) * per, (max(mine) + 1) * per


DIFF_PARAM_FIELDS = (
    "mat_emission", "mat_color", "mat_roughness", "mat_metallic",
    "mat_scattering", "mat_scanisotropy", "mat_trdepth", "grid_values",
)


def extract_params(ds):
    """Differentiable parameter pytree view of the scene."""
    return {k: getattr(ds, k) for k in DIFF_PARAM_FIELDS}


def insert_params(ds, params):
    return ds._replace(**params)


def make_sharded_render_fn(mesh: Mesh, shade_fn, width: int, height: int,
                           camera_id: int = 0, total_samples: int = 64,
                           seed: int = 1301081):
    """Forward render of one sample, pixels sharded over the mesh.

    Returns render(ds, sample_id) -> (R, 4) accumulation contribution with R
    sharded on axis "rays". The pixel count must divide the mesh size.
    """
    from ..render.state import camera_rays

    axis = mesh.axis_names[0]

    def local_render(ds, pixel_ids, sample_id):
        o, d = camera_rays(ds, camera_id, width, height, pixel_ids, sample_id,
                           total_samples, seed)
        radiance, alpha = shade_fn(ds, o, d, pixel_ids, sample_id)
        return jnp.concatenate([radiance, alpha[..., None]], axis=-1)

    sharded = jax.shard_map(
        local_render, mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(axis),
        check_vma=False,  # while_loop carries start unvarying (fresh zeros)
    )

    def render(ds, sample_id):
        pixel_ids = jnp.arange(width * height, dtype=jnp.uint32)
        return sharded(ds, pixel_ids, sample_id)

    return render


def make_grad_step(mesh: Mesh, shade_fn, width: int, height: int,
                   camera_id: int = 0, total_samples: int = 64,
                   seed: int = 1301081, lr: float = 1e-2,
                   samples_per_step: int = 1):
    """Full differentiable "training" step: render sharded rays, L2 loss
    against a target image, grads w.r.t. material/volume params all-reduced
    across the mesh, SGD update. This is the multi-chip path the driver
    dry-runs (rays = data parallel axis; params replicated like weights).

    samples_per_step: mini-batch S samples per pixel in one program (lanes =
    S x local pixels, per-lane sample ids) — amortizes per-op fixed costs on
    the VPU; the loss averages the S samples before the L2.
    """
    from ..render.state import camera_rays

    axis = mesh.axis_names[0]
    S = samples_per_step

    def local_step(ds, params, target_local, pixel_ids, sample_id):
        def loss_fn(p):
            ds_p = insert_params(ds, p)
            if S == 1:
                pix, samp = pixel_ids, sample_id
            else:
                N = pixel_ids.shape[0]
                pix = jnp.tile(pixel_ids, S)
                samp = jnp.repeat(
                    sample_id * S + jnp.arange(S, dtype=jnp.int32), N)
            o, d = camera_rays(ds_p, camera_id, width, height, pix,
                               samp, total_samples, seed)
            radiance, _ = shade_fn(ds_p, o, d, pix, samp)
            if S > 1:
                radiance = radiance.reshape(
                    S, pixel_ids.shape[0], 3).mean(axis=0)
            # mean over *global* pixels: local sum / global count
            err = jnp.sum((radiance - target_local) ** 2)
            return err / (width * height * 3)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        loss = jax.lax.psum(loss, axis)
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        return loss, new_params

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,  # while_loop carries start unvarying (fresh zeros)
    )

    def step(ds, params, target, sample_id):
        pixel_ids = jnp.arange(width * height, dtype=jnp.uint32)
        return sharded(ds, params, target, pixel_ids, sample_id)

    return step
