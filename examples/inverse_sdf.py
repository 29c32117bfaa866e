"""Inverse rendering of an SDF voxel grid — the BASELINE north-star
workload (gradients w.r.t. SDF grid values) as a runnable example.

A target DEPTH map is rendered from a voxel-grid SDF sphere carrying a
bump on its camera-facing surface. Optimization starts from the clean
sphere and recovers the bump by Adam on the L2 depth loss: gradients reach
the voxels through the sphere tracer via the implicit-function-theorem
`reattach_t` (ops/sdf.py) — the march itself is non-differentiable; the
hit distance is reattached analytically, exactly as in the full radiance
shaders.

Why depth supervision: hit depth is MONOTONE in each voxel's value
(raising a front-surface voxel pushes the zero crossing deeper —
tests/test_grad.py pins dt/dvalue against finite differences), so the
loss landscape is benign and the recovery is deterministic (camera rays,
no Monte-Carlo noise). A pure-RGB loss also differentiates (the radiance
shaders carry the same reattach; see fit_materials.py for radiance-loss
optimization of materials/volumes), but shading is non-monotone in shape
at voxel scale and silhouette changes have zero gradient (visibility is a
step function), so practical geometry-from-images pipelines supervise
depth/normals alongside color — this example shows that workload.

Self-contained (procedural scene, no assets); runs on TPU or CPU.

    python examples/inverse_sdf.py [--steps 200] [--res 64] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--maxiter", type=int, default=200,
                    help="sphere-trace iteration cap")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from vpt_tpu.ops.sdf import reattach_t, spheretrace
    from vpt_tpu.render.state import camera_rays
    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.scene.testing import make_sdf_test_scene

    p = RenderParams(shader="implicit", samples=1, resolution=args.res,
                     bounces=2, spheretrace_maxiter=args.maxiter)
    r = Renderer(make_sdf_test_scene(grid=True, analytic=True, light=True),
                 p, devices=1)

    # ground truth = the scene's sphere grid + a Gaussian bump on the
    # camera-facing (+z) surface (camera looks down -z from z=1.6; the
    # front face crosses zero near lattice z=18 of 24 — tests/test_grad.py)
    clean = np.asarray(r.ds.grid_values)  # (1, n, n, n)
    n = clean.shape[1]
    ii = np.arange(n, dtype=np.float64)
    Z, Y, X = np.meshgrid(ii, ii, ii, indexing="ij")
    bump = -0.045 * np.exp(
        -((Z - 18.0) ** 2 + (Y - 11.5) ** 2 + (X - 11.5) ** 2) / (2 * 2.5 ** 2)
    ).astype(np.float32)  # negative values push the surface outward
    bumped = jnp.asarray(clean + bump[None])

    # deterministic center-of-pixel camera rays (total_samples=1)
    pix = jnp.arange(r.width * r.height, dtype=jnp.uint32)
    o, d = camera_rays(r.ds, 0, r.width, r.height, pix, jnp.int32(0), 1)

    # held-out validation view: the same bundle rotated 20 deg about the
    # sphere's vertical axis — never supervised, so improvement there means
    # actual surface geometry was recovered, not just the training depths
    th = np.deg2rad(20.0)
    R = jnp.asarray(np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                              [-np.sin(th), 0, np.cos(th)]], np.float32))
    o_val, d_val = o @ R.T, d @ R.T

    def depth(grid_values, o, d):
        ds_p = r.ds._replace(grid_values=grid_values)
        hit, t_det, _, _ = spheretrace(ds_p, o, d, args.maxiter)
        return reattach_t(ds_p, o, d, t_det, hit), hit

    target_depth, target_hit = depth(bumped, o, d)
    target_depth = jax.lax.stop_gradient(target_depth)
    val_depth, val_hit = depth(bumped, o_val, d_val)

    def loss_fn(grid_values):
        t, hit = depth(grid_values, o, d)
        # the bump stays inside the silhouette, so hit masks agree; guard
        # with the conjunction anyway (visibility itself has no gradient)
        m = (hit & target_hit).astype(jnp.float32)
        return jnp.sum(m * (t - target_depth) ** 2) / jnp.sum(m)

    @jax.jit
    def val_mae(grid_values):
        t, hit = depth(grid_values, o_val, d_val)
        m = (hit & val_hit).astype(jnp.float32)
        return jnp.sum(m * jnp.abs(t - val_depth)) / jnp.sum(m)

    opt = optax.adam(args.lr)
    gv = jnp.asarray(clean)  # start: clean sphere, no bump
    opt_state = opt.init(gv)

    @jax.jit
    def step(gv, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(gv)
        updates, opt_state = opt.update(g, opt_state)
        return loss, optax.apply_updates(gv, updates), opt_state

    e0 = float(val_mae(gv))
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        loss, gv, opt_state = step(gv, opt_state)
        if loss0 is None:
            loss0 = float(loss)
        if i % 25 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  depth loss {float(loss):.3e}  "
                  f"held-out view depth MAE {float(val_mae(gv)):.5f}",
                  flush=True)
    e1 = float(val_mae(gv))
    print(f"done in {time.time() - t0:.1f}s: train loss {loss0:.3e} -> "
          f"{float(loss):.3e}; held-out-view depth MAE {e0:.5f} -> {e1:.5f}")
    # a single supervised view cannot constrain occluded surface, so the
    # held-out error shrinks but does not vanish — add views to drive it
    # further (each is one more (o, d) bundle in the loss)
    assert float(loss) < 0.1 * loss0, "train loss did not converge"
    assert e1 < 0.7 * e0, f"held-out view did not improve ({e0} -> {e1})"
    return float(loss0), float(loss), e0, e1


if __name__ == "__main__":
    main()
