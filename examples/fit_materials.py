"""Inverse rendering of material parameters: recover a surface albedo and
volume scattering from a target image by gradient descent through the
volumetric path tracer (every parameter in parallel/mesh.py
DIFF_PARAM_FIELDS is differentiable; this demo perturbs the sphere's
color and scattering and recovers both).

Self-contained (procedural scene, no assets); runs on TPU or CPU.

    python examples/fit_materials.py [--steps 80] [--res 48] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=80)
    ap.add_argument("--res", type=int, default=48)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    import jax
    import jax.numpy as jnp
    import optax

    from vpt_tpu.parallel.mesh import extract_params, insert_params
    from vpt_tpu.render.state import camera_rays
    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.scene.testing import make_test_scene

    p = RenderParams(shader="volpathtrace", samples=args.samples,
                     resolution=args.res, bounces=4)
    r = Renderer(make_test_scene(sphere_steps=8), p, devices=1)

    img, _ = r.render(samples=args.samples)
    target = jnp.asarray(img.reshape(-1, 4)[:, :3])
    truth = extract_params(r.ds)

    # perturb: gray out every albedo, flatten the volume scattering
    fit = {"mat_color": jnp.full_like(truth["mat_color"], 0.5),
           "mat_scattering": jnp.full_like(truth["mat_scattering"], 0.2)}

    shade = r._make_shader()
    S = 4
    pix = jnp.arange(r.width * r.height, dtype=jnp.uint32)

    def loss_fn(fit, sample_id):
        ds_p = insert_params(r.ds, dict(truth, **fit))
        pixs = jnp.tile(pix, S)
        samps = jnp.repeat(
            sample_id * S + jnp.arange(S, dtype=jnp.int32), pix.shape[0])
        o, d = camera_rays(ds_p, 0, r.width, r.height, pixs, samps,
                           args.samples)
        radiance, _ = shade(ds_p, o, d, pixs, samps)
        return jnp.mean((radiance.reshape(S, -1, 3).mean(0) - target) ** 2)

    opt = optax.adam(args.lr)
    opt_state = opt.init(fit)

    @jax.jit
    def step(fit, opt_state, sample_id):
        loss, g = jax.value_and_grad(loss_fn)(fit, sample_id)
        updates, opt_state = opt.update(g, opt_state)
        fit = optax.apply_updates(fit, updates)
        # project to the physically valid domain (albedo in [0, 1],
        # scattering coefficients non-negative) — unconstrained steps can
        # leave it and produce NaN radiance
        fit = {"mat_color": jnp.clip(fit["mat_color"], 0.0, 1.0),
               "mat_scattering": jnp.clip(fit["mat_scattering"], 0.0, 1.0)}
        return loss, fit, opt_state

    def err(fit):
        return {k: float(np.abs(np.asarray(fit[k] - truth[k])).mean())
                for k in fit}

    e0 = err(fit)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        loss, fit, opt_state = step(fit, opt_state, jnp.int32(i))
        if loss0 is None:
            loss0 = float(loss)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.6f}", flush=True)
    e1 = err(fit)
    print(f"done in {time.time() - t0:.1f}s: loss {loss0:.6f} -> "
          f"{float(loss):.6f}")
    for k in e0:
        print(f"  {k}: MAE {e0[k]:.4f} -> {e1[k]:.4f}")
    assert float(loss) < loss0, "loss did not decrease"
    assert e1["mat_color"] < 0.5 * e0["mat_color"], "albedo not recovered"
    return float(loss0), float(loss), e0, e1


if __name__ == "__main__":
    main()
