"""High-level offline renderer: scene file -> image.

Equivalent of run_offline (/root/reference/apps/ypathtrace/ypathtrace.cpp:41-87):
load -> tesselate -> flatten(+BVH) -> lights -> progressive sample loop ->
linear image. The per-sample step is one jitted program; the sample loop is a
host loop (progressive rendering keeps every intermediate image valid, and is
the natural checkpoint/resume granularity — SURVEY.md §5).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .render import state as RS
from .render.integrator import (
    make_debug_shader,
    make_eyelight_shader,
    make_path_shader,
)
from .render.lights import build_lights_static
from .scene.flatten import flatten_scene
from .scene.json_io import load_json_scene
from .scene.subdiv import tesselate_surfaces

SHADER_NAMES = [
    "volpathtrace", "pathtrace", "naive", "eyelight", "normal", "texcoord",
    "color", "implicit", "implicit_normal",
]


@dataclass
class RenderParams:
    """pathtrace_params (yocto_pathtrace.h:87-99)."""

    camera: int = 0
    resolution: int = 720
    shader: str = "pathtrace"
    samples: int = 512
    bounces: int = 4
    pratio: int = 8
    exposure: float = 0.0
    filmic: bool = False
    noimplicit_mis: bool = False
    spheretrace_maxiter: int = 450
    seed: int = 1301081
    # extra wavefront iterations funding opacity-passthrough crossings
    # (reference bounce-rewind parity, yocto_pathtrace.cpp:607-611). -1 =
    # auto (8 when the scene can produce opacity < 1, else 0). The rewind
    # makes opacity probabilistic transparency, so truncating a path after
    # k crossings biases by at most (1-opacity)^k x radiance-behind — for
    # stacks deeper than 8 layers of strong transparency raise this knob
    # (pinned by tests/test_renderer.py::test_opacity_extra_budget_bound).
    opacity_extra: int = -1


class Renderer:
    def __init__(self, scene, params: RenderParams | None = None,
                 progress=None, devices: int | None = None):
        """devices: number of local devices to shard pixels over (default all
        of jax.devices()); 1 disables sharding. Counter-based per-pixel RNG
        makes the sharded render per-pixel identical to the single-device
        one up to XLA compilation differences (separately compiled programs
        may place FMA contractions differently; tests/test_renderer.py pins
        last-ulp agreement)."""
        from .runtime import enable_compile_cache

        enable_compile_cache()
        self.params = params or RenderParams()
        self.n_devices = (len(jax.devices()) if devices is None
                          else max(1, min(devices, len(jax.devices()))))
        p = progress or (lambda *_: None)
        if isinstance(scene, str):
            p("load scene")
            from .scene.sceneio import load_scene

            scene = load_scene(scene)
        self.scene = scene
        p("tesselate")
        tesselate_surfaces(scene)
        p("flatten + bvh")
        self.arrays = flatten_scene(scene)
        p("lights")
        self.lights = build_lights_static(self.arrays)
        self.n_envs = len(scene.environments)
        p("upload")
        self.ds = jax.tree.map(jnp.asarray, self.arrays)
        cam = scene.cameras[self.params.camera]
        self.width, self.height = RS.image_size(cam.aspect, self.params.resolution)
        self._step = None
        self._chunk = None

    def _env_meta(self):
        """Static per-environment texture metadata (off, w, h, linear):
        known at trace time, so the shader folds env addressing into
        constants and skips the per-ray metadata gathers."""
        import numpy as _np

        a = self.arrays
        out = []
        for t in _np.asarray(a.env_tex):
            t = int(t)
            if t >= 0:
                out.append((int(a.tex_offset[t]), int(a.tex_width[t]),
                            int(a.tex_height[t]), bool(a.tex_linear[t])))
            else:
                out.append(None)
        return out

    def _make_shader(self):
        """Shader factories return shade(ds, o, d, pixel, sample)."""
        p = self.params
        s = p.shader
        if s in ("volpathtrace", "pathtrace", "naive"):
            import numpy as _np

            mat_types = frozenset(
                int(t) for t in _np.unique(self.arrays.mat_type))
            a = self.arrays
            tex_slots = frozenset(
                name for name, arr in (
                    ("emission", a.mat_emission_tex),
                    ("color", a.mat_color_tex),
                    ("roughness", a.mat_roughness_tex),
                    ("scattering", a.mat_scattering_tex),
                    ("normal", a.mat_normal_tex),
                ) if (_np.asarray(arr) >= 0).any())
            # opacity can come from the material constant, vertex-color
            # alpha, or a bound color texture's alpha channel; only scenes
            # where it can drop below 1 pay for bounce-rewind parity
            # (integrator.py opacity_extra)
            has_opacity = bool(
                (_np.asarray(a.mat_opacity) < 1.0).any()
                or (_np.asarray(a.vert_color)[:, 3] < 1.0).any()
                or ("color" in tex_slots
                    and (_np.asarray(a.tex_pixels)[:, 3] < 1.0).any()))
            return make_path_shader(
                self.lights, self.n_envs, bounces=p.bounces,
                enable_volume=(s == "volpathtrace"), mis=(s != "naive"),
                naive=(s == "naive"), seed=p.seed, mat_types=mat_types,
                tex_slots=tex_slots,
                # the reference allows unlimited free crossings (its loop
                # counter rewinds); k extra iterations truncate paths after
                # k crossings with bias <= (1-opacity)^k x radiance behind
                # the stack (RenderParams.opacity_extra raises the budget)
                opacity_extra=(p.opacity_extra if p.opacity_extra >= 0
                               else (8 if has_opacity else 0)),
                can_opacity=has_opacity, env_meta=self._env_meta())
        if s == "eyelight":
            return make_eyelight_shader(
                self.lights, self.n_envs, bounces=p.bounces, seed=p.seed,
                env_meta=self._env_meta())
        if s in ("normal", "texcoord", "color"):
            return make_debug_shader(self.n_envs, s)
        if s in ("implicit", "implicit_normal"):
            from .render.implicit import make_implicit_shader

            return make_implicit_shader(
                self.lights, self.n_envs, params=p,
                normal_only=(s == "implicit_normal"))
        raise ValueError(f"unknown shader {s!r}")

    def _build_step(self, chunk: int = 1):
        """Jitted program advancing `chunk` samples (lax.scan) per dispatch —
        amortizes host->device dispatch latency, which dominates through the
        TPU tunnel. With n_devices > 1 the pixel axis is sharded over a 1-D
        device mesh via shard_map (scene replicated, no collectives in the
        forward render — the image is assembled on host fetch)."""
        p = self.params
        shade = self._make_shader()

        if self.n_devices > 1:
            from jax.sharding import PartitionSpec as PS

            from .parallel.mesh import make_mesh

            mesh = make_mesh(self.n_devices)
            axis = mesh.axis_names[0]
            P = self.width * self.height
            Ppad = P + (-P) % self.n_devices

            def local_render(ds, pixel_ids, sample_id):
                o, d = RS.camera_rays(
                    ds, p.camera, self.width, self.height, pixel_ids,
                    sample_id, p.samples, p.seed)
                radiance, alpha = shade(ds, o, d, pixel_ids, sample_id)
                return jnp.concatenate([radiance, alpha[..., None]], axis=-1)

            sharded = jax.shard_map(
                local_render, mesh=mesh,
                in_specs=(PS(), PS(axis), PS()), out_specs=PS(axis),
                check_vma=False)

            def one(ds, state):
                # pad ids to the mesh size; padded lanes redo the last pixel
                # and are sliced off, keeping per-pixel parity with 1 device
                ids = jnp.minimum(
                    jnp.arange(Ppad, dtype=jnp.uint32), jnp.uint32(P - 1))
                rgba = sharded(ds, ids, state.samples)[:P]
                return RS.RenderState(
                    accum=state.accum + rgba, samples=state.samples + 1)
        elif p.shader in ("implicit", "implicit_normal") and chunk > 1:
            # sample-batched implicit step: all `chunk` samples' rays in ONE
            # shade call. The sphere tracers' work-queue runs at a fixed
            # per-iteration cost, so a single 54k-ray sample leaves the
            # queue starved — S x R rays amortize every per-op fixed cost
            # and every gather S-fold (PERF.md r5: the per-sample scan left
            # the implicit shader at ~26k paths/s; batching is the largest
            # single lever). Identical per-(pixel,sample) RNG streams; the
            # S radiances sum before the accumulate (float-add reordering
            # only, same story as the pool renderer).
            S = chunk
            P = self.width * self.height

            def batched(ds, state):
                pix = jnp.tile(jnp.arange(P, dtype=jnp.uint32), S)
                samp = state.samples + jnp.repeat(
                    jnp.arange(S, dtype=jnp.int32), P)
                o, d = RS.camera_rays(ds, p.camera, self.width, self.height,
                                      pix, samp, p.samples, p.seed)
                radiance, alpha = shade(ds, o, d, pix, samp)
                rgba = jnp.concatenate(
                    [radiance, alpha[..., None]], axis=-1)
                rgba = jnp.sum(rgba.reshape(S, P, 4), axis=0)
                return RS.RenderState(accum=state.accum + rgba,
                                      samples=state.samples + S)

            return jax.jit(batched, donate_argnums=(1,))
        else:
            def one(ds, state):
                shade_bound = lambda o, d, pix, samp: shade(ds, o, d, pix, samp)
                return RS.render_sample(
                    shade_bound, ds, state, p.camera, self.width, self.height,
                    p.samples, p.seed)

        def step(ds, state):
            if chunk == 1:
                return one(ds, state)
            return jax.lax.scan(
                lambda st, _: (one(ds, st), None), state, None, length=chunk
            )[0]

        return jax.jit(step, donate_argnums=(1,))

    def _pool_config(self):
        """Path-pool regeneration renderer (render/pool.py) parameters for
        the path-shader family. The pool pays only ~mean-path-length
        iterations per sample instead of `bounces`, so it beats the
        fixed-depth scan at every bounce count (measured 2.4x at b8 and 8x
        at the published b64 config, PERF.md round 4). Returns None for
        non-path shaders (AOVs, eyelight, implicit keep the scan)."""
        p = self.params
        if p.shader not in ("volpathtrace", "pathtrace", "naive"):
            return None
        import numpy as _np

        mat_types = frozenset(int(t) for t in _np.unique(self.arrays.mat_type))
        a = self.arrays
        tex_slots = frozenset(
            name for name, arr in (
                ("emission", a.mat_emission_tex),
                ("color", a.mat_color_tex),
                ("roughness", a.mat_roughness_tex),
                ("scattering", a.mat_scattering_tex),
                ("normal", a.mat_normal_tex),
            ) if (_np.asarray(arr) >= 0).any())
        has_opacity = bool(
            (_np.asarray(a.mat_opacity) < 1.0).any()
            or (_np.asarray(a.vert_color)[:, 3] < 1.0).any()
            or ("color" in tex_slots
                and (_np.asarray(a.tex_pixels)[:, 3] < 1.0).any()))
        opacity_extra = (p.opacity_extra if p.opacity_extra >= 0
                         else (8 if has_opacity else 0))
        return dict(
            bounces=p.bounces, enable_volume=(p.shader == "volpathtrace"),
            mis=(p.shader != "naive"), naive=(p.shader == "naive"),
            seed=p.seed, mat_types=mat_types, tex_slots=tex_slots,
            opacity_extra=opacity_extra, can_opacity=has_opacity,
            env_meta=self._env_meta())

    @staticmethod
    def _pool_cfg_key(pool_cfg):
        """Hashable form of a pool shader config — the ONE cache-key recipe
        shared by the single-device and sharded pool program caches (a
        key addition applied to only one of them would reintroduce the
        ADVICE-r4 stale-program bug on the other)."""
        return tuple(sorted(
            (k, repr(sorted(v) if isinstance(v, frozenset) else v))
            for k, v in pool_cfg.items()))

    def _sharded_pool_plan(self, n: int):
        """Sharded-pool sizing — render and prewarm must agree on these
        (n_dev, P_loc, R_loc, batch) or prewarm compiles the wrong
        program."""
        n_dev = self.n_devices
        P = self.width * self.height
        P_loc = -(-P // n_dev)
        R_loc = min(P_loc, (1 << 20) // n_dev)
        batch = max(1, min(256, n, (2 ** 31 - 1) // (P_loc * n_dev)))
        return n_dev, P_loc, R_loc, batch

    def _get_sharded_pool_step(self, mesh, pool_cfg, b: int, single: bool,
                               iters_per_step: int, R_loc: int, P_loc: int):
        """Compiled sharded-pool program cache (counterpart of
        _get_pool_step; same key recipe via _pool_cfg_key)."""
        from .render import pool as PL

        if not hasattr(self, "_pool_steps"):
            self._pool_steps = {}
        key = ("sharded", self.n_devices, b, single, iters_per_step,
               self.params.camera, self.width, self.height,
               self._pool_cfg_key(pool_cfg))
        if key not in self._pool_steps:
            self._pool_steps[key] = PL.make_sharded_pool_step(
                mesh, n_lanes_per_shard=R_loc, pixels_per_shard=P_loc,
                lights=self.lights, n_envs=self.n_envs,
                camera=self.params.camera,
                width=self.width, height=self.height, batch_samples=b,
                total_samples=1 if single else 2,
                iters_per_step=iters_per_step, n_lanes=R_loc,
                **pool_cfg)
        return self._pool_steps[key]

    def _render_pool_sharded(self, n: int, progress, pool_cfg,
                             iters_per_step=None):
        """Sharded pool render: per-device work queues over a pixel-major
        partition (render/pool.py make_sharded_pool_step). Keeps pool-class
        throughput on multi-device renders (VERDICT r4: sharded renders
        previously fell back to the per-sample scan)."""
        from .parallel.mesh import make_mesh

        mesh = make_mesh(self.n_devices)
        n_dev, P_loc, R_loc, batch = self._sharded_pool_plan(n)
        P = self.width * self.height
        if iters_per_step is None:
            iters_per_step = self._auto_iters(P_loc, batch, R_loc)

        def get_step(b):
            return self._get_sharded_pool_step(
                mesh, pool_cfg, b, n == 1, iters_per_step, R_loc, P_loc)

        t0 = time.time()
        first = True
        self.compile_seconds = 0.0
        pst = None
        for s0 in range(0, n, batch):
            b = min(batch, n - s0)
            step, init = get_step(b)
            if pst is None:
                pst = init()
            else:
                pst = pst._replace(
                    next_w=jnp.zeros(n_dev, jnp.int32),
                    busy=jnp.ones(n_dev, jnp.int32))
            while True:
                pst, any_busy = step(self.ds, pst, jnp.int32(s0))
                busy = int(jax.device_get(any_busy))
                if first:
                    self.compile_seconds = time.time() - t0
                    first = False
                    if progress is not None and self.compile_seconds > 1.0:
                        progress(-1, n)
                if progress is not None:
                    frac = float(np.sum(jax.device_get(pst.next_w))) / (
                        P_loc * n_dev * b)
                    progress(min(int(s0 + b * frac), n), n)
                if not busy:
                    break
        accum = np.asarray(jax.jit(lambda a: a + 0.0)(pst.accum))[:P]
        img = (accum / n).reshape(self.height, self.width, 4)
        state = RS.RenderState(accum=jnp.asarray(accum), samples=jnp.int32(n))
        return img, state

    def _pool_batch(self, n: int) -> int:
        # one queue for the whole render when the i32 item counter allows:
        # fewer batch boundaries = fewer drain tails (64-cap only guards
        # gigapixel x kilo-spp renders)
        P = self.width * self.height
        return max(1, min(256, n, (2 ** 31 - 1) // P))

    def _get_pool_step(self, pool_cfg, b: int, single: bool,
                       iters_per_step: int):
        """Compiled pool program cache. The program depends on the batch
        size, on whether this is a single-sample render (center-of-pixel
        jitter), and on the shader config (params may be mutated in place
        between render() calls, e.g. by the interactive viewer — ADVICE
        r4); NOT on the total spp — cached across render() calls."""
        from .render import pool as PL

        if not hasattr(self, "_pool_steps"):
            self._pool_steps = {}
        R = min(self.width * self.height, 1 << 20)
        key = (b, single, iters_per_step, self.params.camera,
               self.width, self.height, self._pool_cfg_key(pool_cfg))
        if key not in self._pool_steps:
            raw = PL.make_pool_step(
                self.lights, self.n_envs, camera=self.params.camera,
                width=self.width, height=self.height, batch_samples=b,
                total_samples=1 if single else 2,
                iters_per_step=iters_per_step, n_lanes=R, **pool_cfg)
            self._pool_steps[key] = jax.jit(raw, donate_argnums=(1,))
        return self._pool_steps[key]

    def prewarm(self, samples: int | None = None, iters_per_step=None):
        """Compile this scene/params' production render program into the
        persistent compile cache WITHOUT rendering (cold-start path,
        PERF.md §6): run once — `--prewarm` on the CLI or tools/prewarm.py
        — and every later process start is warm (~seconds instead of the
        25-60 s cold XLA compile through the remote-compile tunnel).
        Returns compile seconds."""
        from .render import pool as PL

        t0 = time.time()
        n = samples if samples is not None else self.params.samples
        pool_cfg = self._pool_config()
        if pool_cfg is not None and self.n_devices == 1:
            b = self._pool_batch(n)
            P = self.width * self.height
            if iters_per_step is None:  # must match _render_pool's choice
                iters_per_step = self._auto_iters(P, b, min(P, 1 << 20))
            step = self._get_pool_step(pool_cfg, b, n == 1, iters_per_step)
            pst = PL.init_pool_state(min(P, 1 << 20), P)
            step.lower(self.ds, pst, jnp.int32(0)).compile()
            if n % b:  # the final partial sample batch is its own program
                tail = self._get_pool_step(pool_cfg, n % b, n == 1,
                                           iters_per_step)
                tail.lower(self.ds, pst, jnp.int32(0)).compile()
        elif pool_cfg is not None:
            # multi-device: render() routes to _render_pool_sharded, so
            # that is the program to warm (previously this branch compiled
            # the sharded SCAN program, which the real render never used)
            from .parallel.mesh import make_mesh

            mesh = make_mesh(self.n_devices)
            n_dev, P_loc, R_loc, batch = self._sharded_pool_plan(n)
            if iters_per_step is None:
                iters_per_step = self._auto_iters(P_loc, batch, R_loc)
            b = min(batch, n)
            step, init = self._get_sharded_pool_step(
                mesh, pool_cfg, b, n == 1, iters_per_step, R_loc, P_loc)
            step.lower(self.ds, init(), jnp.int32(0)).compile()
            if n % b:  # the final partial sample batch is its own program
                tail, tinit = self._get_sharded_pool_step(
                    mesh, pool_cfg, n % b, n == 1, iters_per_step,
                    R_loc, P_loc)
                tail.lower(self.ds, tinit(), jnp.int32(0)).compile()
        else:
            # scan path: mirror render()'s chunking exactly — chunk
            # max(1, min(8, n)), plus the chunk-1 tail program render()
            # compiles when n is not a multiple of the chunk
            chunk = max(1, min(8, n))
            state = RS.make_state(self.width, self.height)
            self._step = self._build_step(chunk).lower(
                self.ds, state).compile()
            self._chunk = chunk
            if n % chunk:
                self._build_step(1).lower(self.ds, state).compile()
        self.compile_seconds = time.time() - t0
        return self.compile_seconds

    @staticmethod
    def _auto_iters(P_local: int, b: int, R: int) -> int:
        """Pool iterations per dispatch. Every dispatch pays a fixed
        host-loop + tunnel cost that measured ~3-5 s on short-path scenes
        (r5 sweep on 04_head1: 32 -> 64 iters/dispatch = 2.3x wall);
        items-per-lane lower-bounds the real iteration count, so sizing
        the dispatch to it keeps dispatch counts ~E[path length] (small)
        while bounding drained-tail waste to under one dispatch."""
        return min(128, max(32, (P_local * b) // max(R, 1)))

    def _render_pool(self, n: int, progress, pool_cfg, iters_per_step=None):
        """Pool render loop (render/pool.py): sample batches of the global
        (pixel, sample) work queue; within a batch, dispatch
        fixed-iteration chunks until the queue drains."""
        from .render import pool as PL

        P = self.width * self.height
        R = min(P, 1 << 20)
        batch = self._pool_batch(n)
        if iters_per_step is None:
            iters_per_step = self._auto_iters(P, batch, R)

        def get_step(b):
            return self._get_pool_step(pool_cfg, b, n == 1, iters_per_step)

        t0 = time.time()
        pst = PL.init_pool_state(R, P)
        first = True
        self.compile_seconds = 0.0
        for s0 in range(0, n, batch):
            b = min(batch, n - s0)
            step = get_step(b)
            pst = pst._replace(
                next_w=jnp.int32(0), busy=jnp.int32(1))
            while True:
                pst = step(self.ds, pst, jnp.int32(s0))
                # ONE cheap i32 device_get per dispatch: fetching donated /
                # bool outputs through the remote-TPU tunnel measured ~6 s
                # per fetch (tools notes); i32 device_get tracks device time
                busy = int(jax.device_get(pst.busy))
                if first:
                    self.compile_seconds = time.time() - t0
                    first = False
                    if progress is not None and self.compile_seconds > 1.0:
                        progress(-1, n)
                if progress is not None:
                    frac = int(jax.device_get(pst.next_w)) / (P * b)
                    progress(min(int(s0 + b * frac), n), n)
                if not busy:
                    break
        accum = np.asarray(jax.jit(lambda a: a + 0.0)(pst.accum))
        img = (accum / n).reshape(self.height, self.width, 4)
        state = RS.RenderState(accum=jnp.asarray(accum),
                               samples=jnp.int32(n))
        return img, state

    def render(self, samples: int | None = None, progress=None,
               state: RS.RenderState | None = None, chunk: int = 8,
               checkpoint: str | None = None, checkpoint_every: int = 0):
        """Progressively render; returns (linear rgba image (H, W, 4), state).

        checkpoint: path to a .npz render checkpoint. If it exists, resume
        from it; periodically (every `checkpoint_every` samples, default:
        every chunk) and at completion the state is re-saved. Counter-based
        RNG makes the resumed render bit-identical to an uninterrupted one.
        """
        from .render import checkpoint as CK

        p = self.params
        n = samples if samples is not None else p.samples
        chunk = max(1, min(chunk, n))
        # path configs route to the pool renderer (same estimator,
        # ~E[path length]/bounces of the work); the scan path keeps serving
        # checkpointed / resumed renders (the pool's carried in-flight path
        # state is not a serializable checkpoint). Multi-device renders use
        # the sharded pool: per-device work queues over a pixel partition
        # (round 5; previously they fell back to the per-sample scan)
        if state is None and checkpoint is None:
            pool_cfg = self._pool_config()
            if pool_cfg is not None:
                if self.n_devices == 1:
                    return self._render_pool(n, progress, pool_cfg)
                return self._render_pool_sharded(n, progress, pool_cfg)
        if state is None and checkpoint is not None and os.path.exists(checkpoint):
            state = CK.load_checkpoint(checkpoint, p, self.width, self.height)
        if state is None:
            state = RS.make_state(self.width, self.height)
        if self._step is None or self._chunk != chunk:
            # AOT-compile so compile time is measured and reported separately
            # from render throughput (VERDICT r2 weak #8: cold starts were
            # minutes with nothing telling the user why)
            t0 = time.time()
            self._step = self._build_step(chunk).lower(
                self.ds, state).compile()
            self._chunk = chunk
            self.compile_seconds = time.time() - t0
            if progress is not None and self.compile_seconds > 1.0:
                progress(-1, n)  # signal: compile finished (see cli.py)
        done = int(state.samples)
        n = max(n, done)
        last_ck = done
        while done < n:
            if n - done < chunk:
                # tail with a chunk=1 program to hit the exact sample count
                t0 = time.time()
                tail = self._build_step(1).lower(self.ds, state).compile()
                self.compile_seconds_tail = time.time() - t0
                for _ in range(n - done):
                    state = tail(self.ds, state)
                done = n
            else:
                state = self._step(self.ds, state)
                done += chunk
            if progress is not None:
                progress(done, n)
            if (checkpoint is not None and done < n
                    and done - last_ck >= max(checkpoint_every, chunk)):
                CK.save_checkpoint(checkpoint, state, p, self.width, self.height)
                last_ck = done
        if checkpoint is not None:
            CK.save_checkpoint(checkpoint, state, p, self.width, self.height)
        img = np.asarray(RS.get_render(state))
        return img.reshape(self.height, self.width, 4), state

    def rays_per_sec(self, samples: int = 16, chunk: int = 8):
        """Throughput probe: camera paths per second over `samples`.

        Completion is forced with a device_get of the accumulator, not just
        block_until_ready: with donated buffers through the remote-TPU
        tunnel, block_until_ready was observed returning before the queued
        computations finished (absurd Gpath/s readings)."""
        step = self._build_step(chunk)
        state = RS.make_state(self.width, self.height)
        state = step(self.ds, state)  # compile + warm
        float(np.asarray(state.accum[0, 0]))
        iters = max(1, samples // chunk)
        t0 = time.time()
        for _ in range(iters):
            state = step(self.ds, state)
        float(np.asarray(state.accum[0, 0]))
        dt = time.time() - t0
        return iters * chunk * self.width * self.height / dt


def save_render(path: str, img_linear: np.ndarray, exposure: float = 0.0,
                filmic: bool = False):
    """save_image semantics (yocto_sceneio.cpp:509-560): srgb encode for LDR
    formats, linear for HDR. LDR output goes through the full yocto tonemap
    (yocto_color.h:274-318): exposure scale -> optional ACES-approx filmic ->
    sRGB; HDR formats stay linear (exposure still applies, like the
    reference's tonemap on float images)."""
    from .render.state import tonemap as _tonemap
    from .scene import image_io

    if exposure != 0.0 and path.lower().endswith((".hdr", ".pic", ".exr")):
        img_linear = np.concatenate(
            [img_linear[..., :3] * (2.0 ** exposure), img_linear[..., 3:]],
            axis=-1)
    if path.lower().endswith((".hdr", ".pic")):
        image_io.save_hdr(path, img_linear[..., :3].astype(np.float32))
    elif path.lower().endswith(".exr"):
        from .scene import exr

        exr.save_exr(path, img_linear.astype(np.float32))
    elif path.lower().endswith((".png", ".jpg", ".jpeg", ".tga", ".bmp")):
        rgba = np.asarray(_tonemap(
            jnp.asarray(img_linear), exposure=exposure, filmic=filmic))
        rgba = np.concatenate(
            [rgba[..., :3], np.clip(rgba[..., 3:], 0, 1)], axis=-1)
        if path.lower().endswith(".png"):
            image_io.save_png(path, rgba)
        elif path.lower().endswith((".jpg", ".jpeg")):
            from .scene.jpeg import save_jpeg

            save_jpeg(path, (rgba[..., :3] * 255 + 0.5).astype(np.uint8))
        elif path.lower().endswith(".tga"):
            image_io.save_tga(path, rgba)
        else:
            image_io.save_bmp(path, rgba)
    else:
        raise ValueError(f"unsupported output format: {path}")
