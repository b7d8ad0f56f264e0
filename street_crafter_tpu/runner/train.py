"""3DGS distillation training driver.

Host-side loop mirroring the reference entry (train.py:54-332): camera
sampling (novel-view prob), SH-degree warmup, densify/opacity-reset
scheduling, periodic diffusion sampling via a pluggable hook, PSNR eval at
test_iterations, orbax checkpointing. All device work happens inside the
jitted step functions from training.gs_trainer.

CLI: python -m street_crafter_tpu.runner.train --config scene.yaml [k=v ...]
"""

from __future__ import annotations

import os
import random
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, default_config, load_config, merge_dotlist, save_config
from ..models.gs.renderer import render_scene
from ..training.gs_trainer import (
    GSTrainState, init_train_state, make_densify_step, make_train_step,
    reset_opacity_step,
)
from ..utils.checkpoint import load_checkpoint, save_checkpoint
from .scene import Scene, create_scene

DiffusionHook = Callable[["GSTrainer", int, float, bool], None]


def psnr(img: jax.Array, gt: jax.Array) -> jax.Array:
    mse = jnp.mean((img - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


def make_eval_render(cfg: Config, meta, sh_degree: int,
                     with_stats: bool = False,
                     max_per_coarse: int | None = None,
                     max_per_row: int | None = None,
                     escalate_tiles: int = 0,
                     escalate_per_coarse: int = 0,
                     escalate_per_row: int | None = None,
                     escalate_classes: tuple = (),
                     select_method: str = "approx"):
    """Eval renders at TRAINING fidelity by default (recall 0.95, f32
    compositing) so reported PSNR measures the model, not the fast path.
    The cheap inference path (used for trajectory videos and bench) is
    opt-in via ``cfg.eval.fast``; it uses the fused Pallas compositing
    kernel (``render.eval_method``, ops/gs_raster_fused.py) which composites
    the full coarse candidate list with row-level early exit — faster than
    the XLA fine stage at full resolution AND without its fine-capacity
    drops."""
    fast = bool(cfg.eval.get("fast", False))
    # the occupancy-stats probe (with_stats) instruments the XLA binning
    # path — the fused kernel has no fine stage to instrument
    method = (str(cfg.render.get("eval_method", "fused"))
              if fast and not with_stats else "xla")
    kc = int(max_per_coarse
             or cfg.render.get("max_intersects_per_coarse", 4096))
    @jax.jit
    def eval_render(params, camera, batch):
        out = render_scene(
            params, meta, camera,
            frame_idx=batch["frame_idx"], frame=batch["frame"],
            cam_id=batch["cam_id"], timestamp=batch.get("timestamp"),
            image_idx=batch.get("image_idx", 0),
            sh_degree=sh_degree, tile_size=cfg.render.tile_size,
            max_per_tile=cfg.render.max_intersects_per_tile,
            max_per_coarse=kc, max_per_row=max_per_row,
            escalate_tiles=escalate_tiles,
            escalate_per_coarse=escalate_per_coarse,
            escalate_per_row=escalate_per_row,
            escalate_classes=tuple(map(tuple, escalate_classes)),
            select_method=select_method,
            interpolate_pose=True, clamp=True,
            white_background=bool(cfg.data.white_background),
            bf16_composite=fast and bool(cfg.render.get("bf16_composite",
                                                        True)),
            recall_target=float(cfg.render.get("eval_recall_target", 0.85))
            if fast else float(cfg.render.get("recall_target", 0.95)),
            with_stats=with_stats, method=method)
        return out
    return eval_render


class GSTrainer:
    """Holds the jit caches + schedules of the training loop."""

    def __init__(self, cfg: Config, scene: Scene,
                 lpips_fn: Callable | None = None):
        self.cfg = cfg
        self.scene = scene
        self.lpips_fn = lpips_fn
        self.state: GSTrainState = init_train_state(scene.params)
        self.start_iter = 1
        self._steps: dict[tuple, Callable] = {}
        self._eval_renders: dict[tuple, Callable] = {}
        self._densify = make_densify_step(cfg)
        self.max_sh = cfg.model.gaussian.sh_degree
        self.rng = random.Random(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)

        if cfg.resume:
            restored, it = load_checkpoint(scene.model_path, self.state)
            if restored is not None:
                self.state = restored
                self.start_iter = it + 1
                print(f"resumed from iteration {it}")

        # capacity-aware training (VERDICT r4 weak #1): the reference's
        # gsplat sizes worklists per frame and drops nothing
        # (street_gaussian_renderer.py:243-280); our static-shape raster
        # clamps at max_per_coarse. A post-densification scene trained at a
        # too-small class silently zero-grads every dropped candidate — and
        # the densification loop feeds on those gradients. Probe the scene's
        # occupancy and pick a gate-cleared class; re-probed on the densify
        # schedule (occupancy grows), escalate-only (each class change costs
        # one step recompile).
        self.train_kc: int | None = None
        if bool(cfg.render.get("train_auto_capacity", True)):
            self.train_kc = self._probe_train_capacity()

    # training classes AOT-verified against the real v5e compiler
    # (scripts/pallas_compile_gate.py; BASELINE.md Aug 20 rows)
    TRAIN_KC_CLASSES = (4096, 8192, 16384)

    def eval_render_fn(self, sh: int, with_stats: bool = False,
                       max_per_coarse: int | None = None) -> Callable:
        """Memoized make_eval_render: each call builds a fresh jit closure
        (fresh trace + compile), so the probe/eval/image paths share one
        executable per (sh, stats, kc) instead of recompiling per call."""
        key = (sh, with_stats, max_per_coarse)
        if key not in self._eval_renders:
            self._eval_renders[key] = make_eval_render(
                self.cfg, self.scene.meta, sh, with_stats=with_stats,
                max_per_coarse=max_per_coarse)
        return self._eval_renders[key]

    def _probe_train_capacity(self) -> int:
        """Pick the training raster class from measured occupancy: stats
        renders (exact pre-drop per-tile counts) over <=3 train cameras."""
        cfg = self.cfg
        floor = int(cfg.render.get("max_intersects_per_coarse", 4096))
        infos = self.scene.info.train_cameras
        cams = self.scene.train_cameras
        if not infos:
            return floor
        stats_render = self.eval_render_fn(self.max_sh, with_stats=True)
        picks = np.linspace(0, len(infos) - 1, min(3, len(infos))).astype(int)
        cmax = 0
        for i in picks:
            out = stats_render(self.state.params, cams[i],
                               self.scene.batch_for(infos[i]))
            cmax = max(cmax, int(out["raster_stats"]["coarse_max"]))
        kc = floor
        for cls in self.TRAIN_KC_CLASSES:
            if cls >= min(int(cmax * 1.1), self.TRAIN_KC_CLASSES[-1]):
                kc = max(floor, cls)
                break
        else:
            kc = max(floor, self.TRAIN_KC_CLASSES[-1])
        prev = self.train_kc
        if prev is not None and kc < prev:
            kc = prev   # escalate-only: avoid recompile churn
        if kc != prev:
            print(f"train capacity probe: coarse_max {cmax} -> kc {kc}"
                  + (f" (was {prev})" if prev is not None else ""))
        return kc

    def active_sh(self, iteration: int) -> int:
        """oneupSHdegree every 1000 iters (train.py:119-120)."""
        return min(iteration // 1000, self.max_sh)

    def step_fn(self, is_novel: bool, sh: int,
                with_obj_acc: bool = False,
                batch_size: int = 1) -> Callable:
        key = (is_novel, sh, with_obj_acc, batch_size, self.train_kc)
        if key not in self._steps:
            mesh = None
            if batch_size > 1 and len(jax.devices()) > 1:
                from ..parallel import make_mesh
                mesh = make_mesh(dict(self.cfg.mesh.axes))
            self._steps[key] = make_train_step(
                self.cfg, self.scene.meta, spatial_lr_scale=self.scene.extent,
                lpips_fn=self.lpips_fn, is_novel=is_novel,
                active_sh_degree=sh, with_obj_acc=with_obj_acc,
                batch_size=batch_size, mesh=mesh,
                max_per_coarse=self.train_kc)
        return self._steps[key]

    def fill_camera_batch(self, cam_info, is_novel: bool, novel_pool: list,
                          B: int) -> list:
        """Sample B-1 extra same-pool cameras compatible with ``cam_info``
        for the camera-DP step (uniform resolution + identical supervision
        keys; duplicates are harmless under gradient averaging)."""
        pool = (novel_pool if is_novel
                else self.scene.info.train_cameras)
        base_keys = set(self.scene.batch_for(cam_info))
        compat = [c for c in pool
                  if (c.width, c.height) == (cam_info.width, cam_info.height)
                  and set(self.scene.batch_for(c)) == base_keys]
        infos = [cam_info]
        while len(infos) < B:
            infos.append(self.rng.choice(compat) if compat else cam_info)
        return infos

    def next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def pick_camera(self, novel_pool: list) -> tuple:
        """(cam_info, is_novel): novel-view prob sampling (train.py:142-147)."""
        infos = self.scene.info.train_cameras
        if novel_pool and self.rng.random() < self.cfg.train.novel_view_prob:
            return self.rng.choice(novel_pool), True
        return self.rng.choice(infos), False

    def run(self, diffusion_hook: DiffusionHook | None = None,
            log_fn: Callable[[int, dict], None] | None = None) -> GSTrainState:
        cfg = self.cfg
        scene = self.scene
        o = cfg.optim
        sample_iters = list(cfg.diffusion.sample_iterations) \
            if cfg.diffusion.use_diffusion else []
        scales = list(cfg.diffusion.sds_scales)
        novel_pool: list = []

        device_cams = {c.uid: cam for c, cam in
                       zip(scene.info.train_cameras, scene.train_cameras)}
        for info, cam in zip(scene.info.novel_view_cameras,
                             scene.novel_cameras):
            if cfg.diffusion.use_diffusion:
                # novel views are supervised at the diffusion resolution;
                # render there directly (see runner/diffusion.py docstring)
                from .diffusion import diffusion_camera
                cam = diffusion_camera(info, cfg.diffusion.height,
                                       cfg.diffusion.width)
            device_cams[("novel", info.uid, info.image_name)] = cam

        from ..utils.metrics import MetricsLogger, ProfilerHook
        metrics = MetricsLogger(os.path.join(scene.model_path, "logs"))
        profiler = ProfilerHook(cfg.profiler, scene.model_path)

        t0 = time.perf_counter()
        ema_loss = None
        # SCT_TIMING=1: per-phase wall split every 100 iters — host batch
        # assembly vs step dispatch vs device sync (the loss fetch blocks on
        # the step) vs densify/log. Decomposes regressions like the r3
        # rehearsal's 25x GS-phase slowdown without a profiler run.
        timing = bool(os.environ.get("SCT_TIMING"))
        tacc = {"batch": 0.0, "dispatch": 0.0, "sync": 0.0, "other": 0.0}
        tmark = time.perf_counter()

        def _lap(k):
            nonlocal tmark
            now = time.perf_counter()
            tacc[k] += now - tmark
            tmark = now

        for iteration in range(self.start_iter, cfg.train.iterations + 1):
            profiler.step(iteration)
            # -- diffusion distillation sampling -----------------------------
            # Scale is the reference's min/max linear interpolation over the
            # sample window (train.py:106-109,128: scale = (min_scale -
            # max_scale)*(it - min_it)/(max_it - min_it) + max_scale), NOT a
            # per-iteration list lookup. ``restarting``: a resume landing just
            # after a sample iteration re-runs the sampling (train.py:121-125)
            # since novel-view images are not checkpointed.
            restarting = (iteration == self.start_iter
                          and (iteration - 1) in sample_iters)
            if diffusion_hook is not None and (
                    iteration in sample_iters or restarting):
                eff_it = iteration - int(restarting)
                lo, hi = min(sample_iters), max(sample_iters)
                smin, smax = min(scales), max(scales)
                scale = (smin - smax) * (eff_it - lo) / max(hi - lo, 1) \
                    + smax
                diffusion_hook(self, iteration, scale,
                               eff_it >= cfg.diffusion.masked_guidance_iter)
                novel_pool = [
                    c for c in scene.info.novel_view_cameras
                    if not c.metadata.get("skip_camera", False)
                    and c._image is not None]

            if timing:
                _lap("other")
            cam_info, is_novel = self.pick_camera(novel_pool)
            if is_novel:
                camera = device_cams[("novel", cam_info.uid,
                                      cam_info.image_name)]
            else:
                camera = device_cams[cam_info.uid]
            batch = scene.batch_for(cam_info)
            if "gt_image" not in batch:
                continue

            sh = self.active_sh(iteration)
            # objects-only acc regularizer after densification settles
            # (train.py:202: lambda_reg > 0, every but each reg_obj_acc_every-
            # th iteration, past densify_until_iter)
            with_obj_acc = (
                not is_novel and o.lambda_reg > 0
                and iteration % cfg.train.reg_obj_acc_every != 0
                and iteration > o.densify_until_iter
                and "obj_bound" in batch)
            B = int(cfg.train.get("batch_size", 1))
            if B > 1:
                # camera-DP step: B same-pool cameras, sharded over the
                # data mesh axis (beyond the reference's 1-camera loop)
                from ..training.gs_trainer import stack_cameras_pytree
                infos = self.fill_camera_batch(cam_info, is_novel,
                                               novel_pool, B)
                cams, batches = [], []
                for inf in infos:
                    if is_novel:
                        cams.append(device_cams[("novel", inf.uid,
                                                 inf.image_name)])
                    else:
                        cams.append(device_cams[inf.uid])
                    batches.append(scene.batch_for(inf))
                camera = stack_cameras_pytree(cams)
                batch = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *batches)
            if timing:
                _lap("batch")
            step = self.step_fn(is_novel, sh, with_obj_acc, batch_size=B)
            self.state, scalars = step(self.state, camera, batch,
                                       self.next_key())
            if timing:
                _lap("dispatch")

            # -- densification schedule (train.py:281-310) -------------------
            if (o.densify_from_iter <= iteration <= o.densify_until_iter
                    and iteration % o.densification_interval == 0):
                self.state, _ = self._densify(
                    self.state, self.next_key(), float(scene.extent),
                    scene.meta.actor_bbox, scene.meta.actor_random_init,
                    scene.meta.sphere_center, scene.meta.sphere_radius)
                # densification grows occupancy: re-probe the training
                # capacity class every 10th densify step and at the end of
                # the densification phase (escalate-only, so at most 2
                # step recompiles over a standard schedule)
                if self.train_kc is not None and (
                        iteration % (o.densification_interval * 10) == 0
                        or iteration + o.densification_interval
                        > o.densify_until_iter):
                    self.train_kc = self._probe_train_capacity()
            if (iteration % o.opacity_reset_interval == 0
                    and iteration <= o.densify_until_iter):
                self.state = reset_opacity_step(self.state)

            # -- logging / eval / checkpoint ---------------------------------
            # Fetch scalars ONLY at log points (bench.py queue-N-block-once
            # discipline): a per-iteration float() serializes the loop on
            # host<->device RTT whenever steps are faster than the link.
            # SCT_TIMING decomposition (round 4, idle host): at THIS scene
            # size the device step itself is ~82 ms (100 queued steps
            # drained in 8.2 s at the next fetch), so per-iter fetching
            # measured neutral — the change future-proofs faster
            # steps/remote links and lets host-side batch prep overlap.
            if (iteration % cfg.train.log_interval == 0
                    or iteration == cfg.train.iterations):
                loss = float(scalars["loss"])
                if timing:
                    _lap("sync")
                ema_loss = loss if ema_loss is None else \
                    0.6 * ema_loss + 0.4 * loss
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"non-finite loss {loss} at iteration {iteration}")
                vals = {k: float(v) for k, v in scalars.items()}
                metrics.log_scalars(iteration, vals, prefix="train/")
                if log_fn is not None:
                    log_fn(iteration, vals)

            if iteration in cfg.train.test_iterations:
                report = self.evaluate(sh)
                print(f"[it {iteration}] eval " + " ".join(
                    f"{k}={v:.3f}" for k, v in report.items()))
                metrics.log_scalars(iteration, report, prefix="eval/")
                self._log_eval_image(metrics, iteration, sh)
                if log_fn is not None:
                    log_fn(iteration, report)

            if iteration in cfg.train.checkpoint_iterations or \
                    iteration == cfg.train.iterations:
                save_checkpoint(scene.model_path, iteration, self.state)
            if iteration in cfg.train.get("save_iterations", []):
                self.export_ply(iteration)

            if iteration % 100 == 0:
                dt = time.perf_counter() - t0
                split = ""
                if timing:
                    split = " " + " ".join(
                        f"{k}={v:.1f}s" for k, v in tacc.items())
                    tacc = {k: 0.0 for k in tacc}
                ema_s = "n/a" if ema_loss is None else f"{ema_loss:.4f}"
                print(f"[it {iteration}] ema_loss={ema_s} "
                      f"({100 / dt:.1f} it/s){split}", flush=True)
                t0 = time.perf_counter()
        profiler.close()
        metrics.close()
        return self.state

    def export_ply(self, iteration: int) -> None:
        """Viewer-compatible 3DGS PLY export of all trained pools
        (street_gaussian_model.py:88-99 composite save; path convention of
        the 3DGS ecosystem: point_cloud/iteration_N/point_cloud.ply)."""
        from ..utils.gs_ply import export_gaussians_ply
        params = self.state.params
        pools = {}
        if params.bkgd is not None:
            pools["bkgd"] = params.bkgd
        if params.actors is not None:
            A = params.actors.xyz.shape[0]
            for i in range(A):
                pools[f"obj_{i:03d}"] = jax.tree_util.tree_map(
                    lambda x, i=i: x[i], params.actors)
        if params.sky is not None:
            pools["sky"] = params.sky
        path = os.path.join(self.scene.model_path, "point_cloud",
                            f"iteration_{iteration}", "point_cloud.ply")
        export_gaussians_ply(path, pools)
        if params.sky_cubemap is not None:
            # latlong export on save (sky_cubemap.py:38-48)
            import imageio.v2 as imageio
            from ..ops.cubemap import latlong_from_cubemap
            ll = np.asarray(latlong_from_cubemap(params.sky_cubemap,
                                                 512, 1024))
            imageio.imwrite(
                os.path.join(os.path.dirname(path), "sky_latlong.png"),
                (np.clip(ll, 0, 1) * 255).astype(np.uint8))

    def _log_eval_image(self, metrics, iteration: int, sh: int) -> None:
        """First test view render -> tensorboard (training_report image
        logging, train.py:371-416)."""
        scene = self.scene
        if not scene.info.test_cameras:
            return
        info, cam = scene.info.test_cameras[0], scene.test_cameras[0]
        batch = scene.batch_for(info)
        out = self.eval_render_fn(sh)(self.state.params, cam, batch)
        import numpy as _np
        img = _np.asarray(out["rgb"])
        if "gt_image" in batch:
            img = _np.concatenate([img, _np.asarray(batch["gt_image"])], 1)
        metrics.log_image(iteration, "eval/render_vs_gt", img)

    def evaluate(self, sh: int | None = None) -> dict[str, float]:
        """PSNR/L1 on held-out test cameras (training_report,
        train.py:371-416)."""
        scene = self.scene
        sh = self.max_sh if sh is None else sh
        eval_render = self.eval_render_fn(sh)
        psnrs, l1s = [], []
        for info, cam in zip(scene.info.test_cameras, scene.test_cameras):
            batch = scene.batch_for(info)
            if "gt_image" not in batch:
                continue
            out = eval_render(self.state.params, cam, batch)
            psnrs.append(float(psnr(out["rgb"], batch["gt_image"])))
            l1s.append(float(jnp.mean(jnp.abs(out["rgb"]
                                              - batch["gt_image"]))))
        if not psnrs:
            return {}
        report = {"psnr": float(np.mean(psnrs)), "l1": float(np.mean(l1s))}
        # raster occupancy counters on one view: detect silent capacity drops
        # (fixed-capacity binning clamps at max_per_coarse/max_per_tile)
        stats_render = self.eval_render_fn(sh, with_stats=True)
        info, cam = scene.info.test_cameras[0], scene.test_cameras[0]
        out = stats_render(self.state.params, cam, scene.batch_for(info))
        for k in ("coarse_dropped", "fine_dropped", "fine_max"):
            report[f"raster_{k}"] = float(out["raster_stats"][k])
        # TRAIN-capacity counters (VERDICT r4 weak #1): what the training
        # render itself drops at the picked class — dropped candidates get
        # zero gradient, and the densification loop feeds on those gradients
        if self.train_kc is not None:
            tr = self.eval_render_fn(sh, with_stats=True,
                                     max_per_coarse=self.train_kc)(
                self.state.params, cam, scene.batch_for(info))
            report["train_kc"] = float(self.train_kc)
            report["train_coarse_dropped"] = float(
                tr["raster_stats"]["coarse_dropped"])
            report["train_row_dropped"] = float(
                tr["raster_stats"].get("row_dropped", 0.0))
        return report


def make_diffusion_hook(cfg: Config) -> DiffusionHook:
    """Build the distillation sampling hook: VDM engine + DiffusionRunner,
    with the current 3DGS render as SDS initialization (train.py:123-138)."""
    from ..models.vdm.engine import VideoDiffusionEngine
    from ..models.vdm.weights import engine_from_config, load_vdm_params
    from .diffusion import (DiffusionRunner, EngineParamStore,
                            diffusion_camera, resolve_params_on_host,
                            sampling_mesh_from_cfg)

    engine_cfg = engine_from_config(cfg.diffusion)
    engine = VideoDiffusionEngine(engine_cfg)
    params = load_vdm_params(engine, cfg.diffusion)
    # low_vram analog (sample_condition.py:52-77): between sampling events
    # the eval-only engine params rest in host RAM so GS training gets the
    # whole HBM; see EngineParamStore for the measured on-chip rationale.
    store = EngineParamStore(params, resolve_params_on_host(cfg.diffusion))

    def hook(trainer: "GSTrainer", iteration: int, scale: float,
             masked_guidance: bool) -> None:
        scene = trainer.scene
        # On accelerator backends (= params_on_host auto-on), drop cached
        # executables around the event: a long GS phase's accumulated
        # executables + fragmentation can leave the denoise scan
        # RESOURCE_EXHAUSTED on a 16 GB chip even with the engine params
        # host-resident (measured, r5 flagship rehearsal; see
        # scripts/run_onchip_e2e.py hook). Recompiles ride the persistent
        # compile cache.
        if store.on_host:
            jax.clear_caches()
        try:
            runner = DiffusionRunner(
                scene, engine, store.acquire(),
                height=cfg.diffusion.height, width=cfg.diffusion.width,
                window_size=cfg.diffusion.window_size,
                num_steps=cfg.diffusion.num_steps,
                cfg_scale=cfg.diffusion.cfg_scale,
                save_dir=os.path.join(scene.model_path, "diffusion")
                if cfg.diffusion.save_diffusion_render else None,
                mesh=sampling_mesh_from_cfg(cfg))

            eval_render = make_eval_render(cfg, scene.meta,
                                           trainer.active_sh(iteration))

            def render_fn(info):
                cam = diffusion_camera(info, cfg.diffusion.height,
                                       cfg.diffusion.width)
                batch = scene.batch_for(info)
                return eval_render(trainer.state.params, cam, batch)

            runner.run(scene.info.novel_view_cameras,
                       scene.info.train_cameras,
                       render_fn=render_fn, scale=scale,
                       masked_guidance=masked_guidance)
        finally:
            store.release()
            if store.on_host:
                jax.clear_caches()

    hook.param_store = store  # introspection hook for tests/instrumentation
    return hook


def backup_code(model_path: str) -> None:
    """Snapshot the package into the run dir (saveRuntimeCode,
    train.py:33-51)."""
    import shutil
    import street_crafter_tpu
    src = os.path.dirname(street_crafter_tpu.__file__)
    dst = os.path.join(model_path, "code_backup", "street_crafter_tpu")
    if not os.path.exists(dst):
        shutil.copytree(src, dst, ignore=shutil.ignore_patterns(
            "__pycache__", "*.so", "*.pyc"))


def train(cfg: Config, diffusion_hook: DiffusionHook | None = None,
          lpips_fn: Callable | None = None) -> GSTrainer:
    scene = create_scene(cfg)
    backup_code(scene.model_path)
    if cfg.diffusion.use_diffusion or cfg.optim.lambda_depth_lidar > 0:
        # condition pngs must exist before distillation sampling
        scene.render_conditions(scene.info.train_cameras
                                + scene.info.test_cameras)
    save_config(cfg, f"{scene.model_path}/config.yaml")
    if diffusion_hook is None and cfg.diffusion.use_diffusion:
        diffusion_hook = make_diffusion_hook(cfg)
    if lpips_fn is None and (cfg.optim.lambda_lpips > 0
                             or cfg.optim.lambda_novel_lpips > 0):
        from ..ops.lpips import load_lpips, random_feature_lpips
        lpips_fn = load_lpips(cfg.optim.get("lpips_weights") or None)
        if lpips_fn is None:
            # A silently-dropped LPIPS term would quietly optimize a
            # different objective than the configured one; refuse unless the
            # user explicitly waives it.
            if cfg.optim.get("lpips_fallback", "none") == "random_features":
                lpips_fn = random_feature_lpips()
                print("WARNING: no LPIPS weights; using the seeded "
                      "random-feature stand-in (optim.lpips_fallback) — "
                      "NOT the reference objective, see ops/lpips.py")
            elif not cfg.optim.get("allow_missing_lpips", False):
                raise RuntimeError(
                    "lambda_lpips/lambda_novel_lpips > 0 but no LPIPS "
                    "weights available (optim.lpips_weights unset or "
                    "missing). Convert weights with ops.lpips."
                    "convert_lpips_torch, set the lambdas to 0, set "
                    "optim.lpips_fallback=random_features for a stand-in, "
                    "or set optim.allow_missing_lpips=True to waive.")
            else:
                print("WARNING: no LPIPS weights; lpips terms disabled "
                      "(allow_missing_lpips=True)")
    trainer = GSTrainer(cfg, scene, lpips_fn=lpips_fn)
    trainer.run(diffusion_hook=diffusion_hook)
    return trainer


def main(argv: list[str] | None = None) -> None:
    import argparse
    p = argparse.ArgumentParser(description="3DGS distillation training")
    p.add_argument("--config", required=True)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = default_config()
    cfg.merge(load_config(args.config))
    merge_dotlist(cfg, args.opts)
    train(cfg)


if __name__ == "__main__":
    main()
