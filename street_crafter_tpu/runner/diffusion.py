"""Diffusion distillation runner: sliding-window conditioned sampling.

Analog of street_gaussian/utils/diffusion_utils.py (DiffusionRunner /
WaymoDiffusionRunner): for each lane-shift trajectory, slide 25-frame windows
(step = sample_frames-1-window_size), prepend the nearest train camera as
conditioning frame 0, sample the LiDAR-conditioned VDM (optionally
SDS-partial-denoised from the current 3DGS render), and write the outputs
into the novel cameras' supervision slots.

TPU redesign note: the reference renders novel views at camera resolution and
differentiably crops+resizes them to the diffusion frame inside the loss
(train.py:159-170). Here the aspect crop + resize is folded into the camera
intrinsics once (``diffusion_camera``) so novel views render directly at the
diffusion resolution — same math, no resampling op in the hot loop.
"""

from __future__ import annotations

import os
from typing import Callable

import jax
import numpy as np

from ..datasets.cameras import Camera
from ..datasets.readers import CameraInfo
from ..visualizers.visualizer import save_image


def aspect_crop_resize(img: np.ndarray, th: int, tw: int,
                       crop: str = "bottom") -> np.ndarray:
    """Center-width aspect crop then LANCZOS resize (preprocess_image,
    diffusion_utils.py:78-97). img: [H, W, C] float. Height crop keeps the
    bottom (road) part by default; ``crop="center"`` is the Vista-legacy
    BaseDataset behavior (vwm/data/subsets/common.py:36-48)."""
    from PIL import Image
    h, w = img.shape[:2]
    if w / h > tw / th:
        cw = int(tw / th * h)
        left = (w - cw) // 2
        img = img[:, left: left + cw]
    elif w / h < tw / th:
        ch = int(th / tw * w)
        if crop == "center":
            top = (h - ch) // 2
            img = img[top: top + ch]
        else:
            img = img[h - ch:]  # keep the bottom (road) part
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[..., None]
    chans = []
    for c in range(arr.shape[-1]):
        pil = Image.fromarray((np.clip(arr[..., c], 0, 1) * 255).astype(np.uint8))
        chans.append(np.asarray(pil.resize((tw, th), Image.LANCZOS),
                                np.float32) / 255.0)
    out = np.stack(chans, -1)
    return out[..., 0] if img.ndim == 2 else out


def crop_resize_K(K: np.ndarray, h: int, w: int, th: int, tw: int
                  ) -> np.ndarray:
    """Intrinsics equivalent of aspect_crop_resize."""
    K = np.asarray(K, np.float64).copy()
    left, top = 0.0, 0.0
    ch, cw = h, w
    if w / h > tw / th:
        cw = int(tw / th * h)
        left = (w - cw) // 2
    elif w / h < tw / th:
        ch = int(th / tw * w)
        top = h - ch
    K[0, 2] -= left
    K[1, 2] -= top
    K[0] *= tw / cw
    K[1] *= th / ch
    return K


def diffusion_camera(info: CameraInfo, th: int, tw: int) -> Camera:
    """Device camera rendering directly at the diffusion resolution."""
    w2c = np.eye(4)
    w2c[:3, :3] = info.R.T
    w2c[:3, 3] = info.T
    K = crop_resize_K(info.K, info.height, info.width, th, tw)
    return Camera.from_extrinsic(
        w2c.astype(np.float32), K.astype(np.float32), tw, th,
        id=info.uid, frame=info.metadata.get("frame", -1),
        cam=info.metadata.get("cam", 0),
        timestamp=float(info.metadata.get("timestamp", 0.0)),
        image_name=info.image_name)


def _load_rgb(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    return img[..., :3]


def resolve_params_on_host(dcfg) -> bool:
    """Resolve the ``diffusion.params_on_host`` knob: True/False, or
    "auto" = on for accelerator backends, off on CPU (where device arrays
    already live in host RAM and staging would only copy)."""
    v = dcfg.get("params_on_host", "auto")
    if isinstance(v, str):
        if v.lower() == "auto":
            return jax.default_backend() != "cpu"
        return v.lower() in ("1", "true", "yes", "on")
    return bool(v)


class EngineParamStore:
    """Engine-parameter residency policy for distillation sampling — the
    reference's ``--low_vram`` submodule offload analog
    (video_diffusion/sample_condition.py:52-77), redesigned for jax: with
    ``on_host=True`` the only long-lived copy of the (eval-only) engine
    params lives in host RAM; ``acquire()`` stages one device copy for the
    duration of a sampling event and ``release()`` frees it before GS
    training resumes.

    This is required, not an optimization, on the 15.75 GB v5e: a
    device-resident engine (2.6 GB bf16 / 5.2 GB f32 at mid size) after a
    completed sampling event starved the next GS train step's working set
    (RESOURCE_EXHAUSTED, reproduced at both dtypes — ROUND_NOTES r3).
    Cost: one host->device transfer of the param tree per event.
    """

    def __init__(self, params, on_host: bool):
        self.on_host = bool(on_host)
        if self.on_host:
            host = jax.device_get(params)
            for leaf in jax.tree.leaves(params):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            params = host
        self.params = params
        self._dev = None

    def acquire(self):
        """Device-resident params for one sampling event."""
        if not self.on_host:
            return self.params
        if self._dev is None:
            self._dev = jax.device_put(self.params)
        return self._dev

    def release(self) -> None:
        """Drop the event's device copy (no-op when resident)."""
        if self._dev is not None:
            for leaf in jax.tree.leaves(self._dev):
                if hasattr(leaf, "delete"):
                    leaf.delete()
            self._dev = None

    @property
    def host_resident(self) -> bool:
        """True iff the at-rest copy is plain host memory and no device
        copy is currently staged (test/assertion hook)."""
        return (self.on_host and self._dev is None
                and all(isinstance(leaf, np.ndarray)
                        for leaf in jax.tree.leaves(self.params)))


def sampling_mesh_from_cfg(cfg):
    """Mesh for frames-sharded sampling when ``diffusion.shard_sample`` is
    set and more than one device is visible; None otherwise."""
    if not getattr(cfg.diffusion, "shard_sample", False):
        return None
    import jax as _jax
    if len(_jax.devices()) <= 1:
        return None
    from ..parallel import make_mesh
    return make_mesh(dict(cfg.mesh.axes))


class DiffusionRunner:
    """Bridges the VDM engine to the GS scene.

    ``render_fn(camera_info) -> {"rgb": [H,W,3] in [0,1], "acc": [H,W]}``
    renders the current 3DGS at the diffusion resolution (for SDS init).
    """

    def __init__(self, scene, engine, params,
                 height: int = 576, width: int = 1024,
                 window_size: int = 4, num_steps: int | None = None,
                 cfg_scale: float | None = None,
                 save_dir: str | None = None, seed: int = 23,
                 mesh=None):
        self.scene = scene
        self.engine = engine
        self.params = params
        self.th, self.tw = height, width
        self.window_size = window_size
        self.sample_frames = engine.cfg.num_frames
        self.num_steps = num_steps
        self.cfg_scale = cfg_scale
        self.save_dir = save_dir
        self.seed = seed
        # frames-axis-sharded sampling over a device mesh
        # (parallel/sample.py); None -> single-device engine.sample
        self.mesh = mesh

    def _sample(self, key, guide_images, cond_image, render_images,
                sds_scale, cond_indices=(0,)):
        kw = dict(sds_scale=sds_scale, cfg_scale=self.cfg_scale,
                  num_steps=self.num_steps, cond_indices=cond_indices)
        if self.mesh is not None:
            from ..parallel import sample_on_mesh
            return sample_on_mesh(
                self.engine, self.params, key, guide_images, cond_image,
                mesh=self.mesh, render_images=render_images, **kw)
        return self.engine.sample(
            self.params, key, guide_images=guide_images,
            cond_image=cond_image, render_images=render_images, **kw)

    # -- data assembly ---------------------------------------------------------
    def load_guidance(self, cam: CameraInfo) -> np.ndarray:
        """LiDAR condition image, preprocessed to [-1, 1]
        (guide_preprocessor, diffusion_utils.py:28-31)."""
        rgb = _load_rgb(cam.metadata["guidance_rgb_path"])
        return aspect_crop_resize(rgb, self.th, self.tw) * 2.0 - 1.0

    def load_cond_image(self, cam: CameraInfo) -> np.ndarray:
        img = aspect_crop_resize(cam.load_image(), self.th, self.tw)
        return img * 2.0 - 1.0

    # -- main entry --------------------------------------------------------------
    def run(self, novel_cameras: list[CameraInfo],
            train_cameras: list[CameraInfo],
            render_fn: Callable | None = None,
            scale: float = 0.3, masked_guidance: bool = False) -> None:
        """Per lane-shift trajectory: run_sequence (diffusion_utils.py:122-135).
        FRONT camera only."""
        cams = [c for c in novel_cameras if c.metadata["cam"] == 0]
        for novel_id in sorted({c.metadata["novel_view_id"] for c in cams}):
            seq = sorted((c for c in cams
                          if c.metadata["novel_view_id"] == novel_id),
                         key=lambda c: c.metadata["frame"])
            self.run_sequence(seq, train_cameras, render_fn, scale)

    def run_sequence(self, cameras: list[CameraInfo],
                     train_cameras: list[CameraInfo],
                     render_fn: Callable | None = None,
                     scale: float = 0.3) -> np.ndarray:
        """Sliding windows over one trajectory (diffusion_utils.py:229-314)."""
        if self.scene is not None and self.scene.processor is not None:
            self.scene.processor.render_conditions(
                cameras, self.scene.info.metadata["obj_meta"])

        frames = [c.metadata["frame"] for c in cameras]
        train_frames = np.array([c.metadata["frame"] for c in train_cameras])
        n = len(frames)
        win = self.sample_frames - 1
        assert n >= win, f"not enough frames for sampling: {n} < {win}"
        step = win - self.window_size

        guides = [self.load_guidance(c) for c in cameras]
        renders = None
        if render_fn is not None:
            renders = [np.asarray(render_fn(c)["rgb"]) * 2.0 - 1.0
                       for c in cameras]

        filled = np.zeros(n, bool)
        result = np.zeros((n, self.th, self.tw, 3), np.float32)
        key = jax.random.PRNGKey(self.seed)

        for start in range(0, n, step):
            end = min(start + win, n)
            start = end - win

            cond_cam = train_cameras[
                int(np.abs(train_frames - frames[start]).argmin())]
            if (self.scene is not None
                    and self.scene.processor is not None):
                self.scene.processor.render_condition(
                    cond_cam, self.scene.info.metadata["obj_meta"])
            guide_seq = np.stack([self.load_guidance(cond_cam)]
                                 + guides[start:end])
            cond_image = self.load_cond_image(cond_cam)[None]

            render_seq = None
            if renders is not None:
                render_seq = np.stack([cond_image[0]]
                                      + renders[start:end])

            out = self._sample(
                key, jax.numpy.asarray(guide_seq),
                jax.numpy.asarray(cond_image),
                None if render_seq is None
                else jax.numpy.asarray(render_seq),
                scale if render_seq is not None else None)
            out = (np.asarray(out) + 1.0) / 2.0
            result[start:end] = out[1:]
            filled[start:end] = True

        assert filled.all(), "not all frames were sampled"

        for i, cam in enumerate(cameras):
            cam._image = result[i]
            # bump so Scene.batch_for re-builds the supervision batch
            cam.metadata["diffusion_version"] = \
                cam.metadata.get("diffusion_version", 0) + 1
            if self.save_dir:
                name = f"{cam.image_name}_scale{scale}.png"
                save_image(os.path.join(self.save_dir, name), result[i])
        return result

    def run_interleaved(self, test_cameras: list[CameraInfo],
                        train_cameras: list[CameraInfo]) -> np.ndarray:
        """Condition on every train frame inside each window; fill the test
        frames between them (run_interleaved, diffusion_utils.py:137-226).
        Returns the sampled test frames [len(test), H, W, 3] in [0, 1]."""
        cameras = sorted(test_cameras + train_cameras,
                         key=lambda c: c.metadata["frame"])
        train_frames = {c.metadata["frame"] for c in train_cameras}
        if self.scene is not None and self.scene.processor is not None:
            self.scene.processor.render_conditions(
                cameras, self.scene.info.metadata["obj_meta"])

        n = len(cameras)
        T = self.sample_frames
        assert n >= T, f"not enough frames: {n} < {T}"
        step = T - self.window_size

        guides = [self.load_guidance(c) for c in cameras]
        filled = np.zeros(n, bool)
        result = np.zeros((n, self.th, self.tw, 3), np.float32)
        key = jax.random.PRNGKey(self.seed)

        for start in range(0, n, step):
            end = min(start + T, n)
            start = end - T
            window = cameras[start:end]
            cond_indices = tuple(
                i for i, c in enumerate(window)
                if c.metadata["frame"] in train_frames)
            cond_images = np.stack(
                [self.load_cond_image(window[i]) for i in cond_indices])
            out = self._sample(
                key, jax.numpy.asarray(np.stack(guides[start:end])),
                jax.numpy.asarray(cond_images), None, None,
                cond_indices=cond_indices)
            result[start:end] = (np.asarray(out) + 1.0) / 2.0
            filled[start:end] = True
        assert filled.all()

        for i, cam in enumerate(cameras):
            cam._image = result[i]
            cam.metadata["diffusion_version"] = \
                cam.metadata.get("diffusion_version", 0) + 1
            if self.save_dir:
                save_image(os.path.join(self.save_dir,
                                        f"{cam.image_name}.png"), result[i])
        test_set = {id(c) for c in test_cameras}
        return np.stack([result[i] for i, c in enumerate(cameras)
                         if id(c) in test_set])
