"""Scene orchestrator: dataset + pools + processor wired together.

create_scene analog (create_scene.py:9-35 + street_gaussian/models/scene.py:
14-61): reads the processed scene dir, initializes input plys, builds the
pytree scene (SceneParams/SceneMeta) and the camera lists. Pure host-side
construction; everything jit-facing lives in models/gs.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..data_processor import get_pointcloud_processor
from ..datasets.readers import CameraInfo, SceneInfo
from ..datasets.waymo import read_waymo_scene
from ..models.gs.build import (auto_downscale, build_scene_params,
                               camera_batch, to_device_camera)
from ..models.gs.scene import SceneMeta, SceneParams


class Scene:
    def __init__(self, cfg: Config, load_images: bool = True,
                 need_processor: bool = True):
        self.cfg = cfg
        datadir = cfg.source_path
        self.model_path = cfg.model_path or os.path.join(
            cfg.workspace, "output", cfg.task, cfg.exp_name)
        os.makedirs(self.model_path, exist_ok=True)

        if cfg.data.type.lower() != "waymo":
            raise ValueError(f"unsupported dataset type {cfg.data.type!r}")

        selected = tuple(cfg.data.selected_frames)
        self.info: SceneInfo = read_waymo_scene(
            datadir,
            cameras=list(cfg.data.cameras),
            selected_frames=None if selected[0] < 0 else selected,
            split_test=cfg.data.split_test,
            split_train=cfg.data.split_train,
            box_scale=cfg.data.box_scale,
            novel_view_shifts=list(cfg.render.novel_view.shift)
            if isinstance(cfg.render.novel_view.shift, (list, tuple))
            else [cfg.render.novel_view.shift],
            train_actor_distance_thresh=(
                cfg.render.novel_view.train_actor_distance_thresh),
            extent=cfg.data.get("extent") or None,
            mode=cfg.mode)

        self.processor = None
        ply_paths: dict[str, str] = {}
        if not need_processor:
            # render/eval mode: reuse the input plys written at train time so
            # the pool structure (and checkpoint pytree) matches training
            from glob import glob
            for p in glob(os.path.join(self.model_path, "input_ply",
                                       "points3D_*.ply")):
                ply_paths[os.path.basename(p)[len("points3D_"):-4]] = p
        if need_processor:
            self.processor = get_pointcloud_processor(
                cfg.data.type, datadir,
                cameras=list(cfg.data.cameras),
                selected_frames=(self.info.metadata["start_frame"],
                                 self.info.metadata["start_frame"]
                                 + self.info.metadata["num_frames"] - 1),
                delta_frames=cfg.data.delta_frames)
            colmap_points = None
            if cfg.data.use_colmap:
                from ..data_processor.colmap_driver import (
                    load_colmap_points, run_colmap)
                colmap_points = load_colmap_points(self.model_path)
                if colmap_points is None:
                    run_colmap(self.info.train_cameras,
                               os.path.join(self.model_path, "colmap"))
                    colmap_points = load_colmap_points(self.model_path)
            ply_paths = self.processor.initialize_ply(
                self.model_path, self.info.metadata["obj_meta"],
                colmap_points=colmap_points)
        self.ply_paths = ply_paths

        self.params: SceneParams
        self.meta: SceneMeta
        self.params, self.meta = build_scene_params(self.info, ply_paths, cfg)

        self.load_images = load_images
        self._batch_cache: dict[int, dict] = {}

        downscale = auto_downscale(max(
            (c.width for c in self.info.train_cameras), default=0))
        self.downscale = downscale
        self.train_cameras = [to_device_camera(c, downscale)
                              for c in self.info.train_cameras]
        self.test_cameras = [to_device_camera(c, downscale)
                             for c in self.info.test_cameras]
        self.novel_cameras = [to_device_camera(c, downscale)
                              for c in self.info.novel_view_cameras]

    @property
    def extent(self) -> float:
        return float(self.info.metadata["scene_radius"])

    def batch_for(self, cam_info: CameraInfo) -> dict:
        """Supervision batch (cached per camera identity).

        Novel-view cameras have no ground-truth image on disk — their
        ``_image`` is filled by the diffusion runner (diffusion_utils.py:
        316-338); until then the batch carries no gt and the camera must not
        be used for supervision."""
        is_novel = cam_info.metadata.get("is_novel_view", False)
        load_img = self.load_images and (not is_novel
                                         or cam_info._image is not None)
        key = (cam_info.uid, cam_info.image_name, load_img,
               cam_info.metadata.get("diffusion_version", 0))
        if key not in self._batch_cache:
            self._batch_cache[key] = camera_batch(
                cam_info, load_image=load_img, load_guidance=not is_novel)
        return self._batch_cache[key]

    def render_conditions(self, cameras: list[CameraInfo] | None = None,
                          force: bool = False) -> None:
        """Ensure LiDAR condition pngs exist for the given cameras
        (scene.py:57-61)."""
        if self.processor is None:
            raise RuntimeError("scene built without a pointcloud processor")
        cams = cameras if cameras is not None else (
            self.info.train_cameras + self.info.test_cameras
            + self.info.novel_view_cameras)
        self.processor.render_conditions(
            cams, self.info.metadata["obj_meta"],
            scale=self.cfg.render.scale,
            use_ndc_scale=bool(self.cfg.render.use_ndc_scale),
            force=force)


def create_scene(cfg: Config, **kw) -> Scene:
    return Scene(cfg, **kw)
