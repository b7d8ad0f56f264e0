"""Video-diffusion fine-tune data pipeline.

Covers vwm/data/dataset.py (Sampler / MultiSourceSamplerDataset: per-subset
probability sampling, samples_per_epoch) + subsets/{common,waymo,pandaset}.py
(25-frame windows from meta_info_{split}.json, bottom-biased aspect crop +
LANCZOS resize to the target, [-1,1] scaling) and the offline
waymo_prepare_meta.py (windows of 25 frames, stride 5).

numpy host pipeline with a thread prefetcher — PNG decode + resize is
IO/PIL-bound; device work (VAE encode) happens in the training driver.
"""

from __future__ import annotations

import json
import os
import queue
import threading

import numpy as np

from ..runner.diffusion import aspect_crop_resize


def prepare_meta(root_dir: str, scene_names: list[str],
                 save_name: str = "meta_info_train.json",
                 num_frames: int = 25, stride: int = 5,
                 postfix: str | None = None,
                 cam: int = 0, shifts: list[float] | None = None) -> str:
    """Write meta_info json: windows of `num_frames` front-cam frames with
    their LiDAR condition paths (waymo_prepare_meta.py:54-76). `shifts`
    additionally emits windows over lane-shifted condition renders."""
    metas = []
    for scene in scene_names:
        scene_dir = os.path.join(root_dir, scene)
        image_dir = os.path.join(scene_dir, "images")
        total = len([f for f in os.listdir(image_dir)
                     if f.endswith(f"_{cam}.png")])
        render_dirs = ["color_render"]
        if postfix:
            render_dirs = [f"color_render_{postfix}"]
        if shifts:
            render_dirs += [f"color_render_shift_{s:.2f}" for s in shifts]
        for render_dir in render_dirs:
            lidar_dir = os.path.join(scene_dir, "lidar", render_dir)
            if not os.path.isdir(lidar_dir):
                continue
            for start in range(0, total, stride):
                end = start + num_frames
                if end >= total:
                    continue
                sample = {"frames": [], "guidances": [], "guidances_mask": []}
                ok = True
                for f in range(start, end):
                    img = os.path.join(image_dir, f"{f:06d}_{cam}.png")
                    gd = os.path.join(lidar_dir, f"{f:06d}_{cam}.png")
                    gm = os.path.join(lidar_dir, f"{f:06d}_{cam}_mask.png")
                    if not (os.path.exists(img) and os.path.exists(gd)
                            and os.path.exists(gm)):
                        ok = False
                        break
                    sample["frames"].append(os.path.relpath(img, root_dir))
                    sample["guidances"].append(os.path.relpath(gd, root_dir))
                    sample["guidances_mask"].append(
                        os.path.relpath(gm, root_dir))
                if ok:
                    metas.append(sample)
    out = os.path.join(root_dir, save_name)
    with open(out, "w") as f:
        json.dump(metas, f, indent=1)
    return out


def _load_rgb(path: str) -> np.ndarray:
    import imageio.v2 as imageio
    img = np.asarray(imageio.imread(path), np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    return img[..., :3]


class ClipDataset:
    """meta_info-backed 25-frame clip loader (subsets/common.py +
    waymo.py:58-117). Yields numpy dicts in [-1, 1]."""

    def __init__(self, data_root: str, split: str = "train",
                 target_height: int = 320, target_width: int = 576,
                 num_frames: int = 25, postfix: str | None = None,
                 anno_file: str | None = None):
        if anno_file is None:
            anno_file = os.path.join(data_root, f"meta_info_{split}.json")
            if postfix:
                anno_file = anno_file.replace(".json", f"_{postfix}.json")
        if not os.path.exists(anno_file):
            raise FileNotFoundError(anno_file)
        with open(anno_file) as f:
            self.samples = json.load(f)
        self.data_root = data_root
        self.th, self.tw = target_height, target_width
        self.num_frames = num_frames

    def __len__(self) -> int:
        return len(self.samples)

    def _prep(self, relpath: str) -> np.ndarray:
        img = _load_rgb(os.path.join(self.data_root, relpath))
        return aspect_crop_resize(img, self.th, self.tw) * 2.0 - 1.0

    def __getitem__(self, index: int) -> dict:
        s = self.samples[index]
        T = self.num_frames
        imgs = np.stack([self._prep(p) for p in s["frames"][:T]])
        guides = np.stack([self._prep(p) for p in s["guidances"][:T]])
        return {
            "img_seq": imgs.astype(np.float32),        # [T, H, W, 3]
            "guide_seq": guides.astype(np.float32),    # [T, H, W, 3]
            "cond_frames_without_noise": imgs[0],
            "fps_id": np.float32(9.0),
            "motion_bucket_id": np.float32(127.0),
            "cond_aug": np.float32(0.0),
        }


class WaymoClipDataset(ClipDataset):
    pass


class PandasetClipDataset(ClipDataset):
    pass


def balance_with_actions(samples: list, increase_factor: int = 5,
                         exceptions: list | None = None) -> list:
    """Vista-legacy command re-balancing: duplicate non-exception command
    samples (subsets/nuscenes.py:8-17)."""
    if exceptions is None:
        exceptions = [2, 3]
    extra = []
    if increase_factor > 1:
        for s in samples:
            if s["cmd"] not in exceptions:
                extra.extend([s] * (increase_factor - 1))
    return samples + extra


def resample_complete_samples(samples: list, increase_factor: int = 5
                              ) -> list:
    """Duplicate samples with complete action annotations
    (subsets/nuscenes.py:20-28)."""
    extra = []
    if increase_factor > 1:
        for s in samples:
            if (s["speed"] and s["angle"] and s["z"] > 0
                    and 0 < s["goal"][0] < 1600 and 0 < s["goal"][1] < 900):
                extra.extend([s] * (increase_factor - 1))
    return samples + extra


class _VistaAnnoDataset:
    """Vista-legacy anno-file clip loader base (vwm/data/subsets/common.py):
    a json list of sample dicts, center aspect crop + LANCZOS resize to
    [-1, 1], Vista conditioning vector set (no LiDAR guidance)."""

    def __init__(self, data_root: str, anno_file: str,
                 target_height: int = 320, target_width: int = 576,
                 num_frames: int = 25):
        if not os.path.isdir(data_root):
            raise FileNotFoundError(data_root)
        if not os.path.exists(anno_file):
            raise FileNotFoundError(anno_file)
        with open(anno_file) as f:
            self.samples = json.load(f)
        self.data_root = data_root
        self.th, self.tw = target_height, target_width
        self.num_frames = num_frames

    def __len__(self) -> int:
        return len(self.samples)

    def _image_path(self, sample: dict, i: int) -> str:
        raise NotImplementedError

    def _prep(self, path: str) -> np.ndarray:
        img = _load_rgb(path)
        return aspect_crop_resize(img, self.th, self.tw,
                                  crop="center") * 2.0 - 1.0

    def __getitem__(self, index: int) -> dict:
        s = self.samples[index]
        imgs = np.stack([self._prep(self._image_path(s, i))
                         for i in range(self.num_frames)])
        return {
            "img_seq": imgs.astype(np.float32),
            "cond_frames_without_noise": imgs[0],
            "fps_id": np.float32(9.0),
            "motion_bucket_id": np.float32(127.0),
            "cond_aug": np.float32(0.0),
        }


class YouTubeClipDataset(_VistaAnnoDataset):
    """Driving-video clips indexed by (folder_name, first_frame)
    (subsets/youtube.py:6-22)."""

    def _image_path(self, sample: dict, i: int) -> str:
        idx_str, ext = sample["first_frame"].split(".")
        name = str(int(idx_str) + i).zfill(len(idx_str)) + "." + ext
        return os.path.join(self.data_root, sample["folder_name"], name)


class NuScenesClipDataset(_VistaAnnoDataset):
    """nuScenes clips with rotating action conditioning
    (subsets/nuscenes.py:31-95): each draw attaches ONE of trajectory /
    command / (speed, angle) / goal, cycling action_mod like the reference
    (used by Vista's action adapters and the reward-estimation entry)."""

    def __init__(self, *args, balance_factor: int = 5,
                 resample_factor: int = 2, **kw):
        super().__init__(*args, **kw)
        self.samples = balance_with_actions(
            self.samples, increase_factor=balance_factor)
        self.samples = resample_complete_samples(
            self.samples, increase_factor=resample_factor)
        self.action_mod = 0

    def _image_path(self, sample: dict, i: int) -> str:
        return os.path.join(self.data_root, sample["frames"][i])

    def __getitem__(self, index: int) -> dict:
        out = super().__getitem__(index)
        s = self.samples[index]
        self.action_mod = (self.action_mod + index) % 4
        if self.action_mod == 0:
            out["trajectory"] = np.asarray(s["traj"][2:], np.float32)
        elif self.action_mod == 1:
            out["command"] = np.float32(s["cmd"])
        elif self.action_mod == 2:
            if s["speed"]:
                out["speed"] = np.asarray(s["speed"][1:], np.float32)
            if s["angle"]:
                out["angle"] = np.asarray(s["angle"][1:], np.float32) / 780.0
        else:
            if s["z"] > 0 and 0 < s["goal"][0] < 1600 \
                    and 0 < s["goal"][1] < 900:
                out["goal"] = np.asarray(
                    [s["goal"][0] / 1600.0, s["goal"][1] / 900.0], np.float32)
        return out


class MultiSourceSampler:
    """Probability-weighted sampling across subsets with prefetch
    (MultiSourceSamplerDataset, dataset.py:108-141; 0.9/0.1 Waymo/Pandaset in
    the reference config).

    ``num_workers > 0`` decodes batches in a process pool (the analog of
    the reference's torch DataLoader workers, waymo_high_res_mix.yaml
    loader config): one 25-frame 576x1024 sample is ~50 PNG decodes
    (~1-2 s of PIL work) — a single producer thread starves the ~2.9 s
    fine-tune step at batch > 1. Sampling choices are made in the parent
    (deterministic given ``seed``); workers only decode, so worker count
    does not change the sample sequence."""

    def __init__(self, datasets: list[ClipDataset],
                 probs: list[float] | None = None,
                 batch_size: int = 1, samples_per_epoch: int = 1000,
                 seed: int = 0, prefetch: int = 2, num_workers: int = 0):
        assert datasets, "no datasets"
        self.datasets = datasets
        if probs is None:
            probs = [len(d) for d in datasets]
        total = float(sum(probs))
        self.probs = [p / total for p in probs]
        self.batch_size = batch_size
        self.samples_per_epoch = samples_per_epoch
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        self.num_workers = num_workers

    def _indices(self) -> list[tuple[int, int]]:
        out = []
        for _ in range(self.batch_size):
            di = int(self.rng.choice(len(self.datasets), p=self.probs))
            out.append((di, int(self.rng.integers(len(self.datasets[di])))))
        return out

    def _fetch(self, idx: list[tuple[int, int]]) -> dict:
        items = [self.datasets[di][si] for di, si in idx]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def _batch(self) -> dict:
        return self._fetch(self._indices())

    def __iter__(self):
        n = self.samples_per_epoch
        if self.num_workers > 0:
            import multiprocessing as mp
            ctx = mp.get_context("fork")  # datasets are picklable-light but
            # fork shares the loaded anno lists for free
            with ctx.Pool(self.num_workers) as pool:
                pending = []
                draws = [self._indices() for _ in range(n)]
                depth = max(self.prefetch, self.num_workers)
                for idx in draws[:depth]:
                    pending.append(pool.apply_async(self._fetch, (idx,)))
                for i in range(n):
                    batch = pending.pop(0).get()
                    nxt = i + depth
                    if nxt < n:
                        pending.append(
                            pool.apply_async(self._fetch, (draws[nxt],)))
                    yield batch
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def producer():
            for _ in range(n):
                q.put(self._batch())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item
