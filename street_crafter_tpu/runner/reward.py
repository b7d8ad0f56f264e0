"""Ensemble reward estimation (the Vista-legacy reward entry).

reward.py / reward_utils.py analog (video_diffusion/reward.py:1-266,
reward_utils.py:285-341): sample an ensemble of videos from the SAME
conditioning with different noise, measure the per-latent variance across
the ensemble, and map it to a scalar confidence ``reward =
exp(-mean(variance))`` — low ensemble disagreement means the model is
confident about the scene's dynamics.

TPU notes: the ensemble loop is a ``lax.map`` over stacked noise inside one
jitted function (one compile; members run back-to-back on-chip). At tiny/
mid shapes ensemble members could instead be folded into the UNet batch
axis, but at the 25×576×1024 sample spec a single member already fills a
v5e with the CFG-doubled batch, so sequential members are the right
schedule.

Vista's action conditioning (trajectory/command/steer/goal embedders) rides
adapter modules that the StreetCrafter UNet config disables; the nuScenes
loader surfaces the action dict for parity but sampling here is the
unconditional-action (free) mode, like ``reward.py --action traj`` with a
checkpoint lacking adapters.

CLI: python -m street_crafter_tpu.runner.reward --dataset IMG \
    --data_root DIR [--ens_size 5] [--n_steps 10] ...
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vdm import diffusion as D
from ..models.vdm.samplers import euler_edm_sample


def reward_from_samples(samples: jax.Array) -> jax.Array:
    """[E, ...] ensemble -> exp(-mean unbiased variance)
    (reward_utils.py:332-338)."""
    E = samples.shape[0]
    u = jnp.mean(samples, axis=0)
    var = jnp.sum((samples - u) ** 2, axis=0) / (E - 1)
    return jnp.exp(-jnp.mean(var))


def ensemble_reward(
    engine,
    params,
    images: jax.Array,            # [T, H, W, 3] real video in [-1, 1]
    key: jax.Array,
    ensemble_size: int = 5,
    num_steps: int = 10,
    cfg_scale: float = 2.5,
    cond_indices: tuple[int, ...] = (0,),
) -> tuple[jax.Array, jax.Array]:
    """Returns (reward scalar, [E, T, h, w, 4] latent ensemble)
    (do_sample, reward_utils.py:285-341). The real video's latents serve as
    the cond-frame source; frame 0 of every sample is pinned to the real
    latent before the variance (:330)."""
    cfgc = engine.cfg
    T = cfgc.num_frames
    z = engine.encode_images_chunked(params, images)
    cond, uc = engine.build_conditioning(params, images[:1])
    cond_mask = jnp.zeros((T,)).at[jnp.asarray(cond_indices)].set(1.0)

    denoise_fn = engine.make_cfg_denoise_fn(
        params, cond, uc, None, cond_mask, cfg_scale)
    sigmas = D.edm_sigmas(num_steps, cfgc.sigma_min, cfgc.sigma_max,
                          cfgc.rho)

    def one(k: jax.Array) -> jax.Array:
        noise = jax.random.normal(k, z.shape)
        s = euler_edm_sample(denoise_fn, noise, sigmas,
                             cond_frame=z, cond_mask=cond_mask)
        return s.at[0].set(z[0])

    samples = jax.lax.map(one, jax.random.split(key, ensemble_size))
    return reward_from_samples(samples), samples


def load_reward_image(path: str, th: int, tw: int) -> np.ndarray:
    """Center aspect crop + LANCZOS resize to [-1, 1]
    (reward.py:174-205 ``load_img`` — center crop on BOTH axes, unlike the
    training data's bottom-biased crop)."""
    from PIL import Image
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    w, h = img.size
    if w / h > tw / th:
        cw = int(tw / th * h)
        img = img.crop(((w - cw) // 2, 0, (w + cw) // 2, h))
    elif w / h < tw / th:
        ch = int(th / tw * w)
        img = img.crop((0, (h - ch) // 2, w, (h + ch) // 2))
    img = img.resize((tw, th), resample=Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0 * 2.0 - 1.0


def get_sample(index: int, dataset: str, data_root: str,
               anno_file: str | None = None, num_frames: int = 25,
               action_mode: str = "traj"
               ) -> tuple[list[str], int, int, dict[str, Any] | None]:
    """(frame paths, wrapped index, dataset length, action dict)
    (reward.py:122-172). IMG mode repeats a single image; NUSCENES reads
    the annotation json's frame/action lists."""
    if dataset == "IMG":
        files = sorted(os.listdir(data_root))
        index %= len(files)
        return ([os.path.join(data_root, files[index])] * num_frames,
                index, len(files), None)
    if dataset != "NUSCENES":
        raise ValueError(f"invalid dataset {dataset}")
    with open(anno_file) as f:
        annos = json.load(f)
    index %= len(annos)
    s = annos[index]
    paths = [os.path.join(data_root, s["frames"][i])
             for i in range(num_frames)]
    action: dict[str, Any] = {}
    if action_mode in ("traj", "trajectory"):
        action["trajectory"] = np.asarray(s["traj"][2:])
    elif action_mode in ("cmd", "command"):
        action["command"] = np.asarray(s["cmd"])
    elif action_mode == "steer":
        if s.get("speed"):
            action["speed"] = np.asarray(s["speed"][1:])
        if s.get("angle"):
            action["angle"] = np.asarray(s["angle"][1:]) / 780
    elif action_mode == "goal":
        if (s["z"] > 0 and 0 < s["goal"][0] < 1600
                and 0 < s["goal"][1] < 900):
            action["goal"] = np.asarray(
                [s["goal"][0] / 1600, s["goal"][1] / 900])
    else:
        raise ValueError(f"unsupported action mode {action_mode}")
    return paths, index, len(annos), action


def main(argv: list[str] | None = None) -> None:
    import argparse

    from ..config import default_config
    from ..models.vdm.engine import VideoDiffusionEngine
    from ..models.vdm.weights import engine_from_config, load_vdm_params

    p = argparse.ArgumentParser(description="ensemble reward estimation")
    p.add_argument("--dataset", default="IMG",
                   choices=["IMG", "NUSCENES"])
    p.add_argument("--data_root", required=True)
    p.add_argument("--anno_file", default=None)
    p.add_argument("--save", default="outputs/reward")
    p.add_argument("--action", default="traj")
    p.add_argument("--n_frames", type=int, default=25)
    p.add_argument("--n_conds", type=int, default=1)
    p.add_argument("--ens_size", type=int, default=5)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--height", type=int, default=576)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--cfg_scale", type=float, default=2.5)
    p.add_argument("--n_steps", type=int, default=10)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--count", type=int, default=1)
    p.add_argument("opts", nargs="*", default=[])
    args = p.parse_args(argv)

    cfg = default_config()
    from ..config import merge_dotlist
    merge_dotlist(cfg, args.opts)
    cfg.diffusion.sample_frames = args.n_frames
    engine = VideoDiffusionEngine(engine_from_config(cfg.diffusion))
    params = load_vdm_params(engine, cfg.diffusion)

    os.makedirs(args.save, exist_ok=True)
    index = args.index
    for _ in range(args.count):
        paths, index, length, action = get_sample(
            index, args.dataset, args.data_root, args.anno_file,
            args.n_frames, args.action)
        images = jnp.asarray(np.stack(
            [load_reward_image(pth, args.height, args.width)
             for pth in paths]))
        reward, _ = ensemble_reward(
            engine, params, images, jax.random.PRNGKey(args.seed),
            ensemble_size=args.ens_size, num_steps=args.n_steps,
            cfg_scale=args.cfg_scale,
            cond_indices=tuple(range(args.n_conds)))
        rec = {"index": index, "reward": float(reward),
               "frames": paths[:1], "action_keys":
               sorted(action) if action else []}
        print(json.dumps(rec))
        with open(os.path.join(args.save, "rewards.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        index += 1


if __name__ == "__main__":
    main()
