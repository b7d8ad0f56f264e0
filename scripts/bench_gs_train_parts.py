"""Where does the 1.0 s GS train step go? (640x960, 200k splats)

Incremental variants between the plain render fwd+bwd (~96 ms measured) and
the full jitted train step (~1003 ms measured): +viewspace_zero grads,
+absgrad sink, +full loss stack, +Adam/stat accumulation.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from street_crafter_tpu.config import default_config
from street_crafter_tpu.datasets import Camera
from street_crafter_tpu.models.gs.losses import LossWeights, compute_train_loss
from street_crafter_tpu.models.gs.renderer import render_scene
from street_crafter_tpu.models.gs.scene import SceneParams
from street_crafter_tpu.ops.ssim import ssim

from bench import build_trained_like_scene


def timed(fn, inputs, iters=6):
    out = fn(*inputs[0])
    _ = float(jax.tree.leaves(out)[0].sum())
    t0 = time.perf_counter()
    outs = [fn(*inputs[i % len(inputs)]) for i in range(iters)]
    _ = float(jax.tree.leaves(outs[-1])[0].sum())
    return (time.perf_counter() - t0) / iters


def main():
    N, H, W = 200_000, 640, 960
    pool = build_trained_like_scene(N)
    params = SceneParams(
        bkgd=pool, actors=None, sky=None, opt_trans=None, opt_theta=None,
        sky_cubemap=None, color_corr=None, color_corr_sky=None,
        pose_corr_quat=None, pose_corr_trans=None)

    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam = Camera.from_c2w(np.eye(4, dtype=np.float32), K, W, H)
    gts = [jax.random.uniform(jax.random.PRNGKey(i), (H, W, 3))
           for i in range(3)]

    mpt = 256
    nb = pool.capacity

    def render(p, vz=None, sink=None):
        return render_scene(p, None, cam, max_per_tile=mpt, clamp=True,
                            viewspace_zero=vz, absgrad_sink=sink)

    @jax.jit
    def bwd_l1_ssim(params, gt):
        def f(p):
            out = render(p)
            l1 = jnp.mean(jnp.abs(out["rgb"] - gt))
            return l1 + 0.2 * (1.0 - ssim(out["rgb"], gt))
        g = jax.grad(f, allow_int=True)(params)
        return jnp.sum(g.bkgd.xyz)

    @jax.jit
    def bwd_vz(params, gt):
        def f(p, vz):
            out = render(p, vz=vz)
            l1 = jnp.mean(jnp.abs(out["rgb"] - gt))
            return l1 + 0.2 * (1.0 - ssim(out["rgb"], gt))
        g, gvz = jax.grad(f, argnums=(0, 1), allow_int=True)(
            params, jnp.zeros((nb, 2), jnp.float32))
        return jnp.sum(g.bkgd.xyz) + jnp.sum(gvz)

    @jax.jit
    def bwd_vz_abs(params, gt):
        def f(p, vz, sink):
            out = render(p, vz=vz, sink=sink)
            l1 = jnp.mean(jnp.abs(out["rgb"] - gt))
            return l1 + 0.2 * (1.0 - ssim(out["rgb"], gt))
        z = jnp.zeros((nb, 2), jnp.float32)
        g, gvz, gabs = jax.grad(f, argnums=(0, 1, 2), allow_int=True)(
            params, z, z)
        return jnp.sum(g.bkgd.xyz) + jnp.sum(gvz) + jnp.sum(gabs)

    cfg = default_config()
    cfg.optim.lambda_depth_lidar = 0.0
    weights = LossWeights(
        lambda_l1=cfg.optim.lambda_l1, lambda_dssim=cfg.optim.lambda_dssim,
        lambda_lpips=0.0, lambda_sky=cfg.optim.lambda_sky,
        lambda_reg=cfg.optim.lambda_reg, lambda_depth_lidar=0.0,
        lambda_scale_flatten=cfg.optim.lambda_scale_flatten,
        lambda_color_correction=cfg.optim.lambda_color_correction,
        lambda_novel=cfg.optim.lambda_novel,
        lambda_novel_l1=cfg.optim.lambda_novel_l1,
        lambda_novel_dssim=cfg.optim.lambda_novel_dssim,
        lambda_novel_lpips=0.0)

    @jax.jit
    def bwd_fullloss(params, gt):
        def f(p, vz, sink):
            out = render(p, vz=vz, sink=sink)
            batch = {"gt_image": gt, "frame_idx": jnp.int32(0),
                     "frame": jnp.float32(0), "cam_id": jnp.int32(0)}
            loss, scalars = compute_train_loss(
                out, batch, weights, is_novel=False, lpips_fn=None,
                scene_scaling=p.bkgd.get_scaling(), scene_valid=p.bkgd.valid,
                color_corr=None, color_corr_sky=None, acc_obj=None)
            return loss
        z = jnp.zeros((nb, 2), jnp.float32)
        g, gvz, gabs = jax.grad(f, argnums=(0, 1, 2), allow_int=True)(
            params, z, z)
        return jnp.sum(g.bkgd.xyz) + jnp.sum(gvz) + jnp.sum(gabs)

    inputs = [(params, g) for g in gts]
    for tag, f in (("L1+SSIM bwd (base)", bwd_l1_ssim),
                   ("+ viewspace_zero", bwd_vz),
                   ("+ absgrad sink", bwd_vz_abs),
                   ("+ full loss stack", bwd_fullloss)):
        dt = timed(f, inputs)
        print(f"{tag:26s}: {dt*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
