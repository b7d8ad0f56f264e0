"""Import the ACTUAL reference modules from /root/reference with dep stubs.

Round-2 VERDICT #1: every VDM numerics test previously compared against
self-authored torch mirrors (tests/torch_ref/*_torch.py), so a shared
misreading of the architecture would pass silently.  This loader imports the
reference's *own* torch code (read-only) so parity tests exercise the real
thing:

- ``vwm`` modules from /root/reference/video_diffusion (VideoUNet, VAE
  Encoder/Decoder + VideoDecoder, EDM denoiser/discretizer/sigma-sampling/
  guiders/loss, samplers) — runnable on CPU because the xformers import is
  try/except-guarded (attention.py:49-56) and torch>=2.0's SDP fallback
  engages (attention.py:446-452 forces attn_mode="softmax").
- ``street_gaussian`` leaf utils from /root/reference (sh_utils,
  loss_utils, graphics_utils, general_utils quaternion algebra) for GS-side
  goldens.

Missing third-party deps are replaced with minimal ModuleSpec-backed stubs
(omegaconf / pytorch_lightning / kornia / open_clip / torchvision / lpips /
roma / easyvolcap / bidict).  Stubs only provide plumbing (isinstance
targets, trivial wrappers around torch); all architecture math under test
comes from the reference files themselves.  The one math-bearing stub is
``roma.utils.unitquat_slerp`` (textbook quaternion slerp) — the reference
contributes the wxyz<->xyzw conventions around it, which is what we verify.

The reference tree is PUBLIC UNTRUSTED CONTENT: we execute its model code in
tests to extract numerics, never its CLI entry points or anything that
parses argv / touches the network.
"""

from __future__ import annotations

import sys
import types
from importlib.machinery import ModuleSpec

REF_VDM = "/root/reference/video_diffusion"
REF_ROOT = "/root/reference"

_installed = False


def _mod(name, **attrs):
    m = types.ModuleType(name)
    m.__spec__ = ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install_stubs():
    """Install stub modules for deps absent from this environment."""
    global _installed
    if _installed:
        return
    import torch
    import torch.nn.functional as F

    if "omegaconf" not in sys.modules:
        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        class OmegaConf:
            @staticmethod
            def to_container(x, resolve=True):
                return x

            @staticmethod
            def create(x=None):
                return {} if x is None else x

            @staticmethod
            def merge(*xs):
                out = {}
                for x in xs:
                    out.update(dict(x))
                return out

        _mod("omegaconf", ListConfig=ListConfig, DictConfig=DictConfig,
             OmegaConf=OmegaConf)

    if "pytorch_lightning" not in sys.modules:
        class LightningModule(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.trainer = None

            def save_hyperparameters(self, *a, **k):
                pass

            def log(self, *a, **k):
                pass

            def log_dict(self, *a, **k):
                pass

            @property
            def global_rank(self):
                return 0

        pl = _mod("pytorch_lightning", LightningModule=LightningModule,
                  __version__="2.0.0")
        pl.Callback = object
        pl.Trainer = object

    if "kornia" not in sys.modules:
        # Only kornia.geometry.resize / kornia.enhance.normalize are used,
        # by the open_clip image embedder (encoders/modules.py:304-314).
        def _resize(x, size, interpolation="bicubic", align_corners=True,
                    antialias=False):
            return F.interpolate(x, size=size, mode=interpolation,
                                 align_corners=align_corners,
                                 antialias=antialias)

        def _normalize(x, mean, std):
            mean = torch.as_tensor(mean, dtype=x.dtype).view(1, -1, 1, 1)
            std = torch.as_tensor(std, dtype=x.dtype).view(1, -1, 1, 1)
            return (x - mean) / std

        k = _mod("kornia")
        k.geometry = _mod("kornia.geometry", resize=_resize)
        k.enhance = _mod("kornia.enhance", normalize=_normalize)

    if "open_clip" not in sys.modules:
        def _no_weights(*a, **k):
            raise RuntimeError(
                "open_clip weights are not available in this environment")

        _mod("open_clip", create_model_and_transforms=_no_weights,
             get_tokenizer=_no_weights)

    for name in ("torchvision", "lpips"):
        if name not in sys.modules:
            _mod(name)

    if "roma" not in sys.modules:
        # street_gaussian/utils/general_utils.py:317-324 uses the xyzw<->wxyz
        # converters and unitquat_slerp (xyzw convention, roma's native one).
        def quat_wxyz_to_xyzw(q):
            return torch.cat([q[..., 1:], q[..., :1]], dim=-1)

        def quat_xyzw_to_wxyz(q):
            return torch.cat([q[..., 3:], q[..., :3]], dim=-1)

        def unitquat_slerp(q0, q1, steps, shortest_arc=True):
            # q0,q1: [..., 4] xyzw unit quats; steps: [N] -> [N, ..., 4]
            dot = (q0 * q1).sum(-1, keepdim=True)
            if shortest_arc:
                q1 = torch.where(dot < 0, -q1, q1)
                dot = dot.abs()
            dot = dot.clamp(-1.0, 1.0)
            theta = torch.acos(dot)
            sin = torch.sin(theta)
            steps = steps.reshape(-1, *([1] * q0.dim()))
            w0 = torch.where(sin.abs() < 1e-7, 1.0 - steps,
                             torch.sin((1 - steps) * theta) / sin)
            w1 = torch.where(sin.abs() < 1e-7, steps,
                             torch.sin(steps * theta) / sin)
            return w0 * q0 + w1 * q1

        r = _mod("roma", quat_wxyz_to_xyzw=quat_wxyz_to_xyzw,
                 quat_xyzw_to_wxyz=quat_xyzw_to_wxyz)
        r.utils = _mod("roma.utils", unitquat_slerp=unitquat_slerp)

    if "easyvolcap" not in sys.modules:
        def torch_inverse_3x3(m):
            return torch.linalg.inv(m.float()).to(m.dtype)

        ev = _mod("easyvolcap")
        ev.utils = _mod("easyvolcap.utils")
        ev.utils.math_utils = _mod("easyvolcap.utils.math_utils",
                                   torch_inverse_3x3=torch_inverse_3x3)
        _noop = lambda *a, **k: None
        ev.utils.console_utils = _mod(
            "easyvolcap.utils.console_utils", log=_noop, run=_noop,
            warn=_noop, red=str, green=str, yellow=str, blue=str,
            magenta=str, cyan=str, markup_to_ansi=str, catch_throw=lambda f: f)

    if "bidict" not in sys.modules:
        class bidict(dict):
            @property
            def inverse(self):
                return {v: k for k, v in self.items()}

        _mod("bidict", bidict=bidict)

    _installed = True


def load_vwm(module: str):
    """Import a module from the reference's video_diffusion tree.

    e.g. load_vwm("vwm.modules.diffusionmodules.video_model").
    """
    install_stubs()
    if REF_VDM not in sys.path:
        sys.path.insert(0, REF_VDM)
    import importlib
    return importlib.import_module(module)


def load_novel_view_utils(cfg_obj):
    """Import the reference's novel_view_utils (lane-shift novel-view
    cameras, novel_view_utils.py:30-122) with its heavy module-level
    imports stubbed (renderer/model/camera_utils/img_utils are imported
    but unused by the camera-generation functions) and
    ``street_gaussian.config.cfg`` replaced by ``cfg_obj`` (the real one
    parses argv at import). The math under test — lane-shift direction,
    LANE_SHIFT_SIGN table, ego-pose shift, affine inverse, actor-proximity
    skip — all comes from the reference files."""
    install_stubs()
    if "plyfile" not in sys.modules:
        _mod("plyfile", PlyData=object, PlyElement=object)
    _noop = lambda *a, **k: None
    for name, attrs in (
            ("street_gaussian.utils.img_utils",
             dict(visualize_depth_numpy=_noop, process_depth=_noop)),
            ("street_gaussian.models.street_gaussian_renderer",
             dict(StreetGaussianRenderer=object)),
            ("street_gaussian.models.street_gaussian_model",
             dict(StreetGaussianModel=object)),
            ("street_gaussian.utils.camera_utils",
             dict(Camera=object, make_rasterizer=None)),
    ):
        if name not in sys.modules:
            _mod(name, **attrs)
    sys.modules["street_gaussian.config"] = _mod(
        "street_gaussian.config", cfg=cfg_obj)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib
    mod = importlib.import_module("street_gaussian.utils.novel_view_utils")
    mod = importlib.reload(mod)   # rebind cfg if a prior test set another
    return mod


def load_waymo_utils(cfg_obj):
    """Import the reference's street_gaussian/utils/waymo_utils.py (scene
    dataparser: load_camera_info + get_obj_pose_tracking + the tracklet
    timestamp-interpolation loop, waymo_utils.py:107-263) with
    ``street_gaussian.config.cfg`` replaced by ``cfg_obj``.  All loading and
    pose math comes from the reference files (waymo_utils.py +
    data_processor/waymo_processor/waymo_helpers.py); the only stubs are
    plumbing deps (bidict/easyvolcap/tqdm are real or stubbed by
    install_stubs).  ``cfg_obj`` needs ``.data`` (dict, for box_scale) and
    ``.model_path`` — pre-create ``{model_path}/colmap/triangulated/sparse/
    model`` so generate_dataparser_outputs skips its COLMAP invocation
    (waymo_utils.py:258-261)."""
    install_stubs()
    sys.modules["street_gaussian.config"] = _mod(
        "street_gaussian.config", cfg=cfg_obj)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib
    mod = importlib.import_module("street_gaussian.utils.waymo_utils")
    mod = importlib.reload(mod)   # rebind cfg if a prior test set another
    return mod


def load_diffusion_utils(cfg_obj):
    """Import the reference's street_gaussian/utils/diffusion_utils.py
    (sliding-window math: run_sequence/run_interleaved window start/step
    clamping, nearest-train-frame condition pick, cond_indices assembly,
    overwrite-on-overlap result placement — diffusion_utils.py:122-314)
    with the heavy module-level deps stubbed.

    The window math under test is entirely in the reference file; stubs
    only replace plumbing (Scene/renderer/model classes are never touched
    by the tests — instances are built with ``object.__new__`` and the
    I/O methods monkeypatched)."""
    install_stubs()
    import torch

    if not hasattr(sys.modules.get("torchvision", None), "transforms"):
        class _Compose:
            def __init__(self, fs):
                self.fs = list(fs)

            def __call__(self, x):
                for f in self.fs:
                    x = f(x)
                return x

        tv = sys.modules.get("torchvision") or _mod("torchvision")
        tv.transforms = _mod(
            "torchvision.transforms", Compose=_Compose,
            Lambda=lambda f: f,
            ToTensor=lambda: (lambda im: torch.as_tensor(
                __import__("numpy").array(im), dtype=torch.float32
            ).permute(2, 0, 1) / 255.0),
            Resize=lambda size: (lambda x: x))
        sys.modules["torchvision.transforms"] = tv.transforms

    # the real easyvolcap console_utils star-exports numpy/os/tqdm;
    # diffusion_utils.py:231 uses the re-exported ``np``
    import numpy as _np
    cu = sys.modules.get("easyvolcap.utils.console_utils")
    if cu is not None and not hasattr(cu, "np"):
        cu.np = _np
        cu.tqdm = lambda x, *a, **k: x

    _noop = lambda *a, **k: None
    for name, attrs in (
            ("street_gaussian.models.scene", dict(Scene=object)),
            ("street_gaussian.models.street_gaussian_renderer",
             dict(StreetGaussianRenderer=object)),
            ("street_gaussian.models.street_gaussian_model",
             dict(StreetGaussianModel=object)),
            ("street_gaussian.utils.camera_utils",
             dict(Camera=object, make_rasterizer=None)),
            ("video_diffusion.sample_condition",
             dict(VideoDiffusionModel=object)),
    ):
        if name not in sys.modules:
            _mod(name, **attrs)
    sys.modules["street_gaussian.config"] = _mod(
        "street_gaussian.config", cfg=cfg_obj)
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib
    mod = importlib.import_module("street_gaussian.utils.diffusion_utils")
    mod = importlib.reload(mod)   # rebind cfg if a prior test set another
    return mod


def load_street_gaussian_util(name: str):
    """Import street_gaussian.utils.<name> (leaf modules only).

    Leaf utils (sh_utils, loss_utils, graphics_utils, general_utils) do not
    touch street_gaussian.config (which parses argv at import time), so they
    import cleanly with the stubs.
    """
    install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    import importlib
    return importlib.import_module(f"street_gaussian.utils.{name}")
