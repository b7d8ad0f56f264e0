"""Parity oracle vs the reference's ACTUAL conditioner / engine chunking /
window math (VERDICT r3 #5 — the last slice of the round-2 "shared
misreading" risk).

Loads the reference's own torch modules via tests/torch_ref/reference_loader
and checks, against street_crafter_tpu:

- ConcatTimestepEmbedderND (encoders/modules.py:407-430) vs
  conditioner.concat_timestep_embed;
- VideoPredictionEmbedderWithEncoder layout/scale/repeat semantics
  (modules.py:433-507) vs the conditioner's concat assembly;
- GeneralConditioner routing + get_unconditional_conditioning zeroing
  (modules.py:70-184) vs conditioner.get_conditioning;
- DiffusionEngine.encode_first_stage / decode_first_stage overlap-3
  chunk blending (diffusion_condition.py:158-229) vs
  engine.encode_images_chunked / decode_latents_chunked;
- DiffusionEngine.get_guidance scale layout (diffusion_condition.py:158-180);
- WaymoDiffusionRunner.run_sequence / run_interleaved sliding-window math
  (window clamping, nearest-train-frame condition pick, cond_indices,
  overwrite-on-overlap placement — diffusion_utils.py:122-347) vs
  runner.diffusion.DiffusionRunner.

Heavy reference deps are stubbed (reference_loader); every deterministic
encoder/decoder injected into BOTH sides is bit-identical math authored
here, so any mismatch isolates to the reference's vs our own assembly
logic.
"""

from __future__ import annotations

import contextlib
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests.torch_ref import reference_loader as refload

pytestmark = pytest.mark.filterwarnings("ignore")


def rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@contextlib.contextmanager
def cuda_to_cpu():
    """Route .to('cuda') and torch.zeros(device='cuda') to CPU (the window
    loops hardcode cuda placement, diffusion_utils.py:252,310)."""
    orig_to = torch.Tensor.to
    orig_zeros = torch.zeros

    def patched_to(self, *args, **kwargs):
        args = tuple(
            "cpu" if (a == "cuda" or (isinstance(a, torch.device)
                                      and a.type == "cuda")) else a
            for a in args)
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        kwargs.pop("non_blocking", None)
        return orig_to(self, *args, **kwargs)

    def patched_zeros(*args, **kwargs):
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        return orig_zeros(*args, **kwargs)

    torch.Tensor.to = patched_to
    torch.zeros = patched_zeros
    try:
        yield
    finally:
        torch.Tensor.to = orig_to
        torch.zeros = orig_zeros


# ------------------------------------------------------------------ injected
# deterministic "encoders" — identical math on both frameworks, so parity
# failures isolate to the surrounding reference/our assembly logic.

_W_CROSS = np.cos(np.arange(3 * 1024, dtype=np.float64).reshape(3, 1024)
                  * 0.01).astype(np.float32)


def _tiny_enc_np(x_nhwc):
    """[N, H, W, 3] -> [N, H/8, W/8, 4]: exact 8x8 box mean + derived ch."""
    n, h, w, c = x_nhwc.shape
    y = x_nhwc.reshape(n, h // 8, 8, w // 8, 8, c).mean(axis=(2, 4))
    return np.concatenate([y, 0.5 * y[..., :1] - 0.25], axis=-1)


def _install_oracle_encoders():
    """Register torch twins of the injected encoders importable by the
    reference's instantiate_from_config (util.py:154-166)."""
    if "graft_oracle_enc" in sys.modules:
        return
    mod_ref = refload.load_vwm("vwm.modules.encoders.modules")

    class TinyEnc(torch.nn.Module):
        def forward(self, x):                       # [N, 3, H, W]
            y = torch.nn.functional.avg_pool2d(x, 8)
            return torch.cat([y, 0.5 * y[:, :1] - 0.25], 1)

    class CrossEmb(mod_ref.AbstractEmbModel):
        def forward(self, x):                       # [N, 3, H, W]
            feat = x.mean((2, 3))                   # [N, 3]
            return (feat @ torch.from_numpy(_W_CROSS))[:, None, :]

    m = types.ModuleType("graft_oracle_enc")
    m.TinyEnc, m.CrossEmb = TinyEnc, CrossEmb
    sys.modules["graft_oracle_enc"] = m


def _tiny_enc_jax(x):                               # [N, H, W, 3]
    n, h, w, c = x.shape
    y = x.reshape(n, h // 8, 8, w // 8, 8, c).mean(axis=(2, 4))
    return jnp.concatenate([y, 0.5 * y[..., :1] - 0.25], axis=-1)


def _cross_emb_jax(x):                              # [N, H, W, 3] -> [N, 1024]
    return x.mean((1, 2)) @ jnp.asarray(_W_CROSS)


# =================================================================== embedders


def test_concat_timestep_embedder_vs_reference():
    """ConcatTimestepEmbedderND: per-dim sinusoid embed + concat order
    (modules.py:407-430)."""
    mod = refload.load_vwm("vwm.modules.encoders.modules")
    emb = mod.ConcatTimestepEmbedderND(outdim=256)
    x = torch.tensor([[10.0, 127.0, 0.02], [3.0, 50.0, 1.5]])
    ref = emb(x).numpy()                            # [2, 768]

    from street_crafter_tpu.models.vdm.conditioner import (
        concat_timestep_embed, make_vector_conditioning)
    got = np.asarray(concat_timestep_embed(jnp.asarray(x.numpy()), 256))
    assert ref.shape == got.shape == (2, 768)
    assert rel_err(got, ref) < 1e-5

    # the sampler's vector conditioning = three scalar embedders in config
    # order fps/motion/cond_aug (waymo_high_res.yaml:58-72,102-105)
    vec = np.asarray(make_vector_conditioning(
        jnp.asarray(x.numpy()[:, 0]), jnp.asarray(x.numpy()[:, 1]),
        jnp.asarray(x.numpy()[:, 2]), 256))
    per = np.concatenate([emb(x[:, i: i + 1]).numpy() for i in range(3)], -1)
    assert rel_err(vec, per) < 1e-5


def test_video_prediction_embedder_vs_reference():
    """VideoPredictionEmbedderWithEncoder: encode -> *scale ->
    (b t) c h w -> b () (t c) h w -> (b s) repeat (modules.py:466-505)."""
    mod = refload.load_vwm("vwm.modules.encoders.modules")
    _install_oracle_encoders()
    T, B = 3, 2
    sf = 0.18215
    emb = mod.VideoPredictionEmbedderWithEncoder(
        n_cond_frames=1, n_copies=T,
        encoder_config={"target": "graft_oracle_enc.TinyEnc"},
        is_ae=False, scale_factor=sf, disable_encoder_autocast=True)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 16, 24, 3), np.float32)
    ref = to_nhwc(emb(nchw(x)))                     # [B*T, 2, 3, 4]

    ours = np.asarray(jnp.repeat(_tiny_enc_jax(jnp.asarray(x)) * sf, T,
                                 axis=0))
    assert ref.shape == ours.shape == (B * T, 2, 3, 4)
    assert rel_err(ours, ref) < 1e-5


def test_general_conditioner_routing_vs_reference():
    """GeneralConditioner: dim->key routing, cat dims, per-sample loop and
    get_unconditional_conditioning with the sampler's
    force_uc_zero_embeddings=[cond_frames, cond_frames_without_noise]
    (modules.py:116-184, sample_condition.py:431) vs get_conditioning."""
    mod = refload.load_vwm("vwm.modules.encoders.modules")
    _install_oracle_encoders()
    T = 4
    sf = 0.18215
    cte = "vwm.modules.encoders.modules.ConcatTimestepEmbedderND"
    emb_models = [
        {"input_key": "cond_frames_without_noise",
         "target": "graft_oracle_enc.CrossEmb"},
        {"input_key": "fps_id", "target": cte, "params": {"outdim": 256}},
        {"input_key": "motion_bucket_id", "target": cte,
         "params": {"outdim": 256}},
        {"input_key": "cond_frames",
         "target": "vwm.modules.encoders.modules."
                   "VideoPredictionEmbedderWithEncoder",
         "params": {"n_cond_frames": 1, "n_copies": 1, "is_ae": False,
                    "scale_factor": sf, "disable_encoder_autocast": True,
                    "encoder_config": {"target": "graft_oracle_enc.TinyEnc"}}},
        {"input_key": "cond_aug", "target": cte, "params": {"outdim": 256}},
    ]
    conditioner = mod.GeneralConditioner(emb_models)

    rng = np.random.default_rng(1)
    frame = rng.standard_normal((16, 24, 3), np.float32)
    fps, motion, aug = 10.0, 127.0, 0.02
    # the sampler batches every key [T, ...] (get_batch repeats the single
    # conditioning frame per sampled frame, sample_condition.py:209-257)
    batch = {
        "cond_frames_without_noise": nchw(np.repeat(frame[None], T, 0)),
        "cond_frames": nchw(np.repeat(frame[None], T, 0)),
        "fps_id": torch.full((T,), fps),
        "motion_bucket_id": torch.full((T,), motion),
        "cond_aug": torch.full((T,), aug),
    }
    with torch.no_grad():
        c, uc = conditioner.get_unconditional_conditioning(
            batch, force_uc_zero_embeddings=["cond_frames",
                                             "cond_frames_without_noise"])
    assert set(c) == {"crossattn", "vector", "concat"}

    from street_crafter_tpu.models.vdm.conditioner import get_conditioning
    cond, ucond = get_conditioning(
        clip_embed_fn=_cross_emb_jax,
        vae_encode_fn=lambda im: _tiny_enc_jax(im) * sf,
        cond_frame_without_noise=jnp.asarray(frame[None]),
        cond_frame=jnp.asarray(frame[None]),
        num_frames=T, fps_id=fps, motion_bucket_id=motion, cond_aug=aug)

    assert rel_err(np.asarray(cond.crossattn), c["crossattn"].numpy()) < 1e-5
    assert rel_err(np.asarray(cond.vector), c["vector"].numpy()) < 1e-5
    assert rel_err(np.asarray(cond.concat),
                   to_nhwc(c["concat"])) < 1e-5
    # uc: crossattn/concat zeroed, vector kept (guiders prepare_inputs pairs
    # them; our Conditioning mirrors that contract)
    assert np.abs(uc["crossattn"].numpy()).max() == 0
    assert np.abs(to_nhwc(uc["concat"])).max() == 0
    assert rel_err(uc["vector"].numpy(), c["vector"].numpy()) < 1e-6
    assert np.abs(np.asarray(ucond.crossattn)).max() == 0
    assert np.abs(np.asarray(ucond.concat)).max() == 0
    assert rel_err(np.asarray(ucond.vector), np.asarray(cond.vector)) < 1e-6


# ============================================================ engine chunking


def _ref_engine(sf=0.18215, n_at_a_time=8):
    dc = refload.load_vwm("vwm.models.diffusion_condition")
    eng = object.__new__(dc.DiffusionEngine)
    eng.scale_factor = sf
    eng.en_and_decode_n_samples_a_time = n_at_a_time
    eng.disable_first_stage_autocast = True
    return dc, eng


def _mock_decode_torch(zs, timesteps):
    """Chunk-context-dependent decode: exposes any boundary/blend drift."""
    return zs * 1.7 + zs.mean(dim=0, keepdim=True) * 0.3 + 0.01 * timesteps


def _mock_decode_jax(zs, num_frames):
    return zs * 1.7 + zs.mean(axis=0, keepdims=True) * 0.3 + 0.01 * num_frames


@pytest.mark.parametrize("n", [6, 13, 14])
def test_chunked_decode_vs_reference(n):
    """decode_first_stage overlap-3 blending: context window assembly,
    averaged overlap halves, ragged tail (diffusion_condition.py:183-214)
    vs engine.decode_latents_chunked."""
    sf = 0.18215
    dc, eng = _ref_engine(sf=sf, n_at_a_time=8)

    class FakeVideoDecoder(dc.VideoDecoder):
        def __init__(self):
            pass

    fsm = types.SimpleNamespace(
        decode=lambda z, timesteps: _mock_decode_torch(z, timesteps),
        decoder=FakeVideoDecoder())
    eng.first_stage_model = fsm

    rng = np.random.default_rng(2)
    z = rng.standard_normal((n, 4, 6, 5), np.float32)
    with torch.no_grad():
        ref = eng.decode_first_stage(torch.from_numpy(z), overlap=3).numpy()

    from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                      VideoDiffusionEngine)
    ours_eng = VideoDiffusionEngine(EngineConfig.tiny())
    # inject the twin decode (incl. the reference's global 1/sf unscale)
    ours_eng.decode_latents = lambda params, zz, num_frames=None: \
        _mock_decode_jax(zz / sf, num_frames)
    out = np.asarray(ours_eng.decode_latents_chunked(
        None, jnp.asarray(z), chunk=8, overlap=3))
    assert out.shape == ref.shape
    assert rel_err(out, ref) < 1e-5


def test_chunked_encode_vs_reference():
    """encode_first_stage plain chunking + scale
    (diffusion_condition.py:216-229) vs engine.encode_images_chunked."""
    sf = 0.18215
    _, eng = _ref_engine(sf=sf, n_at_a_time=4)
    eng.first_stage_model = types.SimpleNamespace(
        encode=lambda x: torch.nn.functional.avg_pool2d(x, 2) * 1.3 + 0.1)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((10, 3, 8, 12), np.float32)
    with torch.no_grad():
        ref = eng.encode_first_stage(torch.from_numpy(x)).numpy()

    from street_crafter_tpu.models.vdm.engine import (EngineConfig,
                                                      VideoDiffusionEngine)
    ours_eng = VideoDiffusionEngine(EngineConfig.tiny())

    def enc(params, imgs, key=None):
        n, c, h, w = imgs.shape   # keep NCHW to reuse identical math
        y = imgs.reshape(n, c, h // 2, 2, w // 2, 2).mean(axis=(3, 5))
        return (y * 1.3 + 0.1) * sf

    ours_eng.encode_images = enc
    out = np.asarray(ours_eng.encode_images_chunked(None, jnp.asarray(x),
                                                    chunk=4))
    assert rel_err(out, ref) < 1e-5


def test_get_guidance_vs_reference():
    """get_guidance: (b t) flattening, per-element scale fill, ucg zeroing
    granularity (diffusion_condition.py:158-180)."""
    sf = 0.5
    _, eng = _ref_engine(sf=sf, n_at_a_time=8)
    eng.guidance_key = "guide"
    eng.num_frames = 3
    eng.first_stage_model = types.SimpleNamespace(
        encode=lambda x: torch.nn.functional.avg_pool2d(x, 2) * 1.3 + 0.1)

    rng = np.random.default_rng(4)
    b, t = 2, 3
    guide = rng.standard_normal((b, t, 3, 8, 12), np.float32)
    with torch.no_grad():
        g = eng.get_guidance({"guide": torch.from_numpy(guide.copy())},
                             scale=0.7, ucg_rate=0.0)
    # scales: ones(b, t) * scale flattened (b t)
    assert g["scale"].shape == (b * t,)
    assert np.allclose(g["scale"].numpy(), 0.7)
    # latents: frames flattened b-major — matches our [T] leading axis
    flat = torch.from_numpy(guide.reshape(b * t, 3, 8, 12))
    with torch.no_grad():
        want = eng.encode_first_stage(flat).numpy()
    assert rel_err(g["input"].numpy(), want) < 1e-6

    # ucg_rate=1 zeroes whole batch elements' scale rows
    with torch.no_grad():
        g0 = eng.get_guidance({"guide": torch.from_numpy(guide.copy())},
                              scale=0.7, ucg_rate=1.0)
    assert np.abs(g0["scale"].numpy()).max() == 0

    # our sampling path fills the conditioned half with scale 1 and the
    # unconditioned half with 0 (engine.make_cfg_denoise_fn), matching
    # sample_condition.py:282-290 — layout check only, b=1 trajectories
    assert list(g["scale"].numpy()[:t]) == [0.7] * t


# =============================================================== window math


class _DotDict(dict):
    __getattr__ = dict.__getitem__


def _ref_cfg():
    return _DotDict(
        diffusion=_DotDict(acc_masked_guidance=False,
                           cond_masked_guidance=False,
                           save_diffusion_render=False),
        model_path="/tmp/graft_oracle_unused",
        data=_DotDict(type="Waymo"))


def _marker_img(v, h, w):
    return torch.full((3, h, w), float(v))


def _ref_runner(du, S, W, h, w, forward):
    r = object.__new__(du.WaymoDiffusionRunner)
    r.scene = types.SimpleNamespace(
        diffusion=types.SimpleNamespace(forward=forward))
    r.sample_frames = S
    r.window_size = W
    r.target_height, r.target_width = h, w
    r.guide_preprocessor = "guide_pre"
    r.default_preprocessor = "default_pre"
    r.preprocess_image = lambda path, pre: _marker_img(
        path.split("_")[1].split(".")[0], h, w)
    r.preprocess_tensor = lambda x: x
    return r


def _mk_ref_cam(f, h, w):
    return types.SimpleNamespace(
        meta={"frame": f, "guidance_rgb_path": f"g_{f}.png",
              "guidance_mask_path": f"m_{f}.png"},
        original_image=_marker_img(f, h, w),
        image_name=f"im_{f}")


def _mk_our_cam(f):
    return types.SimpleNamespace(metadata={"frame": f},
                                 image_name=f"im_{f}", _image=None)


def _our_runner(S, W, h, w):
    from street_crafter_tpu.runner.diffusion import DiffusionRunner
    eng = types.SimpleNamespace(cfg=types.SimpleNamespace(num_frames=S))
    r = DiffusionRunner(None, eng, None, height=h, width=w, window_size=W)
    r.load_guidance = lambda c: np.full(
        (h, w, 3), float(c.metadata["frame"]), np.float32)
    r.load_cond_image = lambda c: np.full(
        (h, w, 3), float(c.metadata["frame"]), np.float32)
    return r


@pytest.mark.parametrize("n,S,W", [(4, 5, 2), (5, 5, 2), (7, 5, 2),
                                   (10, 5, 2), (9, 6, 1)])
def test_run_sequence_window_math_vs_reference(n, S, W):
    """run_sequence: start/step/end-clamp sequence, nearest-train-frame
    condition pick, [start:end] = output[1:] overwrite placement
    (diffusion_utils.py:229-347)."""
    h, w = 4, 4
    du = refload.load_diffusion_utils(_ref_cfg())
    frames = list(range(n))
    train_frames = list(range(0, n, 3))

    ref_calls = []

    def ref_forward(batch, scale, cond_indices=None):
        gseq = batch["guide_seq"]
        ref_calls.append((float(gseq[0, 0, 0, 0]),
                          tuple(float(v) for v in gseq[1:, 0, 0, 0]),
                          tuple(cond_indices)))
        word = len(ref_calls) - 1
        out = torch.zeros((gseq.shape[0], 3, h, w))
        for f in range(gseq.shape[0]):
            out[f] = word * 1000 + f
        return out

    r = _ref_runner(du, S, W, h, w, ref_forward)
    cams = [_mk_ref_cam(f, h, w) for f in frames]
    train_cams = [_mk_ref_cam(f, h, w) for f in train_frames]
    r.get_guidance = lambda cs: ([c.meta["guidance_rgb_path"] for c in cs],
                                 [c.meta["guidance_mask_path"] for c in cs])
    r.get_render = lambda cs: {
        "render_seq": torch.zeros((len(cs), 3, h, w)),
        "render_mask_seq": torch.zeros((len(cs), 1, h, w))}
    with cuda_to_cpu(), torch.no_grad():
        ref_result = r.run_sequence(cams, train_cams, use_render=True,
                                    scale=0.3).numpy()

    our_calls = []

    def our_sample(key, guide_images, cond_image, render_images, sds_scale,
                   cond_indices=(0,)):
        g = np.asarray(guide_images)
        our_calls.append((float(g[0, 0, 0, 0]),
                          tuple(float(v) for v in g[1:, 0, 0, 0]),
                          tuple(cond_indices)))
        word = len(our_calls) - 1
        out = np.zeros((g.shape[0], h, w, 3), np.float32)
        for f in range(g.shape[0]):
            out[f] = word * 1000 + f
        return jnp.asarray(out * 2.0 - 1.0)   # runner maps back via (x+1)/2

    ours = _our_runner(S, W, h, w)
    ours._sample = our_sample
    our_cams = [_mk_our_cam(f) for f in frames]
    our_train = [_mk_our_cam(f) for f in train_frames]
    # our runner renders GS only when render_fn is given; the reference's
    # use_render=True path only changes img_seq assembly, not window math
    our_result = ours.run_sequence(our_cams, our_train, render_fn=None,
                                   scale=0.3)

    assert our_calls == ref_calls
    assert np.array_equal(our_result[:, 0, 0, 0], ref_result[:, 0, 0, 0])
    # every sampled frame landed in its camera's supervision slot
    for i, cam in enumerate(our_cams):
        assert float(np.asarray(cam._image)[0, 0, 0]) \
            == ref_result[i, 0, 0, 0]


@pytest.mark.parametrize("n,S,W", [(5, 5, 2), (8, 5, 2), (11, 5, 2),
                                   (12, 6, 1)])
def test_run_interleaved_window_math_vs_reference(n, S, W):
    """run_interleaved: merged test+train ordering, per-window cond_indices
    from train-frame membership, test-frame extraction
    (diffusion_utils.py:137-226)."""
    h, w = 4, 4
    du = refload.load_diffusion_utils(_ref_cfg())
    frames = list(range(n))
    train_frames = [f for f in frames if f % 2 == 0]
    test_frames = [f for f in frames if f % 2 == 1]

    ref_calls = []

    def ref_forward(batch, scale, cond_indices=None):
        gseq = batch["guide_seq"]
        ref_calls.append((tuple(float(v) for v in gseq[:, 0, 0, 0]),
                          tuple(cond_indices)))
        word = len(ref_calls) - 1
        out = torch.zeros((gseq.shape[0], 3, h, w))
        for f in range(gseq.shape[0]):
            out[f] = word * 1000 + f
        return out

    r = _ref_runner(du, S, W, h, w, ref_forward)
    test_cams = [_mk_ref_cam(f, h, w) for f in test_frames]
    train_cams = [_mk_ref_cam(f, h, w) for f in train_frames]
    r.get_guidance = lambda cs: ([c.meta["guidance_rgb_path"] for c in cs],
                                 [c.meta["guidance_mask_path"] for c in cs])
    with cuda_to_cpu(), torch.no_grad():
        ref_result = r.run_interleaved(test_cams, train_cams).numpy()

    our_calls = []

    def our_sample(key, guide_images, cond_image, render_images, sds_scale,
                   cond_indices=(0,)):
        g = np.asarray(guide_images)
        our_calls.append((tuple(float(v) for v in g[:, 0, 0, 0]),
                          tuple(cond_indices)))
        word = len(our_calls) - 1
        out = np.zeros((g.shape[0], h, w, 3), np.float32)
        for f in range(g.shape[0]):
            out[f] = word * 1000 + f
        return jnp.asarray(out * 2.0 - 1.0)

    ours = _our_runner(S, W, h, w)
    ours._sample = our_sample
    our_result = ours.run_interleaved(
        [_mk_our_cam(f) for f in test_frames],
        [_mk_our_cam(f) for f in train_frames])

    assert our_calls == ref_calls
    assert np.array_equal(our_result[:, 0, 0, 0], ref_result[:, 0, 0, 0])
