"""probe_coarse_capacity strategy branches (round 4 escalation).

The probe converts exact pre-drop tile stats into a render-capacity
strategy: plain floor render / escalate a minority of overflow tiles /
raise the capacity class globally. Mirrors the economics gsplat gets for
free from dynamic per-tile worklists
(street_gaussian_renderer.py:243-280)."""

import types

import street_crafter_tpu.runner.render as render_mod
from street_crafter_tpu.config import default_config


class _Cam:
    width, height = 1600, 1066          # 13 x 9 = 117 coarse tiles @ cts=128


class _Scene:
    meta = None

    def batch_for(self, info):
        return None


def _probe_with(monkeypatch, coarse_max, overflow_tiles, cfg=None,
                row_max=0):
    cfg = cfg or default_config()

    def fake_make_eval_render(cfg_, meta, sh_degree, with_stats=False,
                              **kw):
        assert with_stats

        def stats_render(params, cam, batch):
            return {"raster_stats": {
                "coarse_max": coarse_max,
                "coarse_overflow_tiles": overflow_tiles,
                "escalation_candidate_tiles": overflow_tiles,
                "row_max": row_max}}

        return stats_render

    monkeypatch.setattr(render_mod, "make_eval_render",
                        fake_make_eval_render)
    infos = [types.SimpleNamespace(uid=i) for i in range(5)]
    cams = [_Cam() for _ in range(5)]
    return render_mod.probe_coarse_capacity(cfg, _Scene(), None, infos,
                                            cams)


def test_probe_disabled_returns_empty(monkeypatch):
    cfg = default_config()
    cfg.render.auto_capacity = False
    assert render_mod.probe_coarse_capacity(cfg, _Scene(), None, [], []) == {}


def test_probe_under_floor_plain_render(monkeypatch):
    caps = _probe_with(monkeypatch, coarse_max=1200, overflow_tiles=0)
    assert caps == {"max_per_coarse": 4096}


def test_probe_minority_overflow_escalates(monkeypatch):
    # 25/117 tiles over the floor (the round-3 headline scene's shape)
    caps = _probe_with(monkeypatch, coarse_max=38351, overflow_tiles=25)
    assert caps["max_per_coarse"] == 4096        # base stays at the floor
    assert caps["escalate_per_coarse"] == 43008  # drop-free bucket
    # 25 * 1.5 headroom -> 38, rounded up to a bucket of 8
    assert caps["escalate_tiles"] == 40


def test_probe_majority_overflow_goes_global(monkeypatch):
    caps = _probe_with(monkeypatch, coarse_max=38351, overflow_tiles=80)
    # escalation would re-render most of the frame -> global upgrade
    assert caps == {"max_per_coarse": 43008}


def test_probe_row_only_overflow_escalates_rows(monkeypatch):
    # tile totals all fit the 4096 floor, but one tile has a 16px row over
    # the fused kernel's kf=1024 -> escalate with a raised row capacity
    caps = _probe_with(monkeypatch, coarse_max=3000, overflow_tiles=1,
                       row_max=2400)
    assert caps["max_per_coarse"] == 4096
    assert caps["escalate_tiles"] == 8                   # min budget bucket
    assert caps["escalate_per_coarse"] == 4096
    # r5: escalated row capacity uses the gate-verified HI cap (capped by
    # the escalated coarse capacity) — the r4 bench measured the old 2048
    # cap as the escalated path's residual quality gap (BASELINE.md)
    assert caps["escalate_per_row"] == 4096              # min(_KF_CAP_HI, kc)


def test_probe_coarse_escalation_carries_row_capacity(monkeypatch):
    # dense tiles overflow BOTH drop sites: the escalated pass gets the
    # VMEM-capped row capacity alongside the high coarse capacity
    caps = _probe_with(monkeypatch, coarse_max=38351, overflow_tiles=25,
                       row_max=2401)
    assert caps["escalate_per_coarse"] == 43008
    assert caps["escalate_per_row"] == 4096              # _KF_CAP_HI


def test_probe_escalate_opt_out(monkeypatch):
    cfg = default_config()
    cfg.render.escalate = False
    caps = _probe_with(monkeypatch, coarse_max=38351, overflow_tiles=25,
                       cfg=cfg)
    assert caps == {"max_per_coarse": 43008}
