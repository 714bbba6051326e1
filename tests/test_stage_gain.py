"""Stage-gain pin plumbing (scripts/tpu_stage_gain_pin.py) and the hard
synthetic task (data/video.py::HardSyntheticSource). The real ordering
assertions run on the v5e (artifact TPU_STAGE_GAIN.json); CPU training is
run-to-run nondeterministic, so here we pin the task's *properties* (the
signal exists, is temporal, and is hard) and the scoring plumbing."""

import json
from types import SimpleNamespace

import numpy as np

import scripts.tpu_stage_gain_pin as pin
from ball_action_spotting_tpu.data.video import HardSyntheticSource
from ball_action_spotting_tpu.domains import ball


def _source(**kw):
    base = dict(num_frames=120, height=64, width=96, seed=3,
                events={40: 0, 90: 1}, signal=0.5, noise=50,
                distractor_rate=1.0)
    base.update(kw)
    return HardSyntheticSource(**base)


def test_hard_source_deterministic_and_seekable():
    a = _source().render_all()
    b = _source().render_all()
    assert (a == b).all()
    s = _source()
    assert (s.fetch_frame(90) == a[90]).all()  # seek == sequential render
    assert (_source(seed=4).render_all() != a).any()


def test_hard_source_event_signal_is_motion():
    """The event dot exists near the event frame, moves along the class
    axis, and is ABSENT in the same region far from any mover."""
    src = _source(distractor_rate=0.0, noise=0)
    f0 = 40  # class 0: horizontal motion
    frames = {d: src.fetch_frame(f0 + d).astype(np.int32) for d in (-3, 0, 3)}

    def dot_xy(fr):
        # centroid of the bright dot (argmax alone picks an arbitrary
        # corner of the flat-top square)
        ys, xs = np.nonzero(fr >= fr.max() - 5)
        return xs.mean(), ys.mean()

    x_m, y_m = dot_xy(frames[-3])
    x_0, y_0 = dot_xy(frames[0])
    x_p, y_p = dot_xy(frames[3])
    assert abs(x_p - x_m) >= 10  # moved horizontally across 6 frames
    assert abs(y_p - y_m) <= 3   # ... not vertically
    # class 1 at frame 90: vertical
    g = {d: src.fetch_frame(90 + d).astype(np.int32) for d in (-3, 3)}
    xv_m, yv_m = dot_xy(g[-3])
    xv_p, yv_p = dot_xy(g[3])
    assert abs(yv_p - yv_m) >= 10
    assert abs(xv_p - xv_m) <= 3
    # no dot outside all mover windows
    quiet = src.fetch_frame(20)
    assert quiet.max() < 100  # gradient+wobble only


def test_hard_source_distractors_away_from_events():
    src = _source(distractor_rate=2.0)
    event_frames = np.asarray(sorted(src.events))
    n_event_movers = len(src.events)
    distractors = src._movers[n_event_movers:]
    assert len(distractors) >= 3
    for f_lo, f_hi, *_ in distractors:
        f0 = (f_lo + f_hi) // 2
        assert np.abs(event_frames - f0).min() >= 15


def test_hard_source_low_snr_at_low_signal():
    """At low signal the dot is genuinely dim: its peak stays within ~2x
    of the background's own max (no trivial threshold shortcut)."""
    src = _source(signal=0.2, noise=60, distractor_rate=0.0)
    on = src.fetch_frame(40).astype(np.int32)
    off = src.fetch_frame(20).astype(np.int32)
    assert on.max() < 2 * off.max()


def test_random_events_respect_min_gap():
    rng = np.random.default_rng(0)
    events = pin._random_events(rng, 600, 8, ["PASS", "DRIVE"], min_gap=60)
    frames = sorted(events)
    assert len(frames) >= 5
    assert all(b - a >= 60 for a, b in zip(frames, frames[1:]))
    assert set(events.values()) <= {"PASS", "DRIVE"}


def test_build_workdir_structure_and_hidden_gt(tmp_path):
    args = SimpleNamespace(frames=80, events=2, signal=0.5, noise=50,
                           distractors=0.5, epochs=1, epoch_size=16)
    gt = pin.build_workdir(tmp_path, args)
    # every CV game labeled + stored; challenge games stored but UNlabeled
    for game in ball.fold_games:
        d = tmp_path / "data/soccernet/spotting-ball-2023" / game
        assert (d / "Labels-ball.json").exists()
        assert (d / "1_720p.mkv.gray").exists()
        labels = json.loads((d / "Labels-ball.json").read_text())
        assert labels["annotations"]
    for game in ball.challenge_games:
        d = tmp_path / "data/soccernet/spotting-ball-2023" / game
        assert not (d / "Labels-ball.json").exists()
        assert (d / "2_720p.mkv.gray").exists()
        assert set(gt[game]) == {1, 2}
        assert any(gt[game][1][c] for c in gt[game][1])
    # configs + action domain present
    assert (tmp_path / "configs/ball_action/hard_s1.py").exists()
    assert (tmp_path / "configs/ball_action/hard_s3.py").exists()
    assert (tmp_path / "configs/action/hard_a.py").exists()
    assert (tmp_path / "splits/train.json").exists()


def test_challenge_map_scores_perfect_and_empty():
    classes = list(ball.DOMAIN.classes)
    gt = {"g": {1: {classes[0]: [100], classes[1]: [200]},
                2: {classes[0]: [], classes[1]: [50]}}}

    def spotting(preds):
        return {"g": {"predictions": preds}}

    label_of = {c: ball.DOMAIN.output_class_map.get(c, c) for c in classes}
    perfect = spotting([
        {"half": 1, "label": label_of[classes[0]], "position": str(100 * 40),
         "confidence": 0.9},
        {"half": 1, "label": label_of[classes[1]], "position": str(200 * 40),
         "confidence": 0.9},
        {"half": 2, "label": label_of[classes[1]], "position": str(50 * 40),
         "confidence": 0.9},
    ])
    assert pin._challenge_map(perfect, gt, classes) == 1.0
    assert pin._challenge_map(spotting([]), gt, classes) == 0.0
