import numpy as np
from scipy.ndimage import gaussian_filter1d

from ball_action_spotting_tpu.core.postprocess import (
    post_processing,
    raw_predictions_to_actions,
    smooth_scores_batch,
)
from ball_action_spotting_tpu.domains import ball


def test_post_processing_single_peak():
    n = 200
    scores = np.zeros(n)
    scores[100] = 1.0
    frames, confs = post_processing(
        list(range(50, 50 + n)), scores, gauss_sigma=3.0, height=0.02, distance=15
    )
    assert frames == [150]
    assert 0.1 < confs[0] < 0.2  # gaussian peak of delta with sigma 3 ≈ 0.133


def test_post_processing_distance_suppression():
    n = 300
    scores = np.zeros(n)
    scores[100] = 1.0
    scores[105] = 0.8  # within distance=15 of the higher peak → suppressed
    scores[200] = 0.9
    frames, confs = post_processing(
        list(range(n)), scores, gauss_sigma=1.0, height=0.05, distance=15
    )
    assert 200 in frames
    assert len([f for f in frames if abs(f - 100) < 10]) == 1


def test_post_processing_height_threshold():
    scores = np.zeros(100)
    scores[50] = 0.3
    frames, _ = post_processing(
        list(range(100)), scores, gauss_sigma=3.0, height=0.2, distance=15
    )
    assert frames == []  # smoothed peak ≈ 0.04 < 0.2


def test_raw_predictions_to_actions_shapes():
    n = 500
    raw = np.zeros((n, 2), dtype=np.float32)
    raw[100, 0] = 1.0
    raw[300, 1] = 1.0
    class2actions = raw_predictions_to_actions(
        list(range(n)), raw, ball.DOMAIN, verbose=False
    )
    assert set(class2actions) == {"PASS", "DRIVE"}
    # gauss_sigma=3 smooths the impulse to ~0.133 < height 0.2 → no spots
    # unless neighborhood support exists; add support
    raw[98:103, 0] = 1.0
    class2actions = raw_predictions_to_actions(
        list(range(n)), raw, ball.DOMAIN, verbose=False
    )
    pass_frames, pass_confs = class2actions["PASS"]
    assert pass_frames == [100]
    assert pass_confs[0] > 0.2


def test_smooth_scores_batch_matches_scipy():
    rng = np.random.default_rng(1)
    scores = rng.random((3, 400)).astype(np.float32)
    # device variant runs f32; host parity path uses scipy directly
    ours = smooth_scores_batch(scores, gauss_sigma=3.0)
    ref = gaussian_filter1d(scores.astype(np.float64), 3.0, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=2e-3)
    one = smooth_scores_batch(scores[0], gauss_sigma=3.0)
    np.testing.assert_allclose(one, ref[0], atol=2e-3)
