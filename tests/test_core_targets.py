import numpy as np

from ball_action_spotting_tpu.core.targets import (
    MaxWindowTargetsProcessor,
    VideoTarget,
    center_crop_targets,
)

CLASSES = ["PASS", "DRIVE"]


def _video_data(actions):
    return {"frame_index2action": actions}


def test_video_target_lookup():
    vt = VideoTarget(_video_data({10: "PASS", 20: "DRIVE", 30: "EMPTY"}), CLASSES)
    np.testing.assert_array_equal(vt.target(10), [1.0, 0.0])
    np.testing.assert_array_equal(vt.target(20), [0.0, 1.0])
    np.testing.assert_array_equal(vt.target(30), [0.0, 0.0])  # EMPTY → zero
    np.testing.assert_array_equal(vt.target(11), [0.0, 0.0])


def test_video_target_action_enumeration_sorted():
    vt = VideoTarget(_video_data({30: "EMPTY", 10: "PASS", 20: "DRIVE"}), CLASSES)
    assert vt.num_actions() == 3
    assert [vt.get_frame_index_by_action_index(i) for i in range(3)] == [10, 20, 30]


def test_targets_matrix():
    vt = VideoTarget(_video_data({5: "PASS"}), CLASSES)
    mat = vt.targets([4, 5, 6])
    np.testing.assert_array_equal(mat, [[0, 0], [1, 0], [0, 0]])
    assert mat.dtype == np.float32


def test_center_crop_targets_odd_remainder():
    # 29 rows → crop to 15: left=7, right=7 (ref target.py:43-47)
    t = np.arange(29)[:, None].astype(np.float32)
    cropped = center_crop_targets(t, 15)
    assert cropped[0, 0] == 7 and cropped[-1, 0] == 21
    # 30 rows → crop 15: extra=15, left=7, right=8
    t = np.arange(30)[:, None].astype(np.float32)
    cropped = center_crop_targets(t, 15)
    assert cropped[0, 0] == 7 and cropped[-1, 0] == 21


def test_max_window_processor():
    proc = MaxWindowTargetsProcessor(window_size=3)
    targets = np.zeros((7, 2), dtype=np.float32)
    targets[2, 0] = 1.0  # inside the center window [2,3,4]
    targets[0, 1] = 1.0  # outside
    out = proc(targets)
    np.testing.assert_array_equal(out, [1.0, 0.0])
    assert out.shape == (2,)
