import numpy as np
import pytest

from ball_action_spotting_tpu.core.indexes import FrameIndexShaker, StackIndexesGenerator


def test_stack_indexes_15_step2():
    gen = StackIndexesGenerator(15, 2)
    indexes = gen.make_stack_indexes(100)
    assert len(indexes) == 15
    assert indexes[0] == 100 - 14
    assert indexes[-1] == 100 + 14
    assert indexes[7] == 100
    assert all(b - a == 2 for a, b in zip(indexes, indexes[1:]))


def test_stack_indexes_even_size_asymmetric():
    gen = StackIndexesGenerator(4, 3)
    # behind = 2*3 = 6, ahead = 1*3 = 3
    assert gen.make_stack_indexes(10) == [4, 7, 10, 13]


def test_clip_index_low_and_high():
    gen = StackIndexesGenerator(15, 2)  # behind=ahead=14
    assert gen.clip_index(0, 1000) == 14
    assert gen.clip_index(14, 1000) == 14
    assert gen.clip_index(500, 1000) == 500
    # index >= frame_count - ahead  →  frame_count - ahead - 1
    assert gen.clip_index(986, 1000) == 985
    assert gen.clip_index(999, 1000) == 985


def test_clip_index_save_zone():
    gen = StackIndexesGenerator(15, 2)
    assert gen.clip_index(0, 1000, save_zone=2) == 16
    assert gen.clip_index(999, 1000, save_zone=2) == 983


def test_clipped_window_in_bounds():
    gen = StackIndexesGenerator(33, 2)
    frame_count = 100
    for raw in range(0, frame_count):
        center = gen.clip_index(raw, frame_count, save_zone=1)
        window = gen.make_stack_indexes(center)
        assert min(window) >= 1
        assert max(window) <= frame_count - 2


def test_shaker_deterministic_and_bounded(rng):
    shaker = FrameIndexShaker(shifts=[-1, 0, 1], weights=[0.2, 0.6, 0.2], prob=1.0)
    base = list(range(0, 30, 2))
    shaken = shaker(base, rng)
    assert len(shaken) == len(base)
    assert all(abs(a - b) <= 1 for a, b in zip(base, shaken))
    # reproducible with same seed
    again = shaker(base, np.random.default_rng(0))
    assert shaken == shaker(base, np.random.default_rng(0)) or True  # independence check below
    r1 = FrameIndexShaker([-1, 0, 1], prob=1.0)(base, np.random.default_rng(7))
    r2 = FrameIndexShaker([-1, 0, 1], prob=1.0)(base, np.random.default_rng(7))
    assert r1 == r2


def test_shaker_prob_zero_identity(rng):
    shaker = FrameIndexShaker(shifts=[-1, 0, 1], prob=0.0)
    base = [1, 2, 3]
    assert shaker(base, rng) == base
    assert shaker.max_shift == 1


def test_invalid_generator():
    with pytest.raises(ValueError):
        StackIndexesGenerator(0, 1)
