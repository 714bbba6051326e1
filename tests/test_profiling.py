import jax.numpy as jnp

from ball_action_spotting_tpu.utils.profiling import StageTimer, synchronize


def test_stage_timer_accumulates():
    timer = StageTimer()
    for _ in range(3):
        with timer.stage("decode"):
            pass
    with timer.stage("collate"):
        pass
    assert timer.counts["decode"] == 3
    assert timer.counts["collate"] == 1
    report = timer.report()
    assert "decode" in report and "ms/call" in report
    timer.reset()
    assert not timer.totals


def test_synchronize_tolerates_trees():
    synchronize({"a": jnp.ones((4,)), "b": {"c": jnp.zeros((2, 2))}})
    synchronize({})
