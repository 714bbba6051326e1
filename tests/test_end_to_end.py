"""The minimum end-to-end slice (SURVEY §7.5): synthetic data → train →
checkpoint → whole-video chunked predict → postprocess → spotting JSON →
mAP@1 evaluation."""

import json

import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test
from tests.test_train_engine import CLASSES, tiny_config
from ball_action_spotting_tpu.core.postprocess import raw_predictions_to_actions
from ball_action_spotting_tpu.core.sampling import ball_sampling_weights
from ball_action_spotting_tpu.core.indexes import StackIndexesGenerator
from ball_action_spotting_tpu.core.spotting import write_game_spotting_results
from ball_action_spotting_tpu.core.targets import MaxWindowTargetsProcessor
from ball_action_spotting_tpu.data import (
    ClipLoader,
    TrainClipDataset,
    ValClipDataset,
    make_synthetic_video_data,
    open_source,
)
from ball_action_spotting_tpu.domains import ball
from ball_action_spotting_tpu.eval.soccernet_map import (
    average_map,
    spots_from_predictions,
)
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    iter_source_frames,
)
from ball_action_spotting_tpu.train.checkpoint import get_best_checkpoint_path
from ball_action_spotting_tpu.train.engine import Trainer


@pytest.mark.slow
def test_train_predict_evaluate_slice(tmp_path):
    # --- data: strong synthetic visual signal at annotated frames
    videos = make_synthetic_video_data(num_videos=2, num_frames=360, classes=CLASSES)
    weights = [ball_sampling_weights(v, 5, 0.5, 5) for v in videos]
    gen = StackIndexesGenerator(6, 2)
    tproc = MaxWindowTargetsProcessor(6)
    # epoch_size 192 x 6 epochs: enough optimization that peak detection
    # keys on real signal — at 48x4 the logits stay within ~±0.02 of zero
    # and the periodic noise peaks match all GT BY CHANCE (≈25-frame peak
    # spacing vs ±12.5-frame windows), which the round-1 trapezoid metric
    # scored 0.64 but the official 11-point metric correctly scores ~0.29
    train_ds = TrainClipDataset(
        videos, CLASSES, gen, tproc, image_size=(96, 64), epoch_size=192,
        videos_sampling_weights=weights, base_seed=5,
    )
    val_ds = ValClipDataset(videos, CLASSES, gen, tproc, image_size=(96, 64))

    config = tiny_config(train_epoch_size=192, num_epochs=[1, 6])
    trainer = Trainer(config, CLASSES, tmp_path / "exp", compute_dtype=np.float32)
    # num_workers=1 → samples collate in index order → deterministic run
    best = trainer.fit(
        ClipLoader(train_ds, 8, num_workers=1),
        ClipLoader(val_ds, 8, num_workers=1),
    )
    assert best["val_average_precision"] > 0.45, best

    # --- predict a whole synthetic "half" with the chunked engine
    ckpt = get_best_checkpoint_path(tmp_path / "exp")
    predictor = ChunkedVideoPredictor(ckpt, tta=True, dtype=np.float32,
                                      chunk_size=64)
    video = videos[0]
    source = open_source(video)
    frame_indexes, raw = predictor.predict_video(
        iter_source_frames(source), video["frame_count"]
    )
    assert len(frame_indexes) == raw.shape[0]

    # serving parity: the chunked/folded engine must reproduce a direct
    # forward of the TRAINED weights (catches any weight-mangling in the
    # save→load→fold→serve chain, independent of model quality)
    from ball_action_spotting_tpu.models import build_model
    from ball_action_spotting_tpu.train.checkpoint import (
        resolve_pretrain_variables,
    )

    variables, meta = resolve_pretrain_variables(ckpt, use_ema=True)
    model = build_model("multidim_stacker", dtype=np.float32,
                        **meta["nn_module"][1])
    for probe_frame in (frame_indexes[3], frame_indexes[len(frame_indexes) // 2]):
        window = source.fetch_frames(gen.make_stack_indexes(probe_frame))
        x = window[None].astype(np.float32) / 255.0
        batch = np.concatenate([x, x[..., ::-1]])  # tta=True averaging
        import jax
        import jax.numpy as jnp

        logits = model.apply(variables, jnp.asarray(batch), train=False)
        expect = np.asarray(
            jax.nn.sigmoid(logits.astype(jnp.float32)).mean(axis=0))
        got = raw[frame_indexes.index(probe_frame)]
        np.testing.assert_allclose(got, expect, atol=1e-4)

    # --- postprocess → spotting JSON
    class2actions = raw_predictions_to_actions(
        frame_indexes, raw, ball.DOMAIN, verbose=False
    )
    out = write_game_spotting_results(
        {1: class2actions}, "synthetic_game_0", tmp_path / "preds", ball.DOMAIN
    )
    results = json.loads(out.read_text())
    assert results["predictions"], "no actions spotted"

    # --- evaluate mAP@1 against the synthetic ground truth
    gt = {cls: [] for cls in CLASSES}
    for frame, action in video["frame_index2action"].items():
        gt[action].append(frame)
    pred_spots = spots_from_predictions(results, ball.DOMAIN, 1, 25.0)
    a_map, per_class = average_map(
        [gt], [pred_spots], CLASSES, framerate=25.0, deltas=np.array([1])
    )
    # Wiring check only: tiny-CPU training quality is NOT run-deterministic
    # (XLA CPU reduction order varies) — measured spotting mAP@1 ranged
    # 0.30-0.97 across identical invocations, so any quality threshold here
    # either flakes or is vacuous. The serving-parity assertion above is
    # the real guard against a broken save→load→fold→predict chain; here
    # we only require the evaluation to produce a sane, matchable score
    # (a pipeline returning no/garbage spots scores ~0).
    assert 0.0 < a_map <= 1.0, (a_map, per_class)
    assert a_map > 0.15, (a_map, per_class)
