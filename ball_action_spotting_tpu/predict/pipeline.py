"""Whole-experiment prediction pipeline (games × halves → spotting JSONs).

Parity: ``/root/reference/scripts/ball_action/predict.py:58-128`` — per half:
raw per-frame sigmoid predictions saved as npz, then peak postprocess, then
per-game results_spotting.json. Engine is selectable: the chunked batched
engine for offline throughput (default) or the streaming cache engine.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ball_action_spotting_tpu.core.annotations import _cached_video_info
from ball_action_spotting_tpu.core.postprocess import raw_predictions_to_actions
from ball_action_spotting_tpu.core.spotting import (
    load_raw_predictions,
    save_raw_predictions,
    write_game_spotting_results,
)
from ball_action_spotting_tpu.data.video import open_source
from ball_action_spotting_tpu.domains.base import Domain
from ball_action_spotting_tpu.predict.streaming import (
    ChunkedVideoPredictor,
    StreamingPredictor,
    get_raw_predictions,
    iter_source_frames,
)


def make_predictor(model_path: Path, engine: str = "chunked", tta: bool = False,
                   **kwargs):
    if engine == "chunked":
        return ChunkedVideoPredictor(model_path, tta=tta, **kwargs)
    if engine == "streaming":
        return StreamingPredictor(model_path, tta=tta, **kwargs)
    raise ValueError(f"Unknown engine {engine!r}")


def predict_video(predictor, video_data: dict, raw_predictions_path: Path,
                  use_saved: bool = False):
    """→ class2actions for one half; saves/loads the raw npz."""
    if use_saved:
        if not raw_predictions_path.exists():
            raise FileNotFoundError(
                f"--use_saved_predictions set but {raw_predictions_path} is "
                "missing; run predict without the flag first"
            )
        frame_indexes, raw = load_raw_predictions(raw_predictions_path)
    else:
        source = open_source(video_data)
        try:
            if isinstance(predictor, ChunkedVideoPredictor):
                frame_indexes, raw = predictor.predict_video(
                    iter_source_frames(source), video_data["frame_count"]
                )
            else:
                frame_indexes, raw = get_raw_predictions(
                    predictor, source, video_data["frame_count"]
                )
        finally:
            source.close()
        save_raw_predictions(raw_predictions_path, np.asarray(frame_indexes), raw)
        print("Raw predictions saved to", raw_predictions_path)
    return frame_indexes, raw


def predict_game(predictor, game: str, domain: Domain, prediction_dir: Path,
                 resolution: str = "720p", use_saved: bool = False,
                 video_info_fn=None) -> None:
    video_info_fn = video_info_fn or _cached_video_info
    game_dir = domain.soccernet_dir / game
    game_prediction_dir = prediction_dir / game
    game_prediction_dir.mkdir(parents=True, exist_ok=True)
    half2class_actions = {}
    for half in domain.halves:
        video_path = game_dir / f"{half}_{resolution}.mkv"
        info = video_info_fn(str(video_path))
        video_data = dict(video_path=str(video_path), game=game, half=half, **info,
                          frame_index2action={})
        raw_path = game_prediction_dir / f"{half}_raw_predictions.npz"
        frame_indexes, raw = predict_video(predictor, video_data, raw_path, use_saved)
        half2class_actions[half] = raw_predictions_to_actions(
            frame_indexes, raw, domain
        )
    write_game_spotting_results(half2class_actions, game, prediction_dir, domain)


def predict_games(model_path: Path, games: Sequence[str], domain: Domain,
                  prediction_dir: Path, engine: str = "chunked", tta: bool = False,
                  use_saved: bool = False, resolution: str = "720p",
                  video_info_fn=None, data_parallel: int = 1) -> None:
    """``data_parallel > 1`` spreads the chunked engine's per-chunk program
    over a (data_parallel, 1) device mesh (``ChunkedVideoPredictor(mesh=)``,
    bit-equal to single-chip)."""
    predictor: Optional[object] = None
    if not use_saved:
        kwargs = {}
        if data_parallel > 1:
            if engine != "chunked":
                raise ValueError(
                    "data_parallel>1 requires the chunked engine")
            from ball_action_spotting_tpu.parallel.mesh import make_mesh

            kwargs["mesh"] = make_mesh(data_parallel, 1)
        predictor = make_predictor(model_path, engine=engine, tta=tta,
                                   **kwargs)
    for game in games:
        print("Predict game:", game)
        predict_game(
            predictor, game, domain, prediction_dir,
            resolution=resolution, use_saved=use_saved,
            video_info_fn=video_info_fn,
        )


def predict_games_fused(
    fold2model_path: dict, games: Sequence[str], domain: Domain,
    fold2prediction_dir: dict, tta: bool = False, resolution: str = "720p",
    video_info_fn=None, data_parallel: int = 1, fold_parallel: int = 1,
) -> None:
    """All folds' models over the same games with ONE decode+upload per
    video (``predict.fused.FusedFoldsPredictor``). Writes the per-fold raw
    npz + spotting JSONs in exactly the layout the per-fold
    ``predict_games`` loop produces, so the ensemble CLI
    (reference ``scripts/ball_action/ensemble.py:38-104``) is unchanged.
    The reference runs this workflow once per fold
    (``scripts/ball_action/predict.py:58-80`` × 7 challenge folds).

    ``data_parallel=N`` shards each chunk's frames over an (N, 1) mesh;
    ``fold_parallel=N`` instead shards the FOLDS over a (1, N) mesh
    (ensemble parallelism — each chip runs different folds). The two are
    mutually exclusive (one replicates what the other shards)."""
    from ball_action_spotting_tpu.predict.fused import FusedFoldsPredictor

    folds = sorted(fold2model_path)
    if sorted(fold2prediction_dir) != folds:
        raise ValueError("fold2model_path and fold2prediction_dir must "
                         "cover the same folds")
    if data_parallel > 1 and fold_parallel > 1:
        raise ValueError("data_parallel and fold_parallel are mutually "
                         "exclusive (shard frames OR folds)")
    kwargs = {}
    if data_parallel > 1:
        from ball_action_spotting_tpu.parallel.mesh import make_mesh

        kwargs["mesh"] = make_mesh(data_parallel, 1)
    elif fold_parallel > 1:
        from ball_action_spotting_tpu.parallel.mesh import make_mesh

        kwargs["mesh"] = make_mesh(1, fold_parallel)
        kwargs["fold_parallel"] = True
    predictor = FusedFoldsPredictor(
        [fold2model_path[f] for f in folds], tta=tta, **kwargs
    )
    video_info_fn = video_info_fn or _cached_video_info
    for game in games:
        print("Predict game (fused folds):", game)
        game_dir = domain.soccernet_dir / game
        fold2half_actions = {fold: {} for fold in folds}
        for half in domain.halves:
            video_path = game_dir / f"{half}_{resolution}.mkv"
            info = video_info_fn(str(video_path))
            source = open_source(dict(video_path=str(video_path), game=game,
                                      half=half, **info, frame_index2action={}))
            try:
                frame_indexes, raw = predictor.predict_video(
                    iter_source_frames(source), info["frame_count"]
                )  # raw: (T, folds, classes)
            finally:
                source.close()
            for i, fold in enumerate(folds):
                game_pred_dir = fold2prediction_dir[fold] / game
                game_pred_dir.mkdir(parents=True, exist_ok=True)
                raw_path = game_pred_dir / f"{half}_raw_predictions.npz"
                save_raw_predictions(
                    raw_path, np.asarray(frame_indexes), raw[:, i]
                )
                fold2half_actions[fold][half] = raw_predictions_to_actions(
                    frame_indexes, raw[:, i], domain
                )
        for fold in folds:
            write_game_spotting_results(
                fold2half_actions[fold], game, fold2prediction_dir[fold], domain
            )
