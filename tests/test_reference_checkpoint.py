"""Loading a real torch-saved reference argus checkpoint (.pth) end to end:
torch pickle → weight conversion → predictor runs. The 'switch from the
reference framework' story (reference checkpoint layout:
``/root/reference/src/ema.py:71-77``)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import tests.test_models  # registers efficientnetv2_test
from tests.test_predictor import NN_KWARGS, FRAME_COUNT
from tests.test_torch_import import tiny_torch_state_dict_shapes
from ball_action_spotting_tpu.data.video import SyntheticSource
from ball_action_spotting_tpu.predict.streaming import (
    StreamingPredictor,
    get_raw_predictions,
)
from ball_action_spotting_tpu.train.checkpoint import (
    get_best_checkpoint_path,
    resolve_pretrain_variables,
)


@pytest.fixture(scope="module")
def reference_pth(tmp_path_factory):
    rng = np.random.default_rng(0)
    sd = {}
    for k, shape in tiny_torch_state_dict_shapes().items():
        v = rng.normal(scale=0.1, size=shape).astype(np.float32)
        if k.endswith("running_var"):
            v = np.abs(v) + 0.5
        sd[k] = torch.from_numpy(v)
    params = {
        "nn_module": ("multidim_stacker", dict(NN_KWARGS)),
        "loss": ("focal_loss", {"alpha": -1.0, "gamma": 1.2, "reduction": "mean"}),
        "optimizer": ("AdamW", {"lr": 3e-4}),
        "frame_stack_size": 6,
        "frame_stack_step": 2,
        "frames_processor": ("pad_normalize", {"size": (96, 64)}),
        "device": ["cuda:0"],  # reference checkpoints carry this; must be ignored
        "amp": True,
        "iter_size": 1,
    }
    state = {
        "model_name": "BallActionModel",
        "params": params,
        "nn_state_dict": sd,
        "no_ema_nn_state_dict": {k: v * 1.01 for k, v in sd.items()},
    }
    path = tmp_path_factory.mktemp("ref") / "model-012-0.812345.pth"
    torch.save(state, path)
    return path


def test_pth_discovered_and_loaded(reference_pth):
    best = get_best_checkpoint_path(reference_pth.parent, return_score=True)
    assert best[0] == reference_pth and best[1] == pytest.approx(0.812345)
    variables, params = resolve_pretrain_variables(reference_pth)
    assert params["nn_module"][0] == "multidim_stacker"
    assert "conv_stem" in variables["params"]["conv2d_encoder"]
    raw, _ = resolve_pretrain_variables(reference_pth, use_ema=False)
    ema_leaf = np.asarray(variables["params"]["classifier"]["bias"])
    raw_leaf = np.asarray(raw["params"]["classifier"]["bias"])
    np.testing.assert_allclose(raw_leaf, ema_leaf * 1.01, rtol=1e-6)


def test_streaming_predictor_from_pth(reference_pth):
    predictor = StreamingPredictor(reference_pth, tta=False, dtype=np.float32)
    src = SyntheticSource(num_frames=FRAME_COUNT, height=64, width=96, seed=2)
    frame_indexes, raw = get_raw_predictions(predictor, src, FRAME_COUNT)
    assert raw.shape == (len(frame_indexes), 2)
    assert np.isfinite(raw).all()
    assert (raw >= 0).all() and (raw <= 1).all()
