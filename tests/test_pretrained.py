"""pretrained=True wiring: ImageNet encoder weights land in the train state.

Round-1 gap (VERDICT item 2): the flag was silently dropped; stages 1-2
trained from random init. Now Trainer.init_state converts a local timm
state dict (models/pretrained.py) and merges it into
``params/conv2d_encoder`` + ``batch_stats/conv2d_encoder``, or fails loudly.
"""

import numpy as np
import pytest

import tests.test_models  # registers efficientnetv2_test arch
from tests.test_torch_import import tiny_torch_state_dict_shapes
from tests.test_train_engine import tiny_config
from ball_action_spotting_tpu.models.pretrained import (
    PretrainedWeightsError,
    apply_pretrained_encoder,
    find_pretrained_file,
    load_state_dict,
)
from ball_action_spotting_tpu.train.engine import Trainer

CLASSES = ["PASS", "DRIVE"]


def fake_timm_state_dict() -> dict:
    """timm-format (prefixless) encoder state dict for efficientnetv2_test."""
    rng = np.random.default_rng(7)
    prefix = "conv2d_encoder."
    sd = {}
    for key, shape in tiny_torch_state_dict_shapes().items():
        if not key.startswith(prefix):
            continue
        arr = rng.normal(size=shape).astype(np.float32)
        if key.endswith("running_var"):
            arr = np.abs(arr) + 0.5
        sd[key[len(prefix):]] = arr
    # a real timm checkpoint also has layers past the feature tap; the
    # converter/merger must ignore extras
    sd["conv_head.weight"] = rng.normal(size=(64, 24, 1, 1)).astype(np.float32)
    sd["classifier.weight"] = rng.normal(size=(1000, 64)).astype(np.float32)
    return sd


@pytest.fixture()
def weights_dir(tmp_path, monkeypatch):
    np.savez(tmp_path / "efficientnetv2_test.npz", **fake_timm_state_dict())
    monkeypatch.setenv("BAS_TPU_PRETRAINED_DIR", str(tmp_path))
    return tmp_path


def test_find_and_load(weights_dir):
    path = find_pretrained_file("efficientnetv2_test")
    assert path is not None and path.suffix == ".npz"
    sd = load_state_dict(path)
    assert "conv_stem.weight" in sd


def test_load_safetensors_roundtrip(tmp_path):
    from safetensors.numpy import save_file

    sd = fake_timm_state_dict()
    path = tmp_path / "efficientnetv2_test.safetensors"
    save_file(sd, str(path))
    loaded = load_state_dict(path)
    np.testing.assert_array_equal(loaded["conv_stem.weight"], sd["conv_stem.weight"])


def test_trainer_init_applies_pretrained(weights_dir, tmp_path):
    config = tiny_config()
    config["argus_params"]["nn_module"][1]["pretrained"] = True
    trainer = Trainer(config, CLASSES, tmp_path / "exp")
    state = trainer.init_state()
    sd = fake_timm_state_dict()
    got = np.asarray(state.params["conv2d_encoder"]["conv_stem"]["kernel"])
    np.testing.assert_allclose(
        got, sd["conv_stem.weight"].transpose(2, 3, 1, 0), rtol=1e-6
    )
    stats = np.asarray(
        state.batch_stats["conv2d_encoder"]["bn1"]["BatchNorm_0"]["var"]
    )
    np.testing.assert_allclose(stats, sd["bn1.running_var"], rtol=1e-6)


def test_trainer_init_fails_loudly_when_missing(tmp_path, monkeypatch):
    monkeypatch.setenv("BAS_TPU_PRETRAINED_DIR", str(tmp_path / "empty"))
    config = tiny_config()
    config["argus_params"]["nn_module"][1]["pretrained"] = True
    trainer = Trainer(config, CLASSES, tmp_path / "exp")
    with pytest.raises(PretrainedWeightsError, match="pretrained=True"):
        trainer.init_state()


def test_stage_pretrain_supersedes_imagenet(tmp_path, monkeypatch):
    # With stage-pretrain variables given, the (absent) ImageNet file must
    # not be touched (reference: load_weights_from_pretrain overwrites the
    # timm init anyway).
    monkeypatch.setenv("BAS_TPU_PRETRAINED_DIR", str(tmp_path / "empty"))
    config = tiny_config()
    config["argus_params"]["nn_module"][1]["pretrained"] = True
    trainer = Trainer(config, CLASSES, tmp_path / "exp")
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((1, 6, 64, 96), jnp.float32)
    variables = trainer.model.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    state = trainer.init_state(pretrain_variables=dict(variables))
    assert state is not None


def test_merge_rejects_shape_mismatch(weights_dir):
    import jax
    import jax.numpy as jnp

    model = tests.test_models.tiny_stacker()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 6, 32, 32)), train=False
    )
    bad = fake_timm_state_dict()
    bad["conv_stem.weight"] = bad["conv_stem.weight"][:, :1]  # wrong in_chans
    np.savez(weights_dir / "bad.npz", **bad)
    with pytest.raises(PretrainedWeightsError, match="shape"):
        apply_pretrained_encoder(
            dict(variables), "efficientnetv2_test",
            weights_path=weights_dir / "bad.npz",
        )
