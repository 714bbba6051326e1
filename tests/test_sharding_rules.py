import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from ball_action_spotting_tpu.parallel.mesh import MODEL_AXIS, make_mesh
from ball_action_spotting_tpu.parallel.sharding_rules import leaf_spec, shard_state


def test_leaf_spec_rules():
    assert leaf_spec((3, 3, 3, 512), n_model=2) == P(None, None, None, MODEL_AXIS)
    assert leaf_spec((512,), n_model=2) == P()  # vectors replicated
    assert leaf_spec((3, 3, 3, 100), n_model=2) == P()  # too small
    assert leaf_spec((3, 3, 3, 257), n_model=2) == P()  # not divisible
    assert leaf_spec((3, 3, 3, 384), n_model=2) == P(None, None, None, MODEL_AXIS)
    assert leaf_spec((3, 3, 3, 512), n_model=1) == P()
    assert leaf_spec((), n_model=2) == P()


def test_shard_state_places_leaves():
    mesh = make_mesh(n_data=4, n_model=2)
    tree = {
        "big": np.zeros((4, 512), np.float32),
        "small": np.zeros((16,), np.float32),
    }
    placed = jax.device_put(tree, jax.devices()[0])
    sharded = shard_state(placed, mesh)
    assert sharded["big"].sharding.spec == P(None, MODEL_AXIS)
    assert sharded["small"].sharding.spec == P()
