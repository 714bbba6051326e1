"""scripts/verify_external.py --synthetic: the external-validation plumbing
must run offline against the in-repo oracles and actually detect breakage
(a comparator that cannot fail proves nothing)."""

import numpy as np
import pytest

from scripts.verify_external import (
    compare_encoder_weights,
    compare_evaluators,
    random_eval_case,
    run_synthetic,
    synthetic_encoder_state_dict,
    _timm_oracle,
)


def test_evaluator_agreement_with_reconstructed_oracle():
    import tests.official_oracle as oracle

    report = compare_evaluators(oracle.average_mAP, n_seeds=2)
    assert report["ok"] and report["max_abs_diff"] == 0.0
    assert report["cases"] == 2 * 2  # seeds x delta sets


def test_evaluator_detects_mismatch():
    import tests.official_oracle as oracle

    def perturbed(*args, **kwargs):
        out = oracle.average_mAP(*args, **kwargs)
        return (out[0] + 1e-9,) + tuple(out[1:])

    with pytest.raises(AssertionError, match="evaluator mismatch"):
        compare_evaluators(perturbed, n_seeds=1)


def test_random_eval_case_has_unshown_and_ties():
    targets, dets, closests = random_eval_case(0)
    t = np.concatenate(targets)
    assert (t == -1).any() and (t == 1).any()
    assert len(targets) == len(dets) == len(closests)


@pytest.mark.slow
def test_weights_plumbing_and_detection():
    sd = synthetic_encoder_state_dict()
    features, kind = _timm_oracle("tf_efficientnetv2_b0.in1k", sd)
    assert kind == "torch_ref_shim"  # timm is absent in this environment
    report = compare_encoder_weights(sd, features)
    assert report["ok"] and report["feature_corr"] > 0.999

    # a corrupted import must fail the comparison
    bad = dict(sd)
    bad["conv_stem.weight"] = sd["conv_stem.weight"] + 0.5
    with pytest.raises(AssertionError, match="encoder parity failed"):
        compare_encoder_weights(bad, features)


@pytest.mark.slow
def test_run_synthetic_end_to_end(capsys):
    reports = run_synthetic()
    assert len(reports) == 2 and all(r["ok"] for r in reports)
    assert reports[1]["oracle"] == "torch_ref_shim"
