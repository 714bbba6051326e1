"""Full 4-stage recipe dress rehearsal through the REAL CLIs.

Chains the workflow of the reference's README (reference README.md:41-117 +
scripts/ball_action/ensemble.py:38-104) end to end, exercising every
cross-stage contract at the ``sys.argv`` level:

  1. stage-1 train over the CV folds
  2. CV predict --folds all    -> the OOF raw-prediction npz layout that
                                  stage 3 consumes (train/pipeline.py::
                                  oof_predictions_path)
  3. stage-1 evaluate          -> mAP@1 per fold
  4. stage-2 ACTION train      -> the cross-domain pretrain the stage-3
                                  config inits from (15-class encoder ->
                                  2-class ball head, shape-tolerant)
  5. stage-3 train             -> OOF hard-negative sampling weights +
                                  cross-domain pretrain resolution
  6. stage-4 train             -> long-window frozen-encoder fine-tune,
                                  same-fold init, shape-tolerant transfer
  7. stage-3 + stage-4 CV predict
  8. ensemble --experiments s3,s4 (cv)  -> blended spotting JSONs
  9. evaluate the cv ensemble
 10. stage-4 challenge predict + challenge ensemble

On a real-data host run it with the actual recipe names (the defaults);
``tests/test_rehearsal.py`` runs the same driver over a synthetic workdir
with tiny configs.

    python scripts/rehearsal.py                       # real recipe names
    python scripts/rehearsal.py --stage1 tiny_s1 --stage3 tiny_s3 \
        --stage4 tiny_s4 --stage_folds 0
"""

import argparse
import importlib.util
import subprocess
import sys
from pathlib import Path

SCRIPTS = Path(__file__).resolve().parent


def run_subprocess(script: str, *args: str, domain: str = "ball_action") -> None:
    cmd = [sys.executable, str(SCRIPTS / domain / script), *args]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


_MODULES: dict = {}


def run_in_process(script: str, *args: str, domain: str = "ball_action") -> None:
    """Import the CLI module and call its ``main()`` with a patched argv.

    One process for the whole chain = one jit cache: every later stage
    reuses the earlier stages' compiled programs. This is what makes the
    rehearsal practical where per-process compiles are expensive — the
    single-core CPU test host (each subprocess recompiles the tiny model)
    and the real TPU (first compile per process is 20-160 s through the
    backend). The subprocess mode stays the default: it additionally
    proves each CLI works as its own entry point.
    """
    path = SCRIPTS / domain / script
    key = (domain, script)
    if key not in _MODULES:
        spec = importlib.util.spec_from_file_location(
            f"_rehearsal_{domain}_{script.removesuffix('.py')}", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _MODULES[key] = mod
    print("+ [in-process]", str(path), " ".join(args), flush=True)
    old_argv = sys.argv
    sys.argv = [str(path), *args]
    try:
        _MODULES[key].main()
    finally:
        sys.argv = old_argv


run = run_subprocess


def parse_arguments():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--stage1", default="sampling_weights_001")
    parser.add_argument("--stage2", default="action_sampling_weights_002",
                        help="action-domain pretrain experiment trained "
                             "before stage 3 (the recipe's stage 2); "
                             "empty string skips it (the stage-3 config "
                             "must then name a ball pretrain instead)")
    parser.add_argument("--stage3", default="ball_tuning_001")
    parser.add_argument("--stage4", default="ball_finetune_long_004")
    parser.add_argument("--folds", default="all",
                        help="folds for stage-1 train + OOF predict (stage 3 "
                             "needs OOF npz for every train game, i.e. all)")
    parser.add_argument("--stage_folds", default="all",
                        help="folds to carry through stages 3/4 + ensemble")
    parser.add_argument("--skip_challenge", action="store_true")
    parser.add_argument("--fused_challenge", action="store_true",
                        help="run the challenge predict through the fused "
                             "multi-fold engine (predict.py --fused: one "
                             "decode+upload per video for ALL folds)")
    parser.add_argument("--in_process", action="store_true",
                        help="call each CLI's main() in THIS process "
                             "instead of a subprocess (one shared jit "
                             "cache: minutes instead of tens of minutes "
                             "on hosts where per-process compiles are "
                             "expensive, e.g. the TPU backend)")
    return parser.parse_args()


def main():
    global run
    a = parse_arguments()
    run = run_in_process if a.in_process else run_subprocess

    # stage 1: train all folds, then out-of-fold predictions for every game
    run("train.py", "--experiment", a.stage1, "--folds", a.folds)
    run("predict.py", "--experiment", a.stage1, "--folds", a.folds)
    run("evaluate.py", "--experiment", a.stage1, "--folds", a.folds)

    # stage 2: the action-domain pretrain the real stage-3 config inits
    # from (reference README.md:66-77)
    if a.stage2:
        run("train.py", "--experiment", a.stage2, domain="action")

    # stage 3: OOF hard negatives from stage 1 + stage pretrain
    run("train.py", "--experiment", a.stage3, "--folds", a.stage_folds)
    # stage 4: long-window frozen-encoder fine-tune from stage 3, same fold
    run("train.py", "--experiment", a.stage4, "--folds", a.stage_folds)

    # CV predictions for both tuned stages, then the fold ensemble
    run("predict.py", "--experiment", a.stage3, "--folds", a.stage_folds)
    run("predict.py", "--experiment", a.stage4, "--folds", a.stage_folds)
    ens = f"{a.stage3},{a.stage4}"
    run("ensemble.py", "--experiments", ens, "--folds", a.stage_folds)
    run("evaluate.py", "--experiment", ens, "--folds", a.stage_folds)

    if not a.skip_challenge:
        fused = ("--fused",) if a.fused_challenge else ()
        run("predict.py", "--experiment", a.stage4, "--challenge",
            "--folds", a.stage_folds, *fused)
        run("ensemble.py", "--experiments", a.stage4, "--challenge")

    print("rehearsal complete", flush=True)


if __name__ == "__main__":
    main()
