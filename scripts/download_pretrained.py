"""Download ImageNet-pretrained timm encoder weights for offline TPU hosts.

The reference pulls ``tf_efficientnetv2_b0.in1k`` through timm at model
build (reference ``src/models/multidim_stacker.py:166-176``). TPU training
hosts are often air-gapped, so this script is run ONCE on a networked host;
it fetches the timm checkpoint from the Hugging Face Hub and stores it
where ``models/pretrained.py`` discovers it
(``$BAS_TPU_PRETRAINED_DIR``, default ``<workdir>/data/pretrained``).

Usage:
    python scripts/download_pretrained.py                 # flagship encoder
    python scripts/download_pretrained.py -m tf_efficientnetv2_b3.in21k_ft_in1k
"""

import argparse
import shutil
from pathlib import Path


def download(model_name: str, out_dir: Path) -> Path:
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "huggingface_hub is required (bundled with transformers): "
            f"{e}"
        )

    repo = f"timm/{model_name}"
    out_dir.mkdir(parents=True, exist_ok=True)
    target = out_dir / f"{model_name}.safetensors"
    cached = hf_hub_download(repo_id=repo, filename="model.safetensors")
    shutil.copyfile(cached, target)
    return target


def main() -> None:
    from ball_action_spotting_tpu.models.pretrained import pretrained_dir

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "-m", "--model", default="tf_efficientnetv2_b0.in1k",
        help="timm model name (HF repo timm/<name>)",
    )
    parser.add_argument(
        "-o", "--out_dir", default=None,
        help="destination dir (default: $BAS_TPU_PRETRAINED_DIR)",
    )
    args = parser.parse_args()
    out_dir = Path(args.out_dir) if args.out_dir else pretrained_dir()
    target = download(args.model, out_dir)
    print(f"Saved {target}")


if __name__ == "__main__":
    main()
