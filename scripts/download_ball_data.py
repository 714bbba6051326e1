"""Download the SoccerNet ball-action dataset (labels + 720p videos).

Parity: ``/root/reference/download_ball_data.py`` — uses the SoccerNet pip
package (optional dependency); an NDA password is required for videos.
"""

import argparse
import sys
import zipfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ball_action_spotting_tpu.domains import ball


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--password", required=True, type=str,
                        help="SoccerNet NDA password")
    args = parser.parse_args()

    try:
        from SoccerNet.Downloader import SoccerNetDownloader
    except ImportError:
        raise SystemExit(
            "The SoccerNet package is required for downloads: pip install SoccerNet"
        )

    local_dir = ball.DOMAIN.soccernet_dir
    local_dir.mkdir(parents=True, exist_ok=True)
    downloader = SoccerNetDownloader(LocalDirectory=str(local_dir))
    downloader.password = args.password
    for split in ["train", "valid", "test", "challenge"]:
        zip_name = f"{split}.zip"
        downloader.downloadDataTask(task="spotting-ball-2023", split=[split],
                                    password=args.password)
        zip_path = local_dir / "spotting-ball-2023" / zip_name
        if zip_path.exists():
            with zipfile.ZipFile(zip_path) as zf:
                zf.extractall(local_dir)
            print("Unzipped", zip_path)


if __name__ == "__main__":
    main()
