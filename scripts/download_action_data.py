"""Download the SoccerNet action-spotting dataset (labels + 720p videos).

Parity: ``/root/reference/download_action_data.py``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ball_action_spotting_tpu.domains import action


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--password", required=True, type=str,
                        help="SoccerNet NDA password")
    parser.add_argument("--splits", default="train,valid,test,challenge", type=str)
    args = parser.parse_args()

    try:
        from SoccerNet.Downloader import SoccerNetDownloader
    except ImportError:
        raise SystemExit(
            "The SoccerNet package is required for downloads: pip install SoccerNet"
        )

    local_dir = action.DOMAIN.soccernet_dir
    local_dir.mkdir(parents=True, exist_ok=True)
    downloader = SoccerNetDownloader(LocalDirectory=str(local_dir))
    downloader.password = args.password
    splits = args.splits.split(",")
    downloader.downloadGames(files=["Labels-v2.json"], split=splits)
    downloader.downloadGames(files=["1_720p.mkv", "2_720p.mkv"], split=splits)


if __name__ == "__main__":
    main()
