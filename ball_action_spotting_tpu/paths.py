"""Workspace path configuration.

The reference hardcodes a ``/workdir`` container root
(``/root/reference/src/constants.py:3-6``). Here the workspace root is
configurable via the ``BAS_TPU_WORKDIR`` environment variable so the
framework runs unmodified inside or outside containers.
"""

import os
from pathlib import Path


def work_dir() -> Path:
    return Path(os.environ.get("BAS_TPU_WORKDIR", os.getcwd()))


def data_dir() -> Path:
    return work_dir() / "data"


def configs_dir() -> Path:
    return Path(os.environ.get("BAS_TPU_CONFIGS_DIR", work_dir() / "configs"))


def soccernet_dir() -> Path:
    return data_dir() / "soccernet"
