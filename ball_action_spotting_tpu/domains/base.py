"""Domain descriptors.

The reference instantiates the same layer stack twice — ``ball_action``
(2 classes, 7-game 7-fold CV, ``/root/reference/src/ball_action/constants.py``)
and ``action`` (15 merged classes, fixed splits,
``/root/reference/src/action/constants.py``). Here each instantiation is a
frozen ``Domain`` value instead of a parallel module tree, so all shared code
takes a ``Domain`` argument rather than importing task-specific constants.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Mapping

from ball_action_spotting_tpu import paths


@dataclasses.dataclass(frozen=True)
class PostprocessParams:
    """Peak-extraction parameters (reference ``ball_action/constants.py:39-43``)."""

    gauss_sigma: float = 3.0
    height: float = 0.2
    distance: int = 15

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


@dataclasses.dataclass(frozen=True)
class Domain:
    """A dataset/task instantiation of the spotting stack."""

    name: str
    classes: tuple[str, ...]
    label_file: str
    soccernet_subdir: str
    postprocess: PostprocessParams = PostprocessParams()
    video_fps: float = 25.0
    num_halves: int = 2
    # Classes merged into one on input and mapped back on output
    # (reference action/constants.py:73-77 merges cards into "Card" and
    # action/annotations.py:104 writes it back as "Yellow card").
    merged_classes: Mapping[str, str] = dataclasses.field(default_factory=dict)
    output_class_map: Mapping[str, str] = dataclasses.field(default_factory=dict)
    # Only annotations with this visibility are kept (None keeps all;
    # reference action/annotations.py:44-45 keeps only "visible").
    visibility_filter: str | None = None

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    @property
    def class2target(self) -> dict[str, int]:
        return {cls: i for i, cls in enumerate(self.classes)}

    @property
    def target2class(self) -> dict[int, str]:
        return {i: cls for i, cls in enumerate(self.classes)}

    @property
    def halves(self) -> list[int]:
        return list(range(1, self.num_halves + 1))

    # --- workspace layout (mirrors reference per-task dirs) ---

    @property
    def dir(self) -> Path:
        return paths.data_dir() / self.name

    @property
    def experiments_dir(self) -> Path:
        return self.dir / "experiments"

    @property
    def predictions_dir(self) -> Path:
        return self.dir / "predictions"

    @property
    def visualizations_dir(self) -> Path:
        return self.dir / "visualizations"

    @property
    def soccernet_dir(self) -> Path:
        return paths.soccernet_dir() / self.soccernet_subdir
