"""Epoch metrics accumulated on host.

Parity reference: ``/root/reference/src/metrics.py`` — per-class average
precision (sklearn) and thresholded binary accuracy, each contributing a
mean plus per-class entries to the epoch metric dict.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


class PerClassMetric:
    name: str = ""
    better: str = "max"

    def __init__(self, classes: Sequence[str]):
        self.classes = list(classes)
        self.reset()

    def reset(self) -> None:
        self.predictions: list[np.ndarray] = []
        self.targets: list[np.ndarray] = []

    def update(self, step_output: dict) -> None:
        self.predictions.append(np.asarray(step_output["prediction"]))
        self.targets.append(np.asarray(step_output["target"]))

    def compute(self) -> list[float]:
        raise NotImplementedError

    def results(self, prefix: str = "") -> dict[str, float]:
        scores = self.compute()
        out = {f"{prefix}{self.name}": float(np.mean(scores))}
        for i, cls in enumerate(self.classes):
            out[f"{prefix}{self.name}_{cls.lower()}"] = float(scores[i])
        return out


class AveragePrecision(PerClassMetric):
    name = "average_precision"
    better = "max"

    def compute(self) -> list[float]:
        from sklearn.metrics import average_precision_score

        y_true = np.concatenate(self.targets, axis=0)
        y_pred = np.concatenate(self.predictions, axis=0)
        scores = []
        for c in range(y_true.shape[1]):
            if (y_true[:, c] > 0).any():
                scores.append(float(average_precision_score(y_true[:, c], y_pred[:, c])))
            else:
                # sklearn's average_precision_score returns 0 (with a
                # warning) for a class absent from the split; match it so
                # the monitored mean equals the reference's
                # (reference src/metrics.py:47).
                scores.append(0.0)
        return scores


class Accuracy(PerClassMetric):
    name = "binary_accuracy"
    better = "max"

    def __init__(self, classes: Sequence[str], threshold: float = 0.5):
        super().__init__(classes)
        self.threshold = threshold

    def compute(self) -> list[float]:
        y_true = np.concatenate(self.targets, axis=0) > self.threshold
        y_pred = np.concatenate(self.predictions, axis=0) > self.threshold
        return [
            float((y_true[:, c] == y_pred[:, c]).mean())
            for c in range(y_true.shape[1])
        ]
