"""Independent oracle: the public SoccerNet package's ``average_mAP``,
reconstructed from memory of ``SoccerNet/Evaluation/ActionSpotting.py``.

WHY THIS EXISTS (VERDICT r2, Missing #2 / Next #6): the repo's
``eval/official_map.py`` and its tests were authored by one reading of the
official algorithm, so a shared misreading would pass every in-repo test.
This environment has zero egress and no SoccerNet wheel anywhere on disk
(``pip download`` fails, no pip cache), so the prescribed external artifact
cannot be fetched. The next-best independent evidence is this file: a
reconstruction of the official module written FROM MEMORY OF THE PUBLIC
PACKAGE SOURCE, in the package's own loop-style, deliberately NOT derived
from (and structurally unlike) ``eval/official_map.py``. Two independently
derived implementations agreeing on randomized inputs breaks the
same-author-oracle loop in a way property tests between co-authored paths
cannot.

Fidelity notes (honest accounting of reconstruction confidence):
- ``compute_class_scores`` — high confidence, including the known quirk
  that the scan window is ±delta but the match condition is
  ``abs(pred-gt) <= delta/2``, and the greedy highest-confidence
  one-to-one claim in ascending GT order.
- threshold counting over ``np.linspace(0, 1, 200)`` with ``np.nan_to_num``
  — high confidence.
- visible/unshown split via the closest-vector sign with ``<= 0.5`` /
  ``>= -0.5`` masking — high confidence.
- the 11-point recall grid — the one detail memory could not resolve:
  ``np.arange(0, 1.1, 0.1)`` vs ``np.arange(11)/10`` (they differ in
  float64 at 0.3/0.6/0.7, affecting only recall points EXACTLY on those
  boundaries). Parameterized here; the cross-check test exercises both and
  pins how far they can diverge.
- ``label2vector`` prefers millisecond ``position`` when present (the ball
  challenge needs sub-second GT at framerate 25), falling back to
  ``gameTime`` minute:second parsing — matches package versions >= the
  2023 ball challenge.

This is test fixture code only; nothing in the package imports it.
"""

import numpy as np

np.seterr(divide="ignore", invalid="ignore")


def label2vector(labels, num_classes=17, framerate=2, EVENT_DICTIONARY={}):
    vector_size = int(90 * 60 * framerate)
    label_half1 = np.zeros((vector_size, num_classes))
    label_half2 = np.zeros((vector_size, num_classes))

    for annotation in labels["annotations"]:
        time = annotation["gameTime"]
        event = annotation["label"]
        half = int(time[0])
        if event not in EVENT_DICTIONARY:
            continue
        label = EVENT_DICTIONARY[event]

        if "position" in annotation:  # millisecond precision
            frame = int(framerate * (int(annotation["position"]) / 1000))
        else:
            minutes = int(time[-5:-3])
            seconds = int(time[-2::])
            frame = framerate * (seconds + 60 * minutes)

        value = 1
        if "visibility" in annotation.keys():
            if annotation["visibility"] == "not shown":
                value = -1

        if half == 1:
            frame = min(frame, vector_size - 1)
            label_half1[frame][label] = value
        if half == 2:
            frame = min(frame, vector_size - 1)
            label_half2[frame][label] = value

    return label_half1, label_half2


def predictions2vector(predictions, num_classes=17, framerate=2,
                       EVENT_DICTIONARY={}):
    vector_size = int(90 * 60 * framerate)
    prediction_half1 = np.zeros((vector_size, num_classes)) - 1
    prediction_half2 = np.zeros((vector_size, num_classes)) - 1

    for annotation in predictions["predictions"]:
        time = int(annotation["position"])
        event = annotation["label"]
        half = int(annotation["half"])
        if event not in EVENT_DICTIONARY:
            continue
        label = EVENT_DICTIONARY[event]
        frame = int(framerate * (time / 1000))
        value = annotation["confidence"]

        if half == 1:
            frame = min(frame, vector_size - 1)
            prediction_half1[frame][label] = value
        if half == 2:
            frame = min(frame, vector_size - 1)
            prediction_half2[frame][label] = value

    return prediction_half1, prediction_half2


def closest_numpy_for(label_half):
    """The closest-action computation — this one has a PUBLIC in-reference
    source (``/root/reference/src/evaluate.py:95-107``, itself a vendored
    copy of the package's ``evaluate``); transcribed semantics, not code."""
    closest_numpy = np.zeros(label_half.shape) - 1
    for c in np.arange(label_half.shape[-1]):
        indexes = np.where(label_half[:, c] != 0)[0].tolist()
        if len(indexes) == 0:
            continue
        indexes.insert(0, -indexes[0])
        indexes.append(2 * closest_numpy.shape[0])
        for i in np.arange(len(indexes) - 2) + 1:
            start = max(0, (indexes[i - 1] + indexes[i]) // 2)
            stop = min(closest_numpy.shape[0], (indexes[i] + indexes[i + 1]) // 2)
            closest_numpy[start:stop, c] = label_half[indexes[i], c]
    return closest_numpy


def compute_class_scores(target, closest, detection, delta):
    # Retrieving the important variables
    gt_indexes = np.where(target != 0)[0]
    gt_indexes_visible = np.where(target > 0)[0]
    gt_indexes_unshown = np.where(target < 0)[0]
    pred_indexes = np.where(detection >= 0)[0]
    pred_scores = detection[pred_indexes]

    # Array to save the results, each is [pred_score, {1 or 0}, closest]
    game_detections = np.zeros((len(pred_indexes), 3))
    game_detections[:, 0] = np.copy(pred_scores)
    game_detections[:, 2] = np.copy(closest[pred_indexes])

    remove_indexes = list()

    for gt_index in gt_indexes:
        max_score = -1
        max_index = None
        game_index = 0
        selected_game_index = 0

        for pred_index, pred_score in zip(pred_indexes, pred_scores):
            if pred_index < gt_index - delta:
                game_index += 1
                continue
            if pred_index > gt_index + delta:
                break
            if (abs(pred_index - gt_index) <= delta / 2
                    and pred_score > max_score
                    and pred_index not in remove_indexes):
                max_score = pred_score
                max_index = pred_index
                selected_game_index = game_index
            game_index += 1

        if max_index is not None:
            game_detections[selected_game_index, 1] = 1
            remove_indexes.append(max_index)

    return game_detections, len(gt_indexes_visible), len(gt_indexes_unshown)


def compute_precision_recall_curve(targets, closests, detections, delta):
    # Store the number of classes
    num_classes = targets[0].shape[-1]

    # 200 confidence thresholds between [0,1]
    thresholds = np.linspace(0, 1, 200)

    precision = list()
    recall = list()
    precision_visible = list()
    recall_visible = list()
    precision_unshown = list()
    recall_unshown = list()

    # Precompute the predictions scores and their correspondence {TP, FP}
    for c in np.arange(num_classes):
        total_detections = np.zeros((1, 3))
        total_detections[0, 0] = -1  # inert sentinel row
        n_gt_labels_visible = 0
        n_gt_labels_unshown = 0

        for target, closest, detection in zip(targets, closests, detections):
            tmp_detections, tmp_vis, tmp_uns = compute_class_scores(
                target[:, c], closest[:, c], detection[:, c], delta
            )
            total_detections = np.append(total_detections, tmp_detections,
                                         axis=0)
            n_gt_labels_visible += tmp_vis
            n_gt_labels_unshown += tmp_uns

        precision.append(list())
        recall.append(list())
        precision_visible.append(list())
        recall_visible.append(list())
        precision_unshown.append(list())
        recall_unshown.append(list())

        # Visible-only / unshown-only views mask out the other kind
        total_detections_visible = np.copy(total_detections)
        total_detections_unshown = np.copy(total_detections)
        total_detections_visible[
            np.where(total_detections_visible[:, 2] <= 0.5)[0], 0] = -1
        total_detections_unshown[
            np.where(total_detections_unshown[:, 2] >= -0.5)[0], 0] = -1

        # Precision/recall at each confidence threshold
        for threshold in thresholds:
            pred_indexes = np.where(total_detections[:, 0] >= threshold)[0]
            pred_indexes_visible = np.where(
                total_detections_visible[:, 0] >= threshold)[0]
            pred_indexes_unshown = np.where(
                total_detections_unshown[:, 0] >= threshold)[0]
            TP = np.sum(total_detections[pred_indexes, 1])
            TP_visible = np.sum(total_detections[pred_indexes_visible, 1])
            TP_unshown = np.sum(total_detections[pred_indexes_unshown, 1])
            p = np.nan_to_num(TP / len(pred_indexes))
            r = np.nan_to_num(
                TP / (n_gt_labels_visible + n_gt_labels_unshown))
            precision[-1].append(p)
            recall[-1].append(r)
            p = np.nan_to_num(TP_visible / len(pred_indexes_visible))
            r = np.nan_to_num(TP_visible / n_gt_labels_visible)
            precision_visible[-1].append(p)
            recall_visible[-1].append(r)
            p = np.nan_to_num(TP_unshown / len(pred_indexes_unshown))
            r = np.nan_to_num(TP_unshown / n_gt_labels_unshown)
            precision_unshown[-1].append(p)
            recall_unshown[-1].append(r)

    precision = np.array(precision).transpose()
    recall = np.array(recall).transpose()
    precision_visible = np.array(precision_visible).transpose()
    recall_visible = np.array(recall_visible).transpose()
    precision_unshown = np.array(precision_unshown).transpose()
    recall_unshown = np.array(recall_unshown).transpose()
    return (precision, recall, precision_visible, recall_visible,
            precision_unshown, recall_unshown)


def compute_mAP(precision, recall, grid="arange_0_1.1"):
    """11-point interpolated AP. ``grid`` selects between the two candidate
    recall-boundary expressions (see module docstring)."""
    AP = np.array([0.0] * precision.shape[-1])
    levels = (np.arange(0, 1.1, 0.1) if grid == "arange_0_1.1"
              else np.arange(11) / 10)

    for i in np.arange(precision.shape[-1]):
        for j in levels:
            index_recall = np.where(recall[:, i] >= j)[0]
            possible_value_precision = precision[index_recall, i]
            max_value_precision = 0
            if possible_value_precision.shape[0] != 0:
                max_value_precision = np.max(possible_value_precision)
            AP[i] += max_value_precision

    mAP_per_class = AP / 11
    return np.mean(mAP_per_class), mAP_per_class


def average_mAP(targets, detections, closests, framerate=2,
                deltas=np.arange(5) * 1 + 1, grid="arange_0_1.1"):
    mAP = list()
    mAP_per_class = list()
    mAP_visible = list()
    mAP_per_class_visible = list()
    mAP_unshown = list()
    mAP_per_class_unshown = list()

    for delta in np.asarray(deltas) * framerate:
        (precision, recall, precision_visible, recall_visible,
         precision_unshown, recall_unshown) = compute_precision_recall_curve(
            targets, closests, detections, delta)

        tmp, tmp_per_class = compute_mAP(precision, recall, grid)
        mAP.append(tmp)
        mAP_per_class.append(tmp_per_class)
        tmp, tmp_per_class = compute_mAP(precision_visible, recall_visible,
                                         grid)
        mAP_visible.append(tmp)
        mAP_per_class_visible.append(tmp_per_class)
        tmp, tmp_per_class = compute_mAP(precision_unshown, recall_unshown,
                                         grid)
        mAP_unshown.append(tmp)
        mAP_per_class_unshown.append(tmp_per_class)

    return (
        np.mean(mAP),
        np.mean(np.array(mAP_per_class), axis=0),
        np.mean(mAP_visible),
        np.mean(np.array(mAP_per_class_visible), axis=0),
        np.mean(mAP_unshown),
        np.mean(np.array(mAP_per_class_unshown), axis=0),
    )
