import numpy as np

from segmentron_tpu.utils.score import SegmentationMetric, confusion_matrix_update


def _np_confusion(pred, target, n):
    pred, target = pred.reshape(-1), target.reshape(-1)
    valid = (target >= 0) & (target < n)
    cm = np.zeros((n, n), np.int64)
    np.add.at(cm, (target[valid], pred[valid]), 1)
    return cm


def test_confusion_matrix_matches_numpy(rng):
    n = 7
    pred = rng.randint(0, n, size=(4, 33, 29))
    target = rng.randint(-1, n, size=(4, 33, 29))
    cm = np.asarray(confusion_matrix_update(pred, target, n))
    assert (cm == _np_confusion(pred, target, n)).all()


def test_metric_streaming_equals_oneshot(rng):
    n = 5
    m = SegmentationMetric(n)
    all_p, all_t = [], []
    for _ in range(3):
        p = rng.randint(0, n, size=(2, 17, 19))
        t = rng.randint(-1, n, size=(2, 17, 19))
        m.update(p, t)
        all_p.append(p)
        all_t.append(t)
    cm = _np_confusion(np.stack(all_p), np.stack(all_t), n)
    assert (m.confusion_matrix == cm).all()
    pix_acc, miou = m.get()
    inter = np.diag(cm).astype(np.float64)
    union = cm.sum(0) + cm.sum(1) - inter
    iou = inter[union > 0] / union[union > 0]
    assert np.isclose(miou, iou.mean())
    assert np.isclose(pix_acc, np.diag(cm).sum() / cm.sum())


def test_metric_logits_argmax(rng):
    n = 4
    m = SegmentationMetric(n)
    logits = rng.randn(2, 8, 8, n).astype(np.float32)
    target = rng.randint(0, n, size=(2, 8, 8))
    m.update(logits, target)
    pred = logits.argmax(-1)
    assert (m.confusion_matrix == _np_confusion(pred, target, n)).all()


def test_unseen_classes_excluded_from_miou():
    n = 3
    m = SegmentationMetric(n)
    # only class 0 present and predicted
    m.update(np.zeros((1, 4, 4), np.int32), np.zeros((1, 4, 4), np.int32))
    _, miou = m.get()
    assert miou == 1.0
