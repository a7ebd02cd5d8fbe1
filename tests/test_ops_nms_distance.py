import numpy as np
import jax.numpy as jnp

from deepdish_tpu.ops import distance, nms


def _ref_nms_tlwh(boxes, max_bbox_overlap, scores):
    """Oracle mirroring deep_sort/preprocessing.py:6-73."""
    if len(boxes) == 0:
        return []
    boxes = boxes.astype(np.float64)
    pick = []
    x1, y1 = boxes[:, 0], boxes[:, 1]
    x2 = boxes[:, 2] + boxes[:, 0]
    y2 = boxes[:, 3] + boxes[:, 1]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    idxs = np.argsort(scores, kind="stable")
    while len(idxs) > 0:
        last = len(idxs) - 1
        i = idxs[last]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[idxs[:last]])
        yy1 = np.maximum(y1[i], y1[idxs[:last]])
        xx2 = np.minimum(x2[i], x2[idxs[:last]])
        yy2 = np.minimum(y2[i], y2[idxs[:last]])
        w = np.maximum(0, xx2 - xx1 + 1)
        h = np.maximum(0, yy2 - yy1 + 1)
        overlap = (w * h) / area[idxs[:last]]
        idxs = np.delete(idxs, np.concatenate(
            ([last], np.where(overlap > max_bbox_overlap)[0])))
    return pick


def _ref_nms_per_class(boxes_xyxy, labels, scores, iou_threshold):
    """Oracle mirroring tools/ssd_mobilenet.py:59-98 (per-class greedy)."""
    keep_all = set()
    for c in np.unique(labels):
        inds = np.where(labels == c)[0]
        b, s = boxes_xyxy[inds], scores[inds]
        x, y = b[:, 0], b[:, 1]
        w, h = b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]
        areas = w * h
        order = s.argsort(kind="stable")[::-1]
        while order.size > 0:
            i = order[0]
            keep_all.add(inds[i])
            xx1 = np.maximum(x[i], x[order[1:]])
            yy1 = np.maximum(y[i], y[order[1:]])
            xx2 = np.minimum(x[i] + w[i], x[order[1:]] + w[order[1:]])
            yy2 = np.minimum(y[i] + h[i], y[order[1:]] + h[order[1:]])
            w1 = np.maximum(0.0, xx2 - xx1 + 1)
            h1 = np.maximum(0.0, yy2 - yy1 + 1)
            inter = w1 * h1
            ovr = inter / (areas[i] + areas[order[1:]] - inter)
            order = order[np.where(ovr <= iou_threshold)[0] + 1]
    return keep_all


def _rand_boxes(rng, n, span=200):
    tl = rng.uniform(0, span, size=(n, 2))
    wh = rng.uniform(5, 60, size=(n, 2))
    return np.concatenate([tl, wh], axis=1).astype(np.float32)


def test_nms_tlwh_matches_reference(rng):
    K = 32
    for _ in range(15):
        n = rng.randint(1, K + 1)
        boxes = _rand_boxes(rng, n)
        scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
        pad_b = np.zeros((K, 4), np.float32)
        pad_b[:n] = boxes
        pad_s = np.zeros((K,), np.float32)
        pad_s[:n] = scores
        valid = np.arange(K) < n
        order, keep = nms.nms_tlwh(jnp.asarray(pad_b), jnp.asarray(pad_s),
                                   jnp.asarray(valid), 0.6)
        want = _ref_nms_tlwh(boxes, 0.6, scores)
        got = [int(i) for i in np.asarray(order) if i >= 0]
        assert got == want
        assert set(np.where(np.asarray(keep))[0]) == set(want)


def test_nms_per_class_matches_reference(rng):
    K = 32
    for _ in range(15):
        n = rng.randint(1, K + 1)
        tlwh = _rand_boxes(rng, n)
        xyxy = np.concatenate([tlwh[:, :2], tlwh[:, :2] + tlwh[:, 2:]], axis=1)
        scores = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
        labels = rng.randint(0, 3, size=n).astype(np.int32)
        pad_b = np.zeros((K, 4), np.float32)
        pad_b[:n] = xyxy
        pad_s = np.zeros((K,), np.float32)
        pad_s[:n] = scores
        pad_l = np.zeros((K,), np.int32)
        pad_l[:n] = labels
        valid = np.arange(K) < n
        _, keep = nms.nms_xyxy_per_class(
            jnp.asarray(pad_b), jnp.asarray(pad_s), jnp.asarray(pad_l),
            jnp.asarray(valid), 0.5)
        want = _ref_nms_per_class(xyxy, labels, scores, 0.5)
        assert set(np.where(np.asarray(keep))[0]) == want


def test_cosine_distance(rng):
    a = rng.normal(size=(5, 16)).astype(np.float32)
    b = rng.normal(size=(7, 16)).astype(np.float32)
    got = np.asarray(distance.cosine_distance_matrix(a, b))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(got, 1.0 - an @ bn.T, atol=1e-5)


def test_gallery_min_cosine(rng):
    T, G, F, D = 4, 6, 16, 5
    gallery = rng.normal(size=(T, G, F)).astype(np.float32)
    gvalid = rng.uniform(size=(T, G)) < 0.7
    gvalid[0] = False  # empty gallery
    gvalid[1, 0] = True
    feats = rng.normal(size=(D, F)).astype(np.float32)
    got = np.asarray(distance.gallery_min_cosine(
        jnp.asarray(gallery), jnp.asarray(gvalid), jnp.asarray(feats)))
    assert np.all(np.isinf(got[0]))
    for t in range(1, T):
        sel = gallery[t][gvalid[t]]
        if len(sel) == 0:
            continue
        an = sel / np.linalg.norm(sel, axis=1, keepdims=True)
        bn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        want = (1.0 - an @ bn.T).min(axis=0)
        np.testing.assert_allclose(got[t], want, atol=1e-5)
