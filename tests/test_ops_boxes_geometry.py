import numpy as np
import jax.numpy as jnp

from deepdish_tpu.ops import boxes, geometry


def test_box_roundtrips(rng):
    tlwh = rng.uniform(1, 100, size=(32, 4)).astype(np.float32)
    tlbr = boxes.tlwh_to_tlbr(tlwh)
    np.testing.assert_allclose(boxes.tlbr_to_tlwh(tlbr), tlwh, rtol=1e-6)
    xyah = boxes.tlwh_to_xyah(tlwh)
    np.testing.assert_allclose(boxes.xyah_to_tlwh(xyah), tlwh, rtol=1e-5)


def test_xyah_matches_reference_formula(rng):
    # deep_sort/detection.py:43-50: center += wh/2; a = w/h.
    tlwh = rng.uniform(1, 50, size=(8, 4))
    out = np.asarray(boxes.tlwh_to_xyah(tlwh))
    for i, b in enumerate(tlwh):
        ref = b.copy()
        ref[:2] += ref[2:] / 2
        ref[2] /= ref[3]
        np.testing.assert_allclose(out[i], ref, rtol=1e-6)


def _ref_iou_tlwh(bbox, candidates):
    # Oracle mirroring deep_sort/iou_matching.py:7-39 arithmetic.
    bbox_tl, bbox_br = bbox[:2], bbox[:2] + bbox[2:]
    cand_tl = candidates[:, :2]
    cand_br = candidates[:, :2] + candidates[:, 2:]
    tl = np.maximum(bbox_tl, cand_tl)
    br = np.minimum(bbox_br, cand_br)
    wh = np.maximum(0.0, br - tl)
    inter = wh.prod(axis=1)
    return inter / (bbox[2:].prod() + candidates[:, 2:].prod(axis=1) - inter)


def test_iou_matrix(rng):
    a = rng.uniform(0, 50, size=(6, 4))
    a[:, 2:] += 1
    b = rng.uniform(0, 50, size=(9, 4))
    b[:, 2:] += 1
    got = np.asarray(boxes.iou_matrix_tlwh(a, b))
    for i in range(len(a)):
        np.testing.assert_allclose(got[i], _ref_iou_tlwh(a[i], b), rtol=1e-5)


def test_segment_intersection_reference_cases():
    # The six assert cases shipped in tools/intersection.py:35-57.
    f = lambda x: np.array(x, dtype=float)
    p1, q1 = f([0, 0]), f([1, 0])
    assert bool(geometry.segments_intersect(p1, q1, f([1, -1]), f([0, 1])))
    assert not bool(geometry.segments_intersect(p1, q1, f([1, 2]), f([1, 1])))
    assert not bool(geometry.segments_intersect(p1, q1, f([1.01, 0]), f([2, 0])))
    assert bool(geometry.segments_intersect(f([1, 2]), f([1, 1]),
                                            f([1, 2]), f([1, 3])))
    pts1 = f([[1, 2], [1, 1], [1, -1], [1, -2]])
    assert bool(geometry.any_intersection(p1, q1, jnp.asarray(pts1)))
    pts2 = f([[1, 2], [1, 1], [3, 1], [3, -2]])
    assert not bool(geometry.any_intersection(p1, q1, jnp.asarray(pts2)))


def test_any_intersection_validity_mask():
    f = lambda x: jnp.asarray(np.array(x, dtype=float))
    p1, q1 = f([0, 0]), f([1, 0])
    pts = f([[1, 2], [1, 1], [1, -1], [1, -2]])
    valid = jnp.array([True, True, False, False])
    # the crossing segment (1,1)->(1,-1) has an invalid endpoint -> no hit
    assert not bool(geometry.any_intersection(p1, q1, pts, valid))
    assert bool(geometry.any_intersection(p1, q1, pts,
                                          jnp.array([True] * 4)))


def test_crossing_direction():
    f = lambda x: jnp.asarray(np.array(x, dtype=float))
    a, b = f([0, 0]), f([0, 10])  # vertical countline
    assert float(geometry.crossing_direction(a, b, f([-5, 5]))) > 0
    assert float(geometry.crossing_direction(a, b, f([5, 5]))) < 0
