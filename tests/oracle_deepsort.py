"""Numpy/scipy oracle reproducing the reference Deep SORT semantics
(deep_sort/{tracker,track,kalman_filter,linear_assignment,nn_matching,
iou_matching}.py) for golden-parity testing of the in-jit tracker.

Written as an independent implementation of the published Deep SORT
algorithm; scipy provides the Kalman solves and Hungarian assignment just as
in the reference, so its discrete decisions are the ground truth the TPU
tracker must reproduce.
"""
from __future__ import annotations

import numpy as np
import scipy.linalg
from scipy.optimize import linear_sum_assignment

INFTY = 1e5
CHI2_4 = 9.4877
WP, WV = 1.0 / 20, 1.0 / 160


class KF:
    def __init__(self):
        self.F = np.eye(8)
        for i in range(4):
            self.F[i, 4 + i] = 1.0
        self.H = np.eye(4, 8)

    def initiate(self, m):
        mean = np.r_[m, np.zeros_like(m)]
        h = m[3]
        std = [2 * WP * h, 2 * WP * h, 1e-2, 2 * WP * h,
               10 * WV * h, 10 * WV * h, 1e-5, 10 * WV * h]
        return mean, np.diag(np.square(std))

    def predict(self, mean, cov):
        h = mean[3]
        q = np.diag(np.square(
            [WP * h, WP * h, 1e-2, WP * h, WV * h, WV * h, 1e-5, WV * h]))
        return self.F @ mean, self.F @ cov @ self.F.T + q

    def project(self, mean, cov):
        h = mean[3]
        r = np.diag(np.square([WP * h, WP * h, 1e-1, WP * h]))
        return self.H @ mean, self.H @ cov @ self.H.T + r

    def update(self, mean, cov, z):
        pm, pc = self.project(mean, cov)
        chol, lower = scipy.linalg.cho_factor(pc, lower=True)
        gain = scipy.linalg.cho_solve((chol, lower), (cov @ self.H.T).T).T
        return mean + (z - pm) @ gain.T, cov - gain @ pc @ gain.T

    def gating(self, mean, cov, measurements):
        pm, pc = self.project(mean, cov)
        chol = np.linalg.cholesky(pc)
        d = np.asarray(measurements) - pm
        z = scipy.linalg.solve_triangular(chol, d.T, lower=True)
        return np.sum(z * z, axis=0)


def tlwh_to_xyah(b):
    r = np.array(b, float).copy()
    r[:2] += r[2:] / 2
    r[2] /= r[3]
    return r


def iou_1vs_many(bbox, cands):
    tl = np.maximum(bbox[:2], cands[:, :2])
    br = np.minimum(bbox[:2] + bbox[2:], cands[:, :2] + cands[:, 2:])
    wh = np.maximum(0.0, br - tl)
    inter = wh.prod(axis=1)
    return inter / (bbox[2:].prod() + cands[:, 2:].prod(axis=1) - inter)


TENTATIVE, CONFIRMED, DELETED = 1, 2, 3


class OTrack:
    def __init__(self, mean, cov, tid, n_init, max_age, det):
        self.mean, self.cov, self.tid = mean, cov, tid
        self.hits, self.age, self.tsu = 1, 1, 0
        self.state = TENTATIVE
        self.features = [det[3]]
        self.label_votes = [(det[2], det[1])]
        self.n_init, self.max_age = n_init, max_age

    def to_tlwh(self):
        r = self.mean[:4].copy()
        r[2] *= r[3]
        r[:2] -= r[2:] / 2
        return r


class OracleTracker:
    def __init__(self, max_cosine_distance=0.2, max_iou_distance=0.7,
                 max_age=60, n_init=3):
        self.kf = KF()
        self.max_cos, self.max_iou = max_cosine_distance, max_iou_distance
        self.max_age, self.n_init = max_age, n_init
        self.tracks = []
        self.deleted_tracks = []
        self.samples = {}
        self.next_id = 1

    def predict(self):
        for t in self.tracks:
            t.mean, t.cov = self.kf.predict(t.mean, t.cov)
            t.age += 1
            t.tsu += 1

    # dets: list of (tlwh ndarray, conf, label:int, feature ndarray f32)
    def update(self, dets):
        matches, unmatched_tracks, unmatched_dets = self._match(dets)
        for ti, di in matches:
            t = self.tracks[ti]
            d = dets[di]
            t.mean, t.cov = self.kf.update(t.mean, t.cov, tlwh_to_xyah(d[0]))
            t.features.append(d[3])
            t.hits += 1
            t.tsu = 0
            if t.state == TENTATIVE and t.hits >= t.n_init:
                t.state = CONFIRMED
            t.label_votes.append((d[2], d[1]))
        for ti in unmatched_tracks:
            t = self.tracks[ti]
            if t.state == TENTATIVE:
                t.state = DELETED
            elif t.tsu > t.max_age:
                t.state = DELETED
        for di in unmatched_dets:
            d = dets[di]
            mean, cov = self.kf.initiate(tlwh_to_xyah(d[0]))
            self.tracks.append(OTrack(mean, cov, self.next_id, self.n_init,
                                      self.max_age, d))
            self.next_id += 1
        self.deleted_tracks = [t for t in self.tracks if t.state == DELETED]
        self.tracks = [t for t in self.tracks if t.state != DELETED]
        active = [t.tid for t in self.tracks if t.state == CONFIRMED]
        for t in self.tracks:
            if t.state != CONFIRMED:
                continue
            self.samples.setdefault(t.tid, []).extend(t.features)
            t.features = []
        self.samples = {k: self.samples[k] for k in active}
        return matches

    def _cosine_cost(self, track_indices, det_indices, dets):
        feats = np.array([dets[i][3] for i in det_indices], np.float32)
        fn = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        cost = np.zeros((len(track_indices), len(det_indices)))
        for r, ti in enumerate(track_indices):
            g = np.array(self.samples[self.tracks[ti].tid], np.float32)
            gn = g / np.linalg.norm(g, axis=1, keepdims=True)
            cost[r] = (1.0 - gn @ fn.T).min(axis=0)
        # gating
        meas = np.array([tlwh_to_xyah(dets[i][0]) for i in det_indices])
        for r, ti in enumerate(track_indices):
            t = self.tracks[ti]
            gd = self.kf.gating(t.mean, t.cov, meas)
            cost[r, gd > CHI2_4] = INFTY
        return cost

    def _min_cost_matching(self, cost_fn, max_distance, dets,
                           track_indices, det_indices):
        if len(det_indices) == 0 or len(track_indices) == 0:
            return [], list(track_indices), list(det_indices)
        cost = cost_fn(track_indices, det_indices, dets)
        cost[cost > max_distance] = max_distance + 1e-5
        rows, cols = linear_sum_assignment(cost)
        matches, un_t, un_d = [], [], []
        for col, di in enumerate(det_indices):
            if col not in cols:
                un_d.append(di)
        for row, ti in enumerate(track_indices):
            if row not in rows:
                un_t.append(ti)
        for row, col in zip(rows, cols):
            ti, di = track_indices[row], det_indices[col]
            if cost[row, col] > max_distance:
                un_t.append(ti)
                un_d.append(di)
            else:
                matches.append((ti, di))
        return matches, un_t, un_d

    def _iou_cost(self, track_indices, det_indices, dets):
        cost = np.zeros((len(track_indices), len(det_indices)))
        cands = np.array([dets[i][0] for i in det_indices], float)
        for r, ti in enumerate(track_indices):
            t = self.tracks[ti]
            if t.tsu > 1:
                cost[r, :] = INFTY
            else:
                cost[r, :] = 1.0 - iou_1vs_many(t.to_tlwh(), cands)
        return cost

    def _match(self, dets):
        confirmed = [i for i, t in enumerate(self.tracks)
                     if t.state == CONFIRMED]
        unconfirmed = [i for i, t in enumerate(self.tracks)
                       if t.state != CONFIRMED]
        # matching cascade
        unmatched_dets = list(range(len(dets)))
        matches_a = []
        track_indices = confirmed
        for level in range(self.max_age):
            if len(unmatched_dets) == 0:
                break
            level_tracks = [k for k in track_indices
                            if self.tracks[k].tsu == 1 + level]
            if len(level_tracks) == 0:
                continue
            m, _, unmatched_dets = self._min_cost_matching(
                self._cosine_cost, self.max_cos, dets, level_tracks,
                unmatched_dets)
            matches_a += m
        unmatched_a = sorted(set(track_indices) -
                             set(k for k, _ in matches_a))
        iou_candidates = unconfirmed + [
            k for k in unmatched_a if self.tracks[k].tsu == 1]
        unmatched_a = [k for k in unmatched_a if self.tracks[k].tsu != 1]
        matches_b, unmatched_b, unmatched_dets = self._min_cost_matching(
            self._iou_cost, self.max_iou, dets, iou_candidates,
            unmatched_dets)
        matches = matches_a + matches_b
        unmatched_tracks = list(set(unmatched_a + unmatched_b))
        return matches, unmatched_tracks, unmatched_dets
