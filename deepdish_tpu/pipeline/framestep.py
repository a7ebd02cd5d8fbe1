"""The fused per-frame device program and the chunked throughput engine.

This is the TPU-native replacement for the reference's per-frame hot path
(deepdish.py:903-1033: MOG2 background subtraction -> detector in a thread
executor -> per-box Python crop loop + encoder -> Python Deep SORT): ONE
jit-compiled XLA program takes the raw uint8 frame and the pipeline state
and returns the updated state plus per-frame snapshots — background
subtraction, preprocess, detector forward, box decode, NMS, wanted-label
filtering, spurious-box and motion-ratio rejection, batched crop+embed, and
the full tracker update, with no host round trips in between.

Reference-fidelity notes (for crossing-count parity):
  * boxes are clipped and truncated to integers exactly like
    deepdish.py:950-951 (int(np.clip(...))) before NMS;
  * the NaN guard replicates the reference's semantics at :947-949 — any
    NaN in the candidate box array drops the whole frame's detections;
  * the motion-ratio filter accepts a box when the foreground-pixel count
    inside it reaches background_subtraction_ratio * w * h (:957),
    computed here with an integral image over the MOG2 mask.

Throughput mode (`run_chunk`) processes F frames per dispatch: background
subtraction scans sequentially (its state is temporal), the
detector/encoder run batched over the frame axis (large MXU batches), then
the tracker runs as a `lax.scan` over the chunk — amortizing dispatch
overhead and keeping the MXU busy.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import tracker as tt
from ..models.preprocess import crop_resize_patches_mxu, resize_bilinear_mxu
from ..ops import bgsub
from ..ops import colorspace
from ..ops import boxes as boxops
from ..ops import nms as nmsops
from ..ops.onehot import gather_1d, gather_rows


class DetectionSnapshot(NamedTuple):
    """Post-NMS detections for rendering/logging (fixed capacity D)."""
    tlwh: jnp.ndarray
    label: jnp.ndarray
    score: jnp.ndarray
    valid: jnp.ndarray


class PipelineState(NamedTuple):
    table: tt.TrackTable
    bg: Optional[bgsub.MOG2State]


class FrameStepConfig(NamedTuple):
    nms_max_overlap: float = 0.6        # --nms-max-overlap (deepdish.py:1420)
    spurious_area_frac: float = 0.9     # deepdish.py:952-955
    score_threshold: float = 0.5
    background_subtraction: bool = False
    background_ratio: float = 0.25      # --background-subtraction-ratio
    background_masking: bool = False    # --enable-background-masking
    # Appearance-encode capacity per frame: 0 = encode every detection slot
    # (exact reference semantics). A smaller value crops+embeds only the
    # first E post-NMS detections (they are compacted in descending-score
    # order); any detections beyond E keep zero features, so they are still
    # IoU-matched/tracked but not appearance-matched that frame. The
    # encoder is the FLOPs hog of the fused program (MARS is ~0.6 GFLOP
    # per crop), and the reference's own cost scales with the number of
    # real detections, so a capacity covering the scene's typical load
    # (e.g. 8) is semantically free on the demo workloads. Overflow is
    # host-visible as snap.valid[E:].sum().
    encode_capacity: int = 0


class FrameStep:
    """Binds detector + encoder + tracker (+ MOG2) into fused programs."""

    def __init__(self, detector, encoder, tracker_cfg: tt.TrackerConfig,
                 wanted_labels: Sequence[str],
                 frame_shape, step_cfg: FrameStepConfig = FrameStepConfig()):
        self.detector = detector
        self.encoder = encoder
        self.tracker_cfg = tracker_cfg
        self.wanted_labels = list(wanted_labels)
        self.step_cfg = step_cfg
        self.frame_h, self.frame_w = int(frame_shape[0]), int(frame_shape[1])

        # detector-class -> wanted-vocab index (or -1), like the adaptor's
        # `labels[i] in wanted_labels` filter (tools/ssd_mobilenet.py:208).
        n_model_classes = max(detector.labels) + 1
        lut = np.full((n_model_classes,), -1, np.int32)
        for idx, name in detector.labels.items():
            if name in self.wanted_labels:
                lut[idx] = self.wanted_labels.index(name)
        self._label_lut = jnp.asarray(lut)

        D = tracker_cfg.max_detections
        self._enc_cap = min(step_cfg.encode_capacity or D, D)

        self._params_host = {"det": detector.params}
        if getattr(encoder, "params", None) is not None:
            self._params_host["enc"] = encoder.params
        self._params_dev = None

        self._step_jit = jax.jit(self._step)
        self._chunk_jit = jax.jit(self._run_chunk)
        self._chunk_yuv_jit = jax.jit(self._run_chunk_yuv)
        # Integer-datapath detectors (models/qgraph.py expose `executor`)
        # cannot share one XLA program with the YUV conversion at large
        # chunk sizes: the fused program deterministically crashes the TPU
        # worker at chunk 32 (round-4 bisect — float+yuv32, int8+rgb32,
        # int8+yuv16 and conversion-alone-32 all pass; int8+yuv32 faults
        # even behind an optimization_barrier). run_chunk_yuv therefore
        # dispatches the conversion separately for quantized detectors —
        # bit-identical results, two dispatches instead of one
        # (tests/test_yuv_split_regression.py pins the bit-identity).
        # Re-try fusing on every jax/libtpu bump with
        # `python tools/repro_int8_yuv_crash.py --fault` on TPU; if it
        # passes there, this split can be retired.
        self._yuv_split = hasattr(detector, "executor")
        self._convert_yuv_jit = jax.jit(jax.vmap(
            lambda f: colorspace.yuv420_to_rgb_u8(
                f, self.frame_h, self.frame_w)))
        self._track_only_jit = jax.jit(self._track_only)
        self._detect_only_jit = jax.jit(self._detect_only)
        self._encode_track_jit = jax.jit(self._encode_track)
        self._scripted_jit = jax.jit(self._scripted_step)

    @property
    def _params(self):
        """Weights as DEVICE arrays, put once on first use.

        Converted artifacts (models/convert.py) arrive as host numpy trees;
        passing those to jit ships every leaf host->device on EVERY
        dispatch — measured 83x slower than the identical program with
        device-resident weights on the axon tunnel (28.9 vs 0.35 ms/frame,
        window-controlled interleaved A/B, docs/BENCH_NOTES.md round 4).
        Random-init weights never hit this (flax init already returns
        device arrays), which is why the bug only showed on real-weight
        serving. Lazy (not in __init__) so constructing a FrameStep stays
        free of backend initialization."""
        if self._params_dev is None:
            self._params_dev = jax.device_put(self._params_host)
        return self._params_dev

    # ---- device program pieces ----

    def _apply_bgsub(self, bg, frame):
        """Returns (new_bg, fg_count_integral or None, masked frame)."""
        cfg = self.step_cfg
        if not cfg.background_subtraction:
            return bg, None, frame
        bg, mask = bgsub.update(bg, frame)
        fg = (mask != 0).astype(jnp.int32)
        integral = jnp.pad(jnp.cumsum(jnp.cumsum(fg, axis=0), axis=1),
                           ((1, 0), (1, 0)))
        if cfg.background_masking:
            frame = jnp.where((mask != 0)[:, :, None], frame, 0)
        return bg, integral, frame

    def _motion_ok(self, integral, x, y, w, h):
        """Foreground count in [y, y+h) x [x, x+w) >= ratio * w * h."""
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)
        x2 = xi + w.astype(jnp.int32)
        y2 = yi + h.astype(jnp.int32)
        s = (integral[y2, x2] - integral[yi, x2] -
             integral[y2, xi] + integral[yi, xi])
        return s >= self.step_cfg.background_ratio * w * h

    def _filter_and_nms(self, integral, xyxy, classes, scores, valid):
        """Box filtering + pipeline NMS -> compacted DetectionSnapshot."""
        cfg = self.step_cfg
        H, W = self.frame_h, self.frame_w

        vocab = gather_1d(self._label_lut,
                          jnp.clip(classes, 0,
                                   self._label_lut.shape[0] - 1))
        valid = valid & (vocab >= 0) & (scores >= cfg.score_threshold)

        raw_tlwh = boxops.xyxy_to_tlwh(xyxy)
        # Reference NaN guard (deepdish.py:947-949): any NaN among the
        # candidate boxes drops them all.
        any_nan = jnp.any(jnp.where(valid[:, None],
                                    ~jnp.isfinite(raw_tlwh), False))
        valid = valid & ~any_nan

        # int(np.clip(...)) truncation (deepdish.py:950-951)
        x = jnp.floor(jnp.clip(raw_tlwh[:, 0], 0, W))
        y = jnp.floor(jnp.clip(raw_tlwh[:, 1], 0, H))
        w = jnp.floor(jnp.clip(raw_tlwh[:, 2], 0, W - x))
        h = jnp.floor(jnp.clip(raw_tlwh[:, 3], 0, H - y))
        tlwh = jnp.stack([x, y, w, h], axis=1)
        valid = valid & (w * h <= cfg.spurious_area_frac * (W * H))
        valid = valid & (w * h > 0)
        if integral is not None:
            valid = valid & self._motion_ok(integral, x, y, w, h)

        # pipeline class-agnostic NMS (deepdish.py:995)
        order, _keep = nmsops.nms_tlwh(tlwh, scores, valid,
                                       cfg.nms_max_overlap)
        sel = order[:self.tracker_cfg.max_detections]
        ok = sel >= 0
        sel = jnp.clip(sel, 0, tlwh.shape[0] - 1)
        return DetectionSnapshot(
            tlwh=jnp.where(ok[:, None], gather_rows(tlwh, sel), 0.0),
            label=jnp.where(ok, gather_1d(vocab, sel), 0),
            score=jnp.where(ok, gather_1d(scores, sel), 0.0), valid=ok)

    def _pad_features(self, feats_e):
        """(E, F) encoder output -> (D, F): slots past the encode capacity
        carry zero features (cosine distance 1, never appearance-matched)."""
        D = self.tracker_cfg.max_detections
        E = feats_e.shape[0]
        if E == D:
            return feats_e
        return jnp.concatenate(
            [feats_e, jnp.zeros((D - E, feats_e.shape[1]), feats_e.dtype)])

    def _postprocess_raw(self, frame, integral, xyxy, classes, scores,
                         valid, params):
        """Shared tail after the detector: filters, NMS, crop+embed."""
        snap = self._filter_and_nms(integral, xyxy, classes, scores, valid)
        # batched crop + embed (replaces generate_detections.py:192-213);
        # post-NMS slots are compacted in pick order, so the first E slots
        # are exactly the E best detections
        E = self._enc_cap
        feats_e, _enc_ok = self.encoder.encode_boxes(
            frame, snap.tlwh[:E], snap.valid[:E], params.get("enc"))
        feats = self._pad_features(feats_e)
        dets = tt.Detections(tlwh=snap.tlwh, confidence=snap.score,
                             label=snap.label, feature=feats,
                             valid=snap.valid)
        return dets, snap

    def _detect_raw(self, params, frame):
        det = self.detector
        if getattr(det, "letterbox", False):
            # aspect-preserving resize onto a gray-128 canvas
            # (tools/yolo.py:141-151); geometry is static per frame size
            left, top, nw, nh = det.configure_letterbox(self.frame_w,
                                                        self.frame_h)
            small = resize_bilinear_mxu(frame, nh, nw)
            resized = jnp.pad(
                small, ((top, det.height - nh - top),
                        (left, det.width - nw - left), (0, 0)),
                constant_values=128.0)
        else:
            resized = resize_bilinear_mxu(frame, det.height, det.width)
        return det.detect(params["det"], resized,
                          jnp.float32(self.frame_w),
                          jnp.float32(self.frame_h))

    def _step(self, params, state: PipelineState, frame):
        bg, integral, frame = self._apply_bgsub(state.bg, frame)
        raw = self._detect_raw(params, frame)
        dets, snap = self._postprocess_raw(frame, integral, *raw, params)
        table, out = tt.step(self.tracker_cfg, state.table, dets)
        return PipelineState(table, bg), out, snap, raw

    def _track_only(self, params, state: PipelineState, frame, raw):
        """Frame-skip mode (--object-detector-skip-frames,
        deepdish.py:929-938): reuse the previous RAW detector output, but
        re-run filtering + crop/embed on the CURRENT frame, then track."""
        bg, integral, frame = self._apply_bgsub(state.bg, frame)
        dets, snap = self._postprocess_raw(frame, integral, *raw, params)
        table, out = tt.step(self.tracker_cfg, state.table, dets)
        return PipelineState(table, bg), out, snap

    def _detect_only(self, params, bg, frame):
        """Split mode for CVAT annotation merge (the host must see the
        post-NMS detections BEFORE encoding, deepdish.py:995->1001): runs
        bgsub + detector + filters + NMS, returns the compacted candidate
        boxes without encoding/tracking."""
        bg, integral, frame = self._apply_bgsub(bg, frame)
        raw = self._detect_raw(params, frame)
        snap = self._filter_and_nms(integral, *raw)
        return bg, snap

    def _encode_track(self, params, state: PipelineState, frame,
                      tlwh, labels, scores, valid):
        """Second half of split mode: crop+embed the (possibly
        annotation-merged) boxes on the current frame, then track."""
        feats, _ = self.encoder.encode_boxes(frame, tlwh, valid,
                                             params.get("enc"))
        dets = tt.Detections(tlwh=tlwh, confidence=scores, label=labels,
                             feature=feats, valid=valid)
        table, out = tt.step(self.tracker_cfg, state.table, dets)
        snap = DetectionSnapshot(tlwh=tlwh, label=labels, score=scores,
                                 valid=valid)
        return PipelineState(table, state.bg), out, snap, dets

    def _scripted_step(self, params, state: PipelineState, frame,
                       xyxy, classes, scores, valid):
        """Host-scripted detector path: the raw boxes come from the host
        (ScriptedDetector.detect_host) but everything downstream — bgsub,
        the reference's box filters, pipeline NMS, crop+embed, the tracker
        step — is the same fused device program the real detectors feed.
        Mirrors deepdish.py:941-1033 with detect_image scripted."""
        bg, integral, frame = self._apply_bgsub(state.bg, frame)
        dets, snap = self._postprocess_raw(frame, integral, xyxy, classes,
                                           scores, valid, params)
        table, out = tt.step(self.tracker_cfg, state.table, dets)
        return PipelineState(table, bg), out, snap

    def _detect_encode_frames(self, params, frames, integrals=None):
        """Per-frame detector + filters + NMS + crop + embed for a stack of
        frames (F, H, W, 3) -> (Detections, DetectionSnapshot) stacked on F.

        This is the parallelizable bulk of the chunk program (no temporal
        state): the detector/NMS run vmapped over the frame axis and the
        encoder runs ONE (F*E,) MXU batch. The sequential pieces (MOG2
        scan, tracker scan) stay in `_run_chunk`; the temporal
        sequence-parallel engine (parallel/temporal.py) shards this part
        over a device mesh and gathers before the tracker scan."""
        F = frames.shape[0]
        E = self._enc_cap

        def detect_one(frame, integral):
            raw = self._detect_raw(params, frame)
            return self._filter_and_nms(integral, *raw)

        if integrals is None:
            snaps = jax.vmap(lambda f: detect_one(f, None))(frames)
        else:
            snaps = jax.vmap(detect_one)(frames, integrals)

        # crop per frame (each box samples its own frame), embed chunk-wide
        patches, ok = jax.vmap(
            lambda f, t, v: crop_resize_patches_mxu(
                f, t[:E], v[:E], self.encoder.height, self.encoder.width)
        )(frames, snaps.tlwh, snaps.valid)
        flat = patches.reshape((F * E,) + patches.shape[2:])
        feats = self.encoder.apply(flat, params.get("enc"))
        feats = jnp.where(ok.reshape(F * E)[:, None], feats, 0.0)
        feats = feats.reshape(F, E, -1)
        feats = jax.vmap(self._pad_features)(feats)

        dets = tt.Detections(tlwh=snaps.tlwh, confidence=snaps.score,
                             label=snaps.label, feature=feats,
                             valid=snaps.valid)
        return dets, snaps

    def _run_chunk(self, params, state: PipelineState, frames):
        """frames (F, H, W, 3) -> (state, stacked outputs, snaps).

        Stage structure: sequential MOG2 scan (temporal state) -> vmapped
        detector+NMS -> per-frame crop, then ONE encoder forward over the
        whole (F*E,) patch batch (a single large MXU batch instead of F
        vmap lanes) -> lax.scan tracker.
        """
        if self.step_cfg.background_subtraction:
            def bg_scan(bg, frame):
                bg2, integral, masked = self._apply_bgsub(bg, frame)
                return bg2, (integral, masked)
            bg, (integrals, masked_frames) = jax.lax.scan(
                bg_scan, state.bg, frames)
        else:
            bg, integrals, masked_frames = state.bg, None, frames

        dets, snaps = self._detect_encode_frames(params, masked_frames,
                                                 integrals)

        def scan_body(tbl, det):
            tbl, out = tt.step(self.tracker_cfg, tbl, det)
            return tbl, out

        table, outs = jax.lax.scan(scan_body, state.table, dets)
        return PipelineState(table, bg), outs, snaps

    def _run_chunk_yuv(self, params, state: PipelineState, yuv_frames):
        """Chunk entry taking planar I420 frames (F, H*3/2, W) uint8 — half
        the host->device bytes; conversion to uint8 RGB happens on device
        (ops/colorspace.yuv420_to_rgb_u8), so the YUV transport feeds the
        exact frame dtype the host RGB transport does and the downstream
        program is identical for both."""
        frames = jax.vmap(
            lambda f: colorspace.yuv420_to_rgb_u8(
                f, self.frame_h, self.frame_w))(yuv_frames)
        return self._run_chunk(params, state, frames)

    # ---- host API ----

    def init_table(self) -> tt.TrackTable:
        return tt.create_table(self.tracker_cfg)

    def init_state(self) -> PipelineState:
        bg = (bgsub.init_state(self.frame_h, self.frame_w)
              if self.step_cfg.background_subtraction else None)
        return PipelineState(self.init_table(), bg)

    def step(self, state: PipelineState, frame_rgb: np.ndarray):
        """One frame. Returns (state, out, snap, raw_detections)."""
        return self._step_jit(self._params, state, frame_rgb)

    def step_skip(self, state: PipelineState, frame_rgb: np.ndarray, raw):
        """Frame-skip step reusing previous raw detector output."""
        return self._track_only_jit(self._params, state, frame_rgb, raw)

    def run_chunk(self, state: PipelineState, frames_rgb: np.ndarray):
        """F frames in one dispatch. frames_rgb uint8 (F, H, W, 3)."""
        return self._chunk_jit(self._params, state, frames_rgb)

    def run_chunk_yuv(self, state: PipelineState, yuv_frames: np.ndarray):
        """F I420 frames (F, H*3/2, W) uint8 in one dispatch (two for
        quantized detectors — see __init__ on the split)."""
        if self._yuv_split:
            frames = self._convert_yuv_jit(yuv_frames)
            return self._chunk_jit(self._params, state, frames)
        return self._chunk_yuv_jit(self._params, state, yuv_frames)

    def scripted_step(self, state: PipelineState, frame_rgb, xyxy,
                      classes, scores, valid):
        """Host-scripted detections through the fused filter+NMS+embed+
        track program. Returns (state, out, snap)."""
        return self._scripted_jit(self._params, state, frame_rgb, xyxy,
                                  classes, scores, valid)

    def detect_only(self, state: PipelineState, frame_rgb):
        """CVAT split mode, stage 1: returns (new_bg, DetectionSnapshot)."""
        return self._detect_only_jit(self._params, state.bg, frame_rgb)

    def encode_track(self, state: PipelineState, frame_rgb, tlwh, labels,
                     scores, valid):
        """CVAT split mode, stage 2 (after host annotation merge)."""
        return self._encode_track_jit(
            self._params, state, frame_rgb, tlwh, labels, scores, valid)
