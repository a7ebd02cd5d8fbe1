"""Detector/encoder registries with name-substring dispatch.

Mirrors the reference's backend selection by model-filename substring
(deepdish.py:482-502 for detectors, tools/generate_detections.py:180-189 for
encoders): 'yolov5' in the name selects YOLOv5, 'ssd'/'mobilenet' selects
SSD-MobileNet, 'efficientdet'/'tflite' the metadata-driven detector,
'scripted' a host-driven detector for weightless integration tests.

Every detector exposes the uniform contract:
  width/height    — model input size
  detect_jit(image_resized, orig_w, orig_h)
      -> (boxes_xyxy px, classes int32 0-based, scores, valid), fixed cap
  labels          — dict index -> label name (1-based offset already applied
                    where the reference applies it)
"""
from __future__ import annotations

import os

import numpy as np
from typing import Optional, Sequence

from .ssd_mobilenet import SSDMobileNetDetector
from .yolov3 import YOLOv3Detector
from .yolov5 import YOLOv5Detector
from .efficientdet import EfficientDetLite0Detector

# COCO labelmap (91-entry TF-OD style with background dropped), the label
# vocabulary behind coco_labelmap.txt consumed at ssd_mobilenet.py:45-47.
COCO_LABELS = [
    "person", "bicycle", "car", "motorbike", "aeroplane", "bus", "train",
    "truck", "boat", "traffic light", "fire hydrant", "stop sign",
    "parking meter", "bench", "bird", "cat", "dog", "horse", "sheep", "cow",
    "elephant", "bear", "zebra", "giraffe", "backpack", "umbrella",
    "handbag", "tie", "suitcase", "frisbee", "skis", "snowboard",
    "sports ball", "kite", "baseball bat", "baseball glove", "skateboard",
    "surfboard", "tennis racket", "bottle", "wine glass", "cup", "fork",
    "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair",
    "sofa", "pottedplant", "bed", "diningtable", "toilet", "tvmonitor",
    "laptop", "mouse", "remote", "keyboard", "cell phone", "microwave",
    "oven", "toaster", "sink", "refrigerator", "book", "clock", "vase",
    "scissors", "teddy bear", "hair drier", "toothbrush",
]


def load_labels(label_file: Optional[str]) -> Sequence[str]:
    if label_file and os.path.exists(label_file):
        with open(label_file) as f:
            return [line.strip() for line in f]
    return list(COCO_LABELS)


def _detection_labels(label_file: Optional[str]):
    """Label dict for 0-based background-stripped class ids. A .pbtxt
    label map (the SavedModel family's convention,
    tools/saved_model.py:70-103) carries 1-based ids -> shifted to the
    0-based contract; plain text files are one name per line."""
    if label_file and label_file.endswith(".pbtxt") \
            and os.path.exists(label_file):
        from .labelmap import load_pbtxt_labelmap
        table = load_pbtxt_labelmap(label_file)
        return {i - 1: n for i, n in table.items()}
    return {i: n for i, n in enumerate(load_labels(label_file))}


def _bright_blob_script(frame_rgb, thresh=150, min_area=400):
    """Weightless host detector: bright connected components -> person
    boxes. Makes `--model scripted:bright` produce real detections (and
    therefore crossings) on the synthetic demo videos
    (demos/make_demo_video.py draws bright rectangles on a dark
    background), so the full detect->embed->track->count->publish path can
    be driven end-to-end with no model artifacts."""
    import cv2
    gray = np.asarray(frame_rgb).max(axis=-1)
    mask = (gray > thresh).astype(np.uint8)
    n, _, stats, _ = cv2.connectedComponentsWithStats(mask, connectivity=4)
    boxes, names, scores = [], [], []
    for i in range(1, n):                      # 0 is background
        x, y, w, h, area = stats[i]
        if area >= min_area:
            boxes.append((float(x), float(y), float(w), float(h)))
            names.append("person")
            scores.append(min(1.0, area / (frame_rgb.shape[0]
                                           * frame_rgb.shape[1])
                          * 20 + 0.5))
    return boxes, names, scores


#: name -> script registry for `create_detector("scripted:<name>")`; the
#: test/demo seam analogous to the reference's dummy/constant encoder
#: backends (tools/generate_detections.py:86-116,182-189). "noop" and
#: "bright" ship built-in so `deepdish-tpu --model scripted:noop` (or
#: :bright) smoke-runs the whole pipeline from a fresh process with no
#: weights and no in-process registration (packaging/CLI tests drive this
#: path via subprocess; the hardware app drive uses :bright for real
#: crossing events on the synthetic demo).
SCRIPTS = {"noop": lambda frame_rgb: ([], [], []),
           "bright": _bright_blob_script}


def register_script(name, script):
    """Register `script(frame_rgb) -> (boxes_tlwh, label_names, scores)`
    under `name` so `--model scripted:<name>` selects it."""
    SCRIPTS[name] = script


class ScriptedDetector:
    """Host-driven detector for tests/demos without weights: the caller
    provides a function frame_rgb -> (boxes_tlwh, label_names, scores),
    the exact duck-typed contract of the reference adaptors
    (tools/ssd_mobilenet.py:198-213). The pipeline routes these boxes
    through the same on-device filter+NMS+crop/embed+track program the
    real detectors feed (FrameStep.scripted_step)."""

    params = None

    def __init__(self, script, wanted_labels=None, width=320, height=320):
        self.script = script
        self.width, self.height = width, height
        self.use_edgetpu = False
        names = list(wanted_labels or ["person"])
        self.labels = {i: n for i, n in enumerate(names)}
        self.label_offset = 0
        self._name_to_class = {n: i for i, n in self.labels.items()}

    def detect_host(self, frame_rgb):
        """(boxes_tlwh, class_idx, scores) from the host script."""
        boxes, names, scores = self.script(frame_rgb)
        classes = [self._name_to_class.get(n, -1) for n in names]
        return boxes, classes, scores


def _load_real_weights(path: str, family: str):
    """Convert a real weight artifact (TFLite flatbuffer, Keras .h5, or a
    native .npz saved by models.weights.save_npz) into a flax variable tree
    for `family`. Returns (params, extras); params is None when the path is
    not a loadable artifact. extras carries the flatbuffer's fused
    TFLite_Detection_PostProcess parameters (embedded anchors, decode
    scales, NMS options) when the file ends in that custom op — the
    artifacts the reference actually ships (tools/ssd_mobilenet.py:100-127,
    tools/tflite_object_detector.py:154-172)."""
    from . import convert as cv
    from . import weights as w
    if path.endswith(".npz"):
        return w.load_npz(path), {}
    if path.endswith(".tflite"):
        loader = {"yolov5": cv.load_yolov5_tflite,
                  "efficientdet": cv.load_efficientdet_tflite,
                  "ssd": cv.load_ssd_mobilenet_tflite}.get(family)
        if loader is not None:
            params, report = loader(path)
            extras = {}
            pp = report.get("postprocess")
            if pp is not None:
                extras["postprocess"] = pp
                if report.get("anchors_verified") is False:
                    print("note: generated anchors differ from the "
                          "flatbuffer's embedded anchor table "
                          f"({report.get('anchors_max_abs_diff')}); "
                          "using the embedded anchors.")
            return params, extras
    if path.endswith(".h5") and family == "yolov3":
        return cv.load_yolov3_h5(path)[0], {}
    return None, {}


def _pp_det_kw(pp, score_threshold, anchor_scale=1.0):
    """Detector kwargs from a fused TFLite_Detection_PostProcess op — the
    authoritative per-file configuration (the reference consumes the op's
    outputs: tools/ssd_mobilenet.py:100-127,
    tools/tflite_object_detector.py:154-172): embedded anchor table,
    decode scales, `max(cli, op)` score threshold, the op's NMS iou, and
    its max_detections as the validity cap (the op emits at most that
    many boxes, so slots past it are invalidated downstream)."""
    return dict(anchors=pp.anchors * anchor_scale, box_scale=pp.scales,
                score_threshold=max(score_threshold,
                                    pp.nms_score_threshold),
                iou_threshold=pp.nms_iou_threshold,
                detections_cap=pp.max_detections)


def create_detector(model_name: str, wanted_labels=None, label_file=None,
                    score_threshold: float = 0.5, params=None,
                    max_outputs: int = 32,
                    allow_random_weights: bool = False,
                    quantized: bool = False, detector_int8: bool = False,
                    calib_images=None,
                    label_allow=None, label_deny=None,
                    max_results: int = -1, **kw):
    """Substring dispatch like deepdish.py:482-502. When `model_name` is an
    existing weight file (.tflite/.h5/.npz) the pre-trained weights are
    converted on load (models/convert.py) — the TPU-native replacement for
    the reference's interpreter-based consumption. A weight file that fails
    to convert raises (the reference fails loudly too when the interpreter
    rejects a file); pass allow_random_weights=True (CLI:
    --allow-random-weights) to fall back to random-init instead."""
    name = (model_name or "ssd_mobilenet").lower()
    if "scripted" in name:
        key = name.split("scripted:", 1)[1] if "scripted:" in name else None
        script = SCRIPTS.get(key) if key is not None else \
            (next(iter(SCRIPTS.values())) if SCRIPTS else None)
        if script is None:
            raise ValueError(f"no registered script for model {model_name!r}"
                             " (use models.registry.register_script)")
        return ScriptedDetector(script, wanted_labels=wanted_labels)
    if quantized:
        # --quantized-inference: run the full-integer artifact on the
        # INTEGER datapath (models/qgraph.py) — the interpreter's own
        # arithmetic on the MXU's int8 path — instead of dequantizing the
        # weights to float. SSD/EdgeTPU-family .tflite files only.
        if not (model_name and os.path.isfile(model_name)
                and name.endswith(".tflite")):
            raise ValueError(
                "--quantized-inference needs an existing full-integer "
                f".tflite artifact; got {model_name!r}")
        if "yolov5" in name:
            from .qgraph import QuantizedYOLOv5Detector
            det = QuantizedYOLOv5Detector(
                model_name, max_outputs=max_outputs,
                score_threshold=max(score_threshold, 0.25))
            det.labels = {i: n for i, n in enumerate(load_labels(label_file))}
            det.label_offset = 0
            return det
        is_ssd = "ssd" in name or "mobilenet" in name or "edgetpu" in name
        is_effdet = not is_ssd       # the generic-TFLite family dispatch
        if "yolo" in name:
            raise NotImplementedError(
                "--quantized-inference currently supports the SSD/EdgeTPU, "
                f"EfficientDet and YOLOv5 families (got {model_name!r}); "
                "the float converter handles YOLOv3 artifacts")
        from . import convert as cvm
        from .qgraph import QuantizedSSDDetector
        det_kw = dict(score_threshold=score_threshold,
                      family="efficientdet" if is_effdet else "ssd",
                      label_allow=label_allow, label_deny=label_deny,
                      max_results=max_results)
        pp = cvm.read_tflite_postprocess(model_name)
        if pp is not None:
            # the quantized decode works in normalized units for both
            # families, so the op's normalized anchors pass unscaled;
            # num_classes drives the background-column rule
            det_kw.update(_pp_det_kw(pp, score_threshold),
                          pp_num_classes=pp.num_classes)
        det = QuantizedSSDDetector(model_name, max_outputs=max_outputs,
                                   **det_kw)
        labels = None
        if is_effdet:
            try:                     # packed metadata labels, like the
                from .tflite_meta import read_metadata      # float branch
                labels = read_metadata(model_name).get("labels")
            except Exception:
                pass
        det.labels = {i: n for i, n in
                      enumerate(labels or load_labels(label_file))}
        det.label_offset = 0
        det.finalize_label_filter()
        return det
    extras = {}
    if params is None and model_name and os.path.isfile(model_name):
        # 'edgetpu' names are Coral SSD exports (deepdish.py:483-485), so
        # they count as SSD here and in the dispatch below.
        family = ("yolov5" if "yolov5" in name else
                  "yolov3" if "yolo" in name else
                  "efficientdet" if ("efficientdet" in name
                                     or ("tflite" in name
                                         and "ssd" not in name
                                         and "mobilenet" not in name
                                         and "edgetpu" not in name)) else
                  "ssd")
        try:
            params, extras = _load_real_weights(model_name, family)
        except Exception as e:
            if not allow_random_weights:
                raise ValueError(
                    f"weight conversion failed for {model_name} (inferred "
                    f"family {family!r}): {e}. If the family is wrong, "
                    "rename the file or convert offline with `python -m "
                    "deepdish_tpu.models.convert --family ...`; pass "
                    "--allow-random-weights to run without pre-trained "
                    "weights.") from e
            print(f"weight conversion failed for {model_name} ({e}); "
                  "running with random-init weights")
            params = None
        if params is None:
            # the file exists but no converter recognizes it (e.g. a .pb,
            # or an .h5 for a non-yolov3 family) — same fail-loudly
            # contract as a conversion error
            if not allow_random_weights:
                raise ValueError(
                    f"{model_name} is not a loadable weight artifact for "
                    f"inferred family {family!r} (supported: .tflite, "
                    ".npz, yolov3 .h5). Convert offline with `python -m "
                    "deepdish_tpu.models.convert` or pass "
                    "--allow-random-weights to run without pre-trained "
                    "weights.")
            print(f"{model_name} not recognized as a weight artifact; "
                  "running with random-init weights")
    if params is None and model_name and os.path.isdir(model_name) \
            and "saved_model" not in name and not allow_random_weights:
        raise ValueError(
            f"{model_name} is a directory; SavedModel directories are "
            "selected by the 'saved_model' substring (deepdish.py:489) — "
            "rename the path or pass --allow-random-weights to run "
            "without pre-trained weights.")
    pp = extras.get("postprocess")
    if "saved_model" in name and model_name and os.path.isdir(model_name):
        # SavedModel DIRECTORY (deepdish.py:489 'saved_model' substring):
        # TF-OD SSD and faster_rcnn_resnet_v1 exports convert to native TPU
        # detectors via their variables checkpoint; anything else (an
        # arbitrary SavedModel) falls back to the gated host executor,
        # which feeds the fused encode/track programs like a scripted
        # detector (tools/saved_model.py:9-103).
        from . import convert as cvm
        try:
            ssd_params, _rep = cvm.load_ssd_saved_model(model_name)
        except Exception as ssd_err:
            try:
                frcnn_params, rep = \
                    cvm.load_faster_rcnn_saved_model(model_name)
            except Exception as e:
                print(f"SavedModel dir is neither a TF-OD SSD export "
                      f"({ssd_err}) nor a faster_rcnn_resnet_v1 export "
                      f"({e}); using the host SavedModel executor")
                from .saved_model import SavedModelDetector
                return SavedModelDetector(model_name, label_file=label_file,
                                          wanted_labels=wanted_labels,
                                          score_threshold=score_threshold)
            from .faster_rcnn import FasterRCNNDetector
            det = FasterRCNNDetector(params=frcnn_params,
                                     config=rep["config"],
                                     max_outputs=max_outputs,
                                     score_threshold=score_threshold)
            det.labels = _detection_labels(label_file)
            det.label_offset = 0
            return det
        det = SSDMobileNetDetector(params=ssd_params,
                                   max_outputs=max_outputs,
                                   score_threshold=score_threshold)
        det.labels = {i: n for i, n in enumerate(load_labels(label_file))}
        det.label_offset = 0
        return det
    if "faster_rcnn" in name or "frcnn" in name:
        # native two-stage family (reference: tools/saved_model.py via the
        # default faster_rcnn_resnet101 artifact); weights from an .npz
        # saved by models.weights or the SavedModel-dir branch above
        from .faster_rcnn import FasterRCNNDetector
        det = FasterRCNNDetector(params=params, max_outputs=max_outputs,
                                 score_threshold=score_threshold)
        det.labels = _detection_labels(label_file)
        det.label_offset = 0
        return det
    if "yolov5" in name:
        det = YOLOv5Detector(params=params, max_outputs=max_outputs,
                             score_threshold=max(score_threshold, 0.25))
        det.labels = {i: n for i, n in enumerate(load_labels(label_file))}
        det.label_offset = 0
        return det
    if "yolo" in name:  # yolov3 / yolo.h5 family (deepdish.py:486-487)
        det = YOLOv3Detector(params=params, max_outputs=max_outputs,
                             score_threshold=score_threshold)
        det.labels = {i: n for i, n in enumerate(load_labels(label_file))}
        det.label_offset = 0
        return det
    if "efficientdet" in name or (name.endswith(".tflite")
                                  and "ssd" not in name
                                  and "mobilenet" not in name
                                  and "edgetpu" not in name):
        # metadata-driven configuration like the reference's generic TFLite
        # detector (tools/tflite_object_detector.py:117-137): normalization
        # mean/std and packed labels come from the flatbuffer when present
        meta = {"mean": (127.0,), "std": (128.0,), "labels": None}
        if model_name and os.path.exists(model_name) \
                and model_name.endswith(".tflite"):
            try:
                from .tflite_meta import read_metadata
                meta.update(read_metadata(model_name))
            except Exception as e:
                print(f"tflite metadata unavailable ({e}); using defaults")
        det_kw = dict(score_threshold=score_threshold,
                      label_allow=label_allow, label_deny=label_deny,
                      max_results=max_results)
        if pp is not None:
            # the float EfficientDet decode works in pixels, so the op's
            # normalized anchors are scaled by the model input size
            from .efficientdet import INPUT_SIZE as _EDET_SIZE
            det_kw.update(_pp_det_kw(pp, score_threshold,
                                     anchor_scale=float(_EDET_SIZE)))
        det = EfficientDetLite0Detector(params=params,
                                        max_outputs=max_outputs,
                                        norm_mean=meta["mean"],
                                        norm_std=meta["std"],
                                        **det_kw)
        labels = (meta["labels"] if meta.get("labels")
                  else load_labels(label_file))
        det.labels = {i: n for i, n in enumerate(labels)}
        det.label_offset = 0
        det.finalize_label_filter()
        return det
    if "ssd" in name or "mobilenet" in name or "edgetpu" in name:
        det_kw = dict(score_threshold=score_threshold)
        if pp is not None:
            # (the op's fast NMS is class-agnostic; the pipeline's own
            # class-agnostic NMS, deepdish.py:995, covers that stage)
            det_kw.update(_pp_det_kw(pp, score_threshold))
        if detector_int8 or (not (model_name
                                  and os.path.isfile(model_name))
                             and "int8" in name):
            # --detector-int8 / `--model ssd_mobilenet_int8`: the fast
            # w8a8 throughput mode (models/ssd_q.py) — post-training
            # quantizes whatever float tree was produced (incl. converted
            # real detect.tflite weights) onto the MXU's 2x int8 path.
            # Distinct from --quantized-inference (byte-exact qgraph).
            from .ssd_q import SSDMobileNetInt8Detector
            # activation scales come from calib_images when supplied
            # (CLI: --detector-calibration-frames), else the synthetic
            # default_calibration_images set (ADVICE r4: synthetic-only
            # calibration is now an explicit, overridable choice)
            det = SSDMobileNetInt8Detector(params=params,
                                           max_outputs=max_outputs,
                                           calib_images=calib_images,
                                           **det_kw)
        else:
            det = SSDMobileNetDetector(params=params,
                                       max_outputs=max_outputs, **det_kw)
        # +1 labelmap offset applied by the reference adaptor
        # (ssd_mobilenet.py:143-145); our COCO_LABELS is already offset-free.
        det.labels = {i: n for i, n in enumerate(load_labels(label_file))}
        det.label_offset = 0
        return det
    raise ValueError(f"cannot determine detector backend from {model_name!r}")
