"""Test-artifact tooling: append a TFLite_Detection_PostProcess custom op
to a raw-heads .tflite flatbuffer, producing the layout real zoo detector
files ship in (the reference consumes the op's four output ports at
tools/ssd_mobilenet.py:100-127 and tools/tflite_object_detector.py:154-172).

Uses the flatbuffers object API over TF's bundled schema; options are
encoded as a flexbuffer map exactly like the TF-OD export tooling does.
"""
import numpy as np


def append_detection_postprocess(
        blob: bytes, anchors: np.ndarray, *,
        box_shape, score_shape,
        max_detections=10, max_classes_per_detection=1,
        detections_per_class=100, use_regular_nms=True,
        nms_score_threshold=0.4, nms_iou_threshold=0.5,
        num_classes=90, y_scale=10.0, x_scale=10.0,
        h_scale=5.0, w_scale=5.0) -> bytes:
    """Return a new flatbuffer whose outputs are the four postprocess-op
    ports. `box_shape`/`score_shape` identify the existing output tensors
    (e.g. (1, A, 4) and (1, A, num_classes + 1)) to feed the op."""
    import flatbuffers
    from flatbuffers import flexbuffers
    from tensorflow.lite.python import schema_py_generated as fb

    model = fb.ModelT.InitFromPackedBuf(bytearray(blob), 0)
    sg = model.subgraphs[0]
    anchors = np.ascontiguousarray(anchors, np.float32)

    def add_buffer(data):
        b = fb.BufferT()
        b.data = np.frombuffer(data.tobytes(), np.uint8)
        model.buffers.append(b)
        return len(model.buffers) - 1

    def add_tensor(name, shape, buf=0):
        t = fb.TensorT()
        t.name = name.encode()
        t.shape = list(shape)
        t.type = 0                     # FLOAT32
        t.buffer = buf
        sg.tensors.append(t)
        return len(sg.tensors) - 1

    anchor_ti = add_tensor("anchors", anchors.shape, add_buffer(anchors))
    M = max_detections
    outs = [add_tensor("TFLite_Detection_PostProcess", (1, M, 4)),
            add_tensor("TFLite_Detection_PostProcess:1", (1, M)),
            add_tensor("TFLite_Detection_PostProcess:2", (1, M)),
            add_tensor("TFLite_Detection_PostProcess:3", (1,))]

    oc = fb.OperatorCodeT()
    oc.builtinCode = 32                # CUSTOM
    oc.deprecatedBuiltinCode = 32
    oc.customCode = b"TFLite_Detection_PostProcess"
    model.operatorCodes.append(oc)

    fbb = flexbuffers.Builder()
    with fbb.Map():
        fbb.Int("max_detections", max_detections)
        fbb.Int("max_classes_per_detection", max_classes_per_detection)
        fbb.Int("detections_per_class", detections_per_class)
        fbb.Bool("use_regular_nms", use_regular_nms)
        fbb.Float("nms_score_threshold", nms_score_threshold)
        fbb.Float("nms_iou_threshold", nms_iou_threshold)
        fbb.Int("num_classes", num_classes)
        fbb.Float("y_scale", y_scale)
        fbb.Float("x_scale", x_scale)
        fbb.Float("h_scale", h_scale)
        fbb.Float("w_scale", w_scale)
    opts = bytes(fbb.Finish())

    shapes = {ti: tuple(sg.tensors[ti].shape) for ti in sg.outputs}
    box_ti = [ti for ti in sg.outputs if shapes[ti] == tuple(box_shape)]
    cls_ti = [ti for ti in sg.outputs if shapes[ti] == tuple(score_shape)]
    if len(box_ti) != 1 or len(cls_ti) != 1:
        raise ValueError(f"could not identify box/score outputs in {shapes}")

    op = fb.OperatorT()
    op.opcodeIndex = len(model.operatorCodes) - 1
    op.inputs = [box_ti[0], cls_ti[0], anchor_ti]
    op.outputs = outs
    op.customOptions = np.frombuffer(opts, np.uint8)
    sg.operators.append(op)
    sg.outputs = outs

    b = flatbuffers.Builder(1024)
    b.Finish(model.Pack(b), b"TFL3")
    return bytes(b.Output())
