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


def _legacy_model_scaffold():
    """Fresh (model, subgraph, helpers) for hand-authoring legacy uint8
    flatbuffers: add_buffer / add_tensor / opcode closures bound to the
    model under construction."""
    from tensorflow.lite.python import schema_py_generated as fb

    model = fb.ModelT()
    model.version = 3
    model.buffers = [fb.BufferT()]                 # buffer 0: empty
    sg = fb.SubGraphT()
    sg.tensors = []
    sg.operators = []
    model.subgraphs = [sg]
    model.operatorCodes = []

    def add_buffer(arr):
        b = fb.BufferT()
        b.data = np.frombuffer(np.ascontiguousarray(arr).tobytes(),
                               np.uint8)
        model.buffers.append(b)
        return len(model.buffers) - 1

    def add_tensor(name, shape, ttype, scale, zp, buf=0):
        t = fb.TensorT()
        t.name = name.encode()
        t.shape = list(shape)
        t.type = ttype
        t.buffer = buf
        q = fb.QuantizationParametersT()
        q.scale = [float(scale)]
        q.zeroPoint = [int(zp)]
        t.quantization = q
        sg.tensors.append(t)
        return len(sg.tensors) - 1

    def opcode(code):
        for i, oc in enumerate(model.operatorCodes):
            if oc.builtinCode == code:
                return i
        oc = fb.OperatorCodeT()
        oc.builtinCode = code
        oc.deprecatedBuiltinCode = code
        oc.version = 1
        model.operatorCodes.append(oc)
        return len(model.operatorCodes) - 1

    def add_conv(rng, xt, cin, cout, dw, s_out, name, fused=3,
                 spatial=(8, 8)):
        kshape = (1, 3, 3, cin) if dw else (cout, 3, 3, cin)
        w = rng.randint(0, 256, kshape).astype(np.uint8)
        wt = add_tensor(f"{name}/w", kshape, 3, 0.02, 127, add_buffer(w))
        s_i = float(sg.tensors[xt].quantization.scale[0])
        bias = rng.randint(-2000, 2000, cout).astype(np.int32)
        bt = add_tensor(f"{name}/b", (cout,), 2, s_i * 0.02, 0,
                        add_buffer(bias))
        ot = add_tensor(f"{name}/out", (1, *spatial, cout), 3, s_out, 128)
        op = fb.OperatorT()
        op.opcodeIndex = opcode(4 if dw else 3)
        op.inputs = [xt, wt, bt]
        op.outputs = [ot]
        if dw:
            o = fb.DepthwiseConv2DOptionsT()
            o.depthMultiplier = 1
            op.builtinOptionsType = 2      # BuiltinOptions.DepthwiseConv2DOptions
        else:
            o = fb.Conv2DOptionsT()
            op.builtinOptionsType = 1      # BuiltinOptions.Conv2DOptions
        o.padding = 0                      # SAME
        o.strideW = o.strideH = 1
        o.fusedActivationFunction = fused
        o.dilationWFactor = o.dilationHFactor = 1
        op.builtinOptions = o
        sg.operators.append(op)
        return ot

    def finish():
        import flatbuffers
        builder = flatbuffers.Builder(1024)
        builder.Finish(model.Pack(builder), b"TFL3")
        return bytes(builder.Output())

    return fb, model, sg, add_buffer, add_tensor, opcode, add_conv, finish


def build_legacy_uint8_model(seed: int = 3) -> bytes:
    """Author, from scratch, a flatbuffer in the LEGACY full-uint8 format
    of the original zoo artifacts (detectors/coco/detect.tflite,
    ssd_mobilenet_v*_coco_quant_postprocess: per-TENSOR uint8 weights with
    a weight zero point, uint8 activations, int32 biases) — the
    quantization scheme pre-TF2 converters emitted and tf.lite can no
    longer produce, so the wire format is written by hand here. Graph:
    uint8 input -> CONV(relu6) -> DEPTHWISE_CONV(relu6) -> CONV -> uint8
    output."""
    rng = np.random.RandomState(seed)
    (fb, model, sg, add_buffer, add_tensor,
     opcode, add_conv, finish) = _legacy_model_scaffold()
    x_t = add_tensor("input", (1, 8, 8, 3), 3, 0.0078125, 128)
    h1 = add_conv(rng, x_t, 3, 8, False, 0.03, "conv0")
    h2 = add_conv(rng, h1, 8, 8, True, 0.025, "dw1")
    h3 = add_conv(rng, h2, 8, 4, False, 0.05, "conv2", fused=0)
    sg.inputs = [x_t]
    sg.outputs = [h3]
    return finish()


def build_legacy_uint8_detector(seed: int = 5, num_anchors: int = 64,
                                num_cols: int = 7) -> bytes:
    """A legacy full-uint8 RAW-HEADS detector artifact: the conv stack of
    build_legacy_uint8_model extended with uint8 box/class head convs
    RESHAPEd to (1, A, 4) box encodings and (1, A, num_cols) class
    logits — the tensor contract the SSD decode consumes. Everything
    stays uint8 (per-tensor, nonzero weight zero points) end to end."""
    rng = np.random.RandomState(seed)
    (fb, model, sg, add_buffer, add_tensor,
     opcode, add_conv, finish) = _legacy_model_scaffold()

    def reshape(xt, shape, name):
        st = add_tensor(f"{name}/shape", (len(shape),), 2, 1.0, 0,
                        add_buffer(np.asarray(shape, np.int32)))
        q = sg.tensors[xt].quantization
        ot = add_tensor(f"{name}/out", shape, 3, q.scale[0], q.zeroPoint[0])
        op = fb.OperatorT()
        op.opcodeIndex = opcode(22)
        op.inputs = [xt, st]
        op.outputs = [ot]
        o = fb.ReshapeOptionsT()
        o.newShape = list(shape)
        op.builtinOptionsType = 17     # BuiltinOptions.ReshapeOptions
        op.builtinOptions = o
        sg.operators.append(op)
        return ot

    x_t = add_tensor("input", (1, 8, 8, 3), 3, 0.0078125, 128)
    trunk = add_conv(rng, x_t, 3, 8, False, 0.03, "conv0")
    na = num_anchors // 64             # anchors per cell on the 8x8 grid
    box = add_conv(rng, trunk, 8, na * 4, False, 0.04, "box_head", fused=0)
    cls = add_conv(rng, trunk, 8, na * num_cols, False, 0.05, "cls_head",
                   fused=0)
    box_r = reshape(box, (1, num_anchors, 4), "box")
    cls_r = reshape(cls, (1, num_anchors, num_cols), "cls")
    sg.inputs = [x_t]
    sg.outputs = [box_r, cls_r]
    return finish()
