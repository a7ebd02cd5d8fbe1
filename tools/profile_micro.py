"""Micro-benchmarks for the slow components: detector conv types, MARS
activation/dtype variants, tracker-step internals, LSAP solvers, argsort.

Usage: python tools_profile_micro.py [--reps 9] [--only ssd,mars,trk]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import med_time


def bench(label, fn, *args, reps=32):
    """Relay-safe pipelined timing (tools/_timing.py), labeled print."""
    t, _ = med_time(fn, *args, reps=reps)
    print(f"  {label:44s} {1000 * t:8.3f} ms")
    return t


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 32
    only = (sys.argv[sys.argv.index("--only") + 1].split(",")
            if "--only" in sys.argv else ["ssd", "mars", "trk"])

    F = 32
    key = jax.random.PRNGKey(0)

    if "ssd" in only:
        print("SSD detector pieces (batch 32, 300x300):")
        x300 = jax.device_put(np.random.RandomState(0).randint(
            0, 255, (F, 300, 300, 3)).astype(np.uint8))

        class DWStack(nn.Module):
            regular: bool = False
            @nn.compact
            def __call__(self, x):
                x = (x.astype(jnp.bfloat16) / 127.5) - 1.0
                x = nn.Conv(32, (3, 3), strides=(2, 2), padding="SAME",
                            use_bias=False)(x)
                cfg = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1),
                       (512, 2), (512, 1), (512, 1), (512, 1), (512, 1),
                       (512, 1), (1024, 2), (1024, 1)]
                for c, s in cfg:
                    cin = x.shape[-1]
                    g = 1 if self.regular else cin
                    x = nn.Conv(cin, (3, 3), strides=(s, s), padding="SAME",
                                feature_group_count=g, use_bias=False)(x)
                    x = nn.relu6(x)
                    x = nn.Conv(c, (1, 1), use_bias=False)(x)
                    x = nn.relu6(x)
                return x

        for name, mod in [("depthwise backbone", DWStack(False)),
                          ("regular-conv backbone", DWStack(True))]:
            p = mod.init(key, jnp.zeros((1, 300, 300, 3), jnp.uint8))
            f = jax.jit(lambda p, x, m=mod: m.apply(p, x))
            bench(name, f, p, x300, reps=reps)

        from deepdish_tpu.models import create_detector
        det = create_detector("ssd_mobilenet", max_outputs=32)

        @jax.jit
        def net_only(params, imgs):
            return jax.vmap(lambda im: det.net.apply(params, im))(imgs)
        @jax.jit
        def full_det(params, imgs):
            return jax.vmap(lambda im: det.detect(
                params, im, jnp.float32(1280), jnp.float32(720)))(imgs)
        r300 = x300.astype(jnp.float32)
        bench("ssd net fwd (vmap F)", net_only, det.params, r300, reps=reps)
        bench("ssd full detect (vmap F)", full_det, det.params, r300,
              reps=reps)

    if "mars" in only:
        print("MARS variants (batch 1024, 128x64):")
        from deepdish_tpu.models.mars import MarsNet
        patches = jax.device_put(np.random.RandomState(0).randint(
            0, 255, (1024, 128, 64, 3)).astype(np.float32))
        for label, dtype in [("bf16", jnp.bfloat16), ("f32", jnp.float32)]:
            net = MarsNet(compute_dtype=dtype)
            p = net.init(key, jnp.zeros((1, 128, 64, 3)))
            f = jax.jit(lambda p, x, n=net: n.apply(p, x))
            bench(f"mars {label} elu", f, p, patches, reps=reps)

        class MarsRelu(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = x.astype(jnp.bfloat16)
                x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False)(x)
                x = nn.relu(x)
                x = nn.Conv(32, (3, 3), padding="SAME", use_bias=False)(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
                for feats, inc in [(32, False), (32, False), (32, True),
                                   (64, False), (64, True), (128, False)]:
                    n = feats * (2 if inc else 1)
                    s = 2 if inc else 1
                    y = nn.Conv(n, (3, 3), strides=(s, s),
                                padding="SAME", use_bias=False)(x)
                    y = nn.relu(y)
                    y = nn.Conv(n, (3, 3), padding="SAME")(y)
                    if inc:
                        x = nn.Conv(n, (1, 1), strides=(2, 2),
                                    use_bias=False)(x) + y
                    else:
                        x = x + y
                x = x.reshape((x.shape[0], -1))
                x = nn.Dense(128, use_bias=False)(x)
                return x
        net = MarsRelu()
        p = net.init(key, jnp.zeros((1, 128, 64, 3)))
        f = jax.jit(lambda p, x: net.apply(p, x))
        bench("mars-shape bf16 relu (no BN/elu)", f, p, patches, reps=reps)

    if "trk" in only:
        print("tracker internals (T=64, D=32):")
        from deepdish_tpu import tracker as tt
        from deepdish_tpu.ops.assignment import solve_lsap
        from deepdish_tpu.ops.assignment_pallas import solve_lsap_pallas
        from deepdish_tpu.ops import kalman
        from deepdish_tpu.tracker.matching import (iou_stage,
                                                   matching_cascade)

        cfg = tt.TrackerConfig(max_tracks=64, max_detections=32,
                               gallery_size=64, num_labels=4)
        rng = np.random.RandomState(0)
        cost = jax.device_put(rng.rand(64, 64).astype(np.float32))
        n64 = jnp.int32(64)
        bench("lsap xla 64x64", jax.jit(solve_lsap), cost, n64, n64,
              reps=reps)
        bench("lsap pallas 64x64", jax.jit(solve_lsap_pallas), cost, n64,
              n64, reps=reps)
        v = jax.device_put(rng.rand(64).astype(np.float32))
        bench("argsort(64)", jax.jit(jnp.argsort), v, reps=reps)
        mean = jax.device_put(rng.rand(64, 8).astype(np.float32))
        cov = jax.device_put(
            np.tile(np.eye(8, dtype=np.float32), (64, 1, 1)))
        meas = jax.device_put(rng.rand(32, 4).astype(np.float32))
        bench("kalman predict_v", jax.jit(kalman.predict_v), mean, cov,
              reps=reps)
        bench("kalman gating_v", jax.jit(kalman.gating_distance_v), mean,
              cov, meas, reps=reps)
        upd = jax.jit(lambda m, c, z: kalman.update_v(m, c, z))
        z64 = jax.device_put(rng.rand(64, 4).astype(np.float32))
        bench("kalman update_v", upd, mean, cov, z64, reps=reps)

        table = tt.create_table(cfg)
        dets = tt.Detections(
            tlwh=jnp.asarray(rng.rand(32, 4).astype(np.float32) * 200),
            confidence=jnp.ones((32,), jnp.float32),
            label=jnp.zeros((32,), jnp.int32),
            feature=jnp.asarray(rng.rand(32, 128).astype(np.float32)),
            valid=jnp.ones((32,), bool))
        step = jax.jit(lambda t, d: tt.step(cfg, t, d))
        t_empty = bench("tt.step (empty table)", step, table, dets,
                        reps=reps)
        table2, _ = step(table, dets)
        table3, _ = step(table2, dets)
        bench("tt.step (32 live tracks)", step, table3, dets, reps=reps)

        @jax.jit
        def scan32(table, dets_seq):
            def body(t, d):
                t, o = tt.step(cfg, t, d)
                return t, o
            return jax.lax.scan(body, table, dets_seq)
        dets_seq = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (32,) + x.shape), dets)
        bench("scan of 32 tt.steps", scan32, table3, dets_seq, reps=reps)


if __name__ == "__main__":
    main()
