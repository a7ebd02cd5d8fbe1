"""MARS channel-width probe (VERDICT r2 next #4, BENCH_NOTES follow-up).

The device trace shows MARS's 32-output-channel convs cap at ~25% MXU lane
utilization (the MXU tile is 128 wide). This probe measures whether buying
lanes with wasted FLOPs moves wall-clock: it times the stock MarsNet
against variants whose early stages are widened by a multiplier (random
init — timing only; a semantics-preserving zero-pad would produce the same
schedule, so the timing transfers).

Usage: PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/profile_mars_width.py [--batch 256] [--reps 7]
"""
import os
import sys
import time
from typing import Any

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _timing import med_time


def build_variant(stage1: int, stage2: int, stage3: int):
    """MarsNet with configurable stage widths (stock = 32, 64, 128)."""
    import flax.linen as nn
    import jax.numpy as jnp

    from deepdish_tpu.models.mars import FEATURE_DIM, _BN, _ResidualBlock

    class Wide(nn.Module):
        compute_dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, images):
            dt = self.compute_dtype
            x = images.astype(dt)
            x = nn.Conv(stage1, (3, 3), padding="SAME", use_bias=False,
                        dtype=dt, name="conv1_1")(x)
            x = _BN(dtype=dt, name="conv1_1_bn")(x)
            x = nn.elu(x)
            x = nn.Conv(stage1, (3, 3), padding="SAME", use_bias=False,
                        dtype=dt, name="conv1_2")(x)
            x = _BN(dtype=dt, name="conv1_2_bn")(x)
            x = nn.elu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
            x = _ResidualBlock(stage1, is_first=True, dtype=dt,
                               name="conv2_1")(x)
            x = _ResidualBlock(stage1, dtype=dt, name="conv2_3")(x)
            # increase_dim doubles, so land on stage2/stage3 exactly when
            # they are 2x/4x stage1 (the only multipliers probed here).
            x = _ResidualBlock(stage1, increase_dim=True, dtype=dt,
                               name="conv3_1")(x)
            x = _ResidualBlock(stage2, dtype=dt, name="conv3_3")(x)
            x = _ResidualBlock(stage2, increase_dim=True, dtype=dt,
                               name="conv4_1")(x)
            x = _ResidualBlock(stage3, dtype=dt, name="conv4_3")(x)
            x = x.reshape((x.shape[0], -1))
            x = nn.Dense(FEATURE_DIM, use_bias=False, dtype=dt,
                         name="fc1")(x)
            x = _BN(dtype=dt, name="fc1_bn")(x)
            x = nn.elu(x)
            x = _BN(dtype=dt, name="ball")(x)
            x = x.astype(jnp.float32)
            n = jnp.sqrt(1e-8 + jnp.sum(jnp.square(x), axis=1,
                                        keepdims=True))
            return x / n

    return Wide()


def main():
    import jax
    import jax.numpy as jnp

    from deepdish_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 256
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) \
        if "--reps" in sys.argv else 32

    x = jax.device_put(
        np.random.RandomState(0).uniform(
            0, 255, (batch, 128, 64, 3)).astype(np.float32))

    print(f"batch={batch} reps={reps} device={jax.devices()[0]}")
    variants = [
        ("stock 32/64/128", (32, 64, 128)),
        ("pad2  64/128/256", (64, 128, 256)),
        ("pad4  128/256/512", (128, 256, 512)),
    ]
    results = []
    for name, (s1, s2, s3) in variants:
        net = build_variant(s1, s2, s3)
        params = net.init(jax.random.PRNGKey(0), x[:2])
        fwd = jax.jit(lambda p, im: net.apply(p, im))
        t0 = time.time()
        _ = jax.block_until_ready(fwd(params, x))
        compile_s = time.time() - t0
        t, _ = med_time(fwd, params, x, reps=reps)
        us_per_crop = t / batch * 1e6
        results.append((name, t, us_per_crop))
        print(f"{name}: {t*1e3:.2f} ms/batch = {us_per_crop:.2f} us/crop "
              f"(compile {compile_s:.1f}s)")
    base = results[0][1]
    for name, t, _ in results[1:]:
        print(f"{name} vs stock: {t/base:.2f}x wall-clock "
              f"for {'4x' if '4' in name else '2x'}+ FLOPs")


if __name__ == "__main__":
    main()
