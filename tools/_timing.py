"""Relay-safe pipelined timing shared by the profiling tools.

Issue `reps` dispatches back-to-back, then FORCE A HOST FETCH of one
element of the last output. On the axon relay a bare block_until_ready can
return before remote completion when the dispatch queue absorbs a short
round (docs/BENCH_NOTES.md "relay timing pitfall"); fetching an element of
the final result (FIFO execution) cannot. The 1-element slice keeps the
(possibly huge) output off the tunnel. Per-dispatch queue overhead
amortizes like the steady-state pipeline. Repeated 3x, median taken.
"""
import time

import numpy as np


def med_time(fn, *args, reps=32):
    import jax
    out = fn(*args)            # compile
    jax.block_until_ready(jax.tree.leaves(out)[0])
    meds = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        meds.append((time.time() - t0) / reps)
    return float(np.median(meds)), out
