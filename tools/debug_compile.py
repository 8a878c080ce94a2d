"""Isolate the pathological TPU compile time of the vmapped Hamming matcher
(BENCH_r01: 698 s) by timing the compilation of each sub-construct."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from feature_detector_tpu.core.config import MatcherOptions
from feature_detector_tpu.match.hamming import match_hamming, hamming_distance_matrix, _unpack_pm1, _BIG

B, N, W = 8, 256, 8
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, (B, N, W), dtype=np.uint32))
valid = jnp.asarray(np.ones((B, N), bool))


def timed(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(f"{name}: lower {t1-t0:.2f}s compile {t2-t1:.2f}s", flush=True)
    return compiled


# 1. unpack only
timed("unpack (vmap)", jax.vmap(_unpack_pm1), words)

# 2. distance matrix
timed("distmat (vmap)", jax.vmap(hamming_distance_matrix), words, words, valid, valid)


# 3. argmin + one-hot second best
def argmin_part(wa, va, wb, vb):
    d = hamming_distance_matrix(wa, wb, va, vb)
    best_j = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    nb = d.shape[1]
    is_best = jnp.arange(nb, dtype=jnp.int32)[None, :] == best_j[:, None]
    second = jnp.min(jnp.where(is_best, _BIG, d), axis=1)
    return best, second, best_j


timed("argmin+second (vmap)", jax.vmap(argmin_part), words, valid, words, valid)

# 4. full matcher
opts = MatcherOptions()
timed(
    "full match (vmap)",
    jax.vmap(lambda wa, va, wb, vb: match_hamming(wa, va, wb, vb, opts)),
    words, valid, words, valid,
)
