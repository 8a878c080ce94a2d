"""Reproduce the 400s lowering stall: is it hamming_distance_matrix itself,
the module-level device constant, or vmap interaction?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
which = sys.argv[1]

B, N, W = 8, 256, 8
rng = np.random.default_rng(0)
words = jnp.asarray(rng.integers(0, 2**32, (B, N, W), dtype=np.uint32))
valid = jnp.asarray(np.ones((B, N), bool))


def run(name, fn, *args):
    t0 = time.perf_counter()
    jax.jit(fn).lower(*args)
    print(f"{name}: lower {time.perf_counter()-t0:.2f}s", flush=True)


if which == "distmat":
    from feature_detector_tpu.match.hamming import hamming_distance_matrix
    run("distmat (vmap)", jax.vmap(hamming_distance_matrix), words, words, valid, valid)
elif which == "distmat_novmap":
    from feature_detector_tpu.match.hamming import hamming_distance_matrix
    run("distmat (no vmap)", hamming_distance_matrix, words[0], words[0], valid[0], valid[0])
elif which == "bigconst":
    big = jnp.int32(1 << 20)
    t0 = time.perf_counter()
    v = int(big)
    print(f"fetch scalar: {time.perf_counter()-t0:.2f}s", flush=True)
    run("where-with-device-const", lambda v_: jnp.where(v_, jnp.int32(0), big), valid)
elif which == "inline":
    # distmat re-written with a PYTHON int sentinel instead of the
    # module-level device constant.
    def unpack(w):
        n, ww = w.shape
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (w[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
        return (bits.reshape(n, 32 * ww).astype(jnp.float32) * 2.0 - 1.0).astype(jnp.bfloat16)

    def dm(wa, wb, va, vb):
        length = 32 * wa.shape[-1]
        a, b = unpack(wa), unpack(wb)
        dot = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        d = ((length - dot) * 0.5).astype(jnp.int32)
        return jnp.where(va[:, None] & vb[None, :], d, 1 << 20)

    run("inline distmat (vmap)", jax.vmap(dm), words, words, valid, valid)
