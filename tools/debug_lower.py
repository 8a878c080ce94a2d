"""Which op pays the ~400s first-lowering penalty on the axon TPU platform?"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

which = sys.argv[1]

a32 = jnp.ones((256, 256), jnp.float32)
abf = jnp.ones((256, 256), jnp.bfloat16)

t0 = time.perf_counter()
if which == "dot_f32":
    jax.jit(lambda x: jnp.dot(x, x.T)).lower(a32)
elif which == "dot_bf16":
    jax.jit(lambda x: jnp.dot(x, x.T, preferred_element_type=jnp.float32)).lower(abf)
elif which == "dot_bf16_plain":
    jax.jit(lambda x: jnp.dot(x, x.T)).lower(abf)
elif which == "add":
    jax.jit(lambda x: x + x).lower(a32)
elif which == "conv":
    x = jnp.ones((1, 1, 64, 64), jnp.float32)
    k = jnp.ones((1, 1, 3, 3), jnp.float32)
    jax.jit(lambda x: jax.lax.conv_general_dilated(x, k, (1, 1), "SAME")).lower(x)
print(f"{which}: lower {time.perf_counter()-t0:.2f}s", flush=True)
