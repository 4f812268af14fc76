"""Characterise the cumulative-flux zeroing on the axon backend.

Repeated identical scans; report the checksum each call.  If a global counter
wraps at ~2^31 processed carry-elements, calls start returning zeros at a
predictable index.
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

S, G, L = 100_000, 100, 50  # carry 1e7 elements, 5e8 per call


def body(c, x):
    return c * 0.9999 + x, None


@jax.jit
def run(v0, xs):
    v, _ = jax.lax.scan(body, v0, xs)
    return v


v0 = jnp.ones((S, G), jnp.float32)
xs = jnp.full((L, 1, 1), 0.0001, jnp.float32) * jnp.ones((1, S, G), jnp.float32)[None, 0:1]
# keep xs small: broadcast a [L,1,1] through the body instead
xs = jnp.full((L, 1, 1), 0.0001, jnp.float32)

for i in range(10):
    v = run(v0, xs)
    vn = float(jnp.mean(v))
    print(f"call {i}: mean={vn:.6f} zeros={float(jnp.mean((v == 0).astype(jnp.float32))):.4f}",
          flush=True)

# After the wrap: does a plain elementwise op still work?
w = jnp.ones((1000,), jnp.float32) * 3.0
print("post-wrap elementwise sum:", float(w.sum()), flush=True)
# And a small scan?
v_small = run(jnp.ones((100, 10), jnp.float32), xs)
print("post-wrap small scan mean:", float(jnp.mean(v_small)), flush=True)
