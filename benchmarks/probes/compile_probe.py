"""Diagnostic: compile/run latency of scan variants on the attached TPU."""
import time

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp

log(f"devices={jax.devices()}")


def body(c, x):
    return c + x, c.sum()


xs = jnp.ones((341, 100))
f = jax.jit(lambda xs: jax.lax.scan(body, jnp.zeros(100), xs))
jax.block_until_ready(f(xs))
log("trivial scan 341 compiled+ran")


def body2(c, x):
    return jnp.dot(c, jnp.eye(100, dtype=c.dtype), preferred_element_type=c.dtype) + x, jnp.max(c)


xs2 = jnp.ones((341, 100, 100))
f2 = jax.jit(lambda xs: jax.lax.scan(body2, jnp.zeros((100, 100)), xs2))
jax.block_until_ready(f2(xs2))
log("matmul scan 341 compiled+ran")


def body3(c, x):
    j = jnp.clip(x.astype(jnp.int32), 0, 98)
    v = jnp.take(c, j) * 0.5 + jnp.take(c, j + 1) * 0.5
    return v, v.sum()


xs3 = jnp.ones((341, 100))
f3 = jax.jit(lambda xs: jax.lax.scan(body3, jnp.zeros(100), xs3))
jax.block_until_ready(f3(xs3))
log("gather scan 341 compiled+ran")

# Row gather on [S, G] like the LSMC decision loop
def body4(c, x):
    j = jnp.clip(x.astype(jnp.int32), 0, 98)  # [G]
    v = jnp.take(c, j, axis=1) * 0.5 + jnp.take(c, j + 1, axis=1) * 0.5  # [S, G]
    return v, jnp.mean(v)


xs4 = jnp.ones((341, 100))
f4 = jax.jit(lambda xs: jax.lax.scan(body4, jnp.zeros((1000, 100)), xs4))
jax.block_until_ready(f4(xs4))
log("column gather [S,G] scan 341 compiled+ran")
