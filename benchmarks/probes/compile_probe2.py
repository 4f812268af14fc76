import time

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


import jax
import jax.numpy as jnp

log(f"devices={jax.devices()}")

a = jnp.ones((100, 100))
f = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=a.dtype))
jax.block_until_ready(f(a))
log("plain matmul 100x100")

b = jnp.ones((1024, 1024))
f = jax.jit(lambda b: jnp.dot(b, b, preferred_element_type=b.dtype))
jax.block_until_ready(f(b))
log("plain matmul 1024x1024")


def body2(c, x):
    return jnp.dot(c, x, preferred_element_type=c.dtype), jnp.max(c)


xs2 = jnp.ones((5, 100, 100))
f2 = jax.jit(lambda xs: jax.lax.scan(body2, jnp.zeros((100, 100)), xs))
jax.block_until_ready(f2(xs2))
log("matmul scan length 5")

xs3 = jnp.ones((341, 100, 100))
f3 = jax.jit(lambda xs: jax.lax.scan(body2, jnp.zeros((100, 100)), xs))
jax.block_until_ready(f3(xs3))
log("matmul scan length 341")
