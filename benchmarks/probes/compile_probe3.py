import time

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


import numpy as np
import jax
import jax.numpy as jnp

log(f"devices={jax.devices()}")

NPCONST = np.linspace(0.0, 1.0, 5)


def body_npconst(c, x):
    w = jnp.asarray(NPCONST, c.dtype)
    return c + w.sum() * x, c.sum()


f = jax.jit(lambda xs: jax.lax.scan(body_npconst, jnp.zeros(100), xs))
jax.block_until_ready(f(jnp.ones((341, 100))))
log("np-constant in body ok")


def body_arange(c, x):
    w = jnp.arange(1, 11, dtype=c.dtype)
    return c + w.sum() * x, c.sum()


f = jax.jit(lambda xs: jax.lax.scan(body_arange, jnp.zeros(100), xs))
jax.block_until_ready(f(jnp.ones((341, 100))))
log("arange in body ok")


def body_eye(c, x):
    e = jnp.eye(10, dtype=c.dtype)
    return c + e.sum() * x, c.sum()


f = jax.jit(lambda xs: jax.lax.scan(body_eye, jnp.zeros(100), xs))
jax.block_until_ready(f(jnp.ones((341, 100))))
log("eye in body ok")


def body_cho(c, x):
    g = jnp.dot(x.T, x, preferred_element_type=c.dtype) + 0.1 * jnp.eye(10, dtype=c.dtype)
    cho = jax.scipy.linalg.cho_factor(g)
    sol = jax.scipy.linalg.cho_solve(cho, jnp.ones((10,), c.dtype))
    return c + sol.sum(), c.sum()


f = jax.jit(lambda xs: jax.lax.scan(body_cho, jnp.zeros(100), xs))
jax.block_until_ready(f(jnp.ones((341, 20, 10))))
log("cholesky in body ok")
