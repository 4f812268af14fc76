"""Isolate 100k-sims ops: mean over big axis, take, argmax."""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

S, G = 100_000, 100
rng = np.random.default_rng(0)
v_np = (rng.standard_normal((S, G)) * 1000 + 75000).astype(np.float32)
v = jnp.asarray(v_np)

m = jnp.mean(v, axis=0)
print("mean(v, axis=0)[:4] =", np.asarray(m)[:4], "expected ~", v_np.mean(axis=0)[:4], flush=True)

m2 = jax.jit(lambda v: jnp.mean(v, axis=0))(v)
print("jit mean[:4] =", np.asarray(m2)[:4], flush=True)

t = jnp.take(v, jnp.asarray(48), axis=1)
print("take col48 mean =", float(t.mean()), "expected", v_np[:, 48].mean(), flush=True)


# Inside a jitted composite like _current_period_step
def f(v):
    cont_mean = jnp.mean(v, axis=0)
    j = jnp.asarray(48)
    w = jnp.asarray(0.7, v.dtype)
    fitted = jnp.take(cont_mean, j) * (1 - w) + jnp.take(cont_mean, j + 1) * w
    actual = jnp.take(v, j, axis=1) * (1 - w) + jnp.take(v, j + 1, axis=1) * w
    return fitted, jnp.mean(actual)


fitted, actual_mean = jax.jit(f)(v)
print("composite fitted =", float(fitted), "actual_mean =", float(actual_mean), flush=True)

# Now with v produced BY a scan in the same program
def g(v0, xs):
    def body(c, x):
        return c * 0.999 + x, None

    v_out, _ = jax.lax.scan(body, v0, xs)
    return f(v_out)


xs = jnp.ones((50, S, G), jnp.float32) * 0.01
# 50*100k*100 = 5e8 elements in xs — keep modest
fitted2, am2 = jax.jit(g)(v, xs)
print("scan-then-step0 fitted =", float(fitted2), "actual_mean =", float(am2), flush=True)
