import time, sys

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


sys.path.insert(0, "/root/repo")
import jax

d = jax.devices()[0]
log(f"device={d}")
try:
    stats = d.memory_stats()
    log(f"memory_stats: { {k: v/1e9 for k, v in stats.items() if 'bytes' in k} }")
except Exception as e:
    log(f"no memory_stats: {e}")

import jax.numpy as jnp

for gb in (1, 2, 4, 6, 8, 10, 12):
    try:
        n = int(gb * 1e9 / 4)
        x = jnp.ones((n,), jnp.float32)
        jax.block_until_ready(x)
        log(f"allocated {gb} GB ok")
        del x
    except Exception as e:
        log(f"allocated {gb} GB FAILED: {type(e).__name__}")
        break

from bench import run

for sims in (100_000, 50_000):
    try:
        out = run(sims)
        log(f"sims={sims} wall={out['wall']:.3f}s npv={out['npv']:,.0f}")
        break
    except Exception as e:
        log(f"sims={sims} failed {type(e).__name__}: {str(e)[:200]}")
