import time, sys

T0 = time.time()


def log(m):
    print(f"[{time.time()-T0:6.1f}s] {m}", flush=True)


sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

log(f"devices={jax.devices()}")

import importlib.util

spec_ = importlib.util.spec_from_file_location("__graft_entry__", "/root/repo/__graft_entry__.py")
ge = importlib.util.module_from_spec(spec_)
spec_.loader.exec_module(ge)

# backward_scan on moderate shapes
from storage_tpu.engines.lsmc import backward_scan, _pipeline_jit, device_inputs
from storage_tpu.ops.ratchets import INTERP_LINEAR

spec, G, args = ge._flagship_inputs(num_sims=1000, num_grid=100, num_steps=341, dtype=jnp.float32)
log("inputs built")
out = backward_scan(
    *args, spec=spec, interp_kind=INTERP_LINEAR, num_grid_points=G, extra_decisions=0
)
jax.block_until_ready(out)
log("backward_scan 341x1000x100 compiled+ran")
t0 = time.time()
out = backward_scan(
    *args, spec=spec, interp_kind=INTERP_LINEAR, num_grid_points=G, extra_decisions=0
)
jax.block_until_ready(out)
log(f"backward_scan second run {time.time()-t0:.3f}s")
