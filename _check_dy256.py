import jax, jax.numpy as jnp, jax.random as jr
from bayesianfiltering_tpu.ops import fused_ekf as fe
print("backend:", jax.default_backend())
dx, dy = 512, 256
k = jr.split(jr.PRNGKey(0), 5)
m = jr.normal(k[0], (dx,))
a = jr.normal(k[1], (dx, dx))
P = a @ a.T + dx * jnp.eye(dx)
Hx = jr.normal(k[2], (dy, dx))
b = jr.normal(k[3], (dy, dy))
Rt = b @ b.T * 0.01 + 0.5 * jnp.eye(dy)
innov = jr.normal(k[4], (dy,))
try:
    lowered = jax.jit(lambda *xs: fe._update_pallas(*xs, 0.0)).lower(m, P, Hx, Rt, innov)
    print("lowered ok")
    c = lowered.compile()
    print("compiled ok")
    out = c(m, P, Hx, Rt, innov)
    jax.block_until_ready(out)
    print("ran ok, ll =", float(out[0]))
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:2000])
