"""Measure while_loop per-iteration cost at renderer-like shapes on TPU."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp

def bench(P, iters, gather_n=4913, label=""):
    table = jnp.arange(gather_n * 8, dtype=jnp.float32).reshape(gather_n, 8)
    x0 = jnp.zeros((P, 128), jnp.float32)
    idx0 = jnp.zeros((P,), jnp.int32)

    @jax.jit
    def f(x, idx):
        def cond(s):
            return s[0] < iters
        def body(s):
            i, x, idx = s
            row = table[idx]                      # [P,8] gather
            x = x + row[:, :1] * 1e-9 + jnp.minimum(x, 1.0) * 1e-9
            idx = (idx + 1) % gather_n
            return i + 1, x, idx
        _, x, idx = jax.lax.while_loop(cond, body, (jnp.int32(0), x, idx0))
        return x
    r = f(x0, idx0); _ = float(r[0,0])
    best = 1e9
    for _ in range(3):
        t0 = time.time(); r = f(x0, idx0); _ = float(r[0,0])
        best = min(best, time.time()-t0)
    print(f"{label} P={P} iters={iters}: {best*1000:.1f} ms total, {best/iters*1e6:.1f} us/iter")

for P in [1152, 16384]:
    for iters in [300, 3000]:
        bench(P, iters)
