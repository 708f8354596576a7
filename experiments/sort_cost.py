"""Reorder-sort strategies at 2M rays: multi-operand lax.sort (current)
vs (key,idx) sort + ONE packed-row gather.

XLA TPU gathers cost per ROW, nearly independent of row width (measured
14.8 ms for a 1-wide gather vs 3.7 ms for 24-wide rows at 2M indices),
so gathering the whole payload as one (R,16) row table after a 2-column
sort may beat carrying 15 columns through the sort network.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp, numpy as np

R = 2073600


def sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0].ravel()[:4].astype(jnp.float32)))


def bench(label, f, *args, reps=5):
    r = f(*args); sync(r)
    best = 1e9
    for _ in range(reps):
        t0 = time.time(); r = f(*args); sync(r)
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 2**32, R, dtype=np.uint32))
    cols = [jnp.asarray(rng.random(R, dtype=np.float32)) for _ in range(13)]
    orig = jnp.arange(R, dtype=jnp.int32)

    def multi(key, *cols):
        s = jax.lax.sort((key,) + cols, num_keys=1)
        return s[1]

    def packed(key, *cols):
        _, idx = jax.lax.sort((key, jnp.arange(R, dtype=jnp.int32)),
                              num_keys=1)
        tbl = jnp.stack(cols, axis=1)          # (R, 13) pack
        rows = tbl[idx]                        # one row gather
        return rows[:, 0]

    def packed_pre(key, tbl):
        # pack built incrementally by the producer (cost excluded):
        _, idx = jax.lax.sort((key, jnp.arange(R, dtype=jnp.int32)),
                              num_keys=1)
        rows = tbl[idx]
        return rows[:, 0]

    bench("multi-operand sort (14 cols)", jax.jit(multi), key, *cols, orig)
    bench("2-col sort + pack + row-gather", jax.jit(packed), key, *cols)
    tbl = jnp.stack(cols, axis=1)
    bench("2-col sort + row-gather (pre-packed)", jax.jit(packed_pre),
          key, tbl)
    bench("2-col sort alone",
          jax.jit(lambda k: jax.lax.sort(
              (k, jnp.arange(R, dtype=jnp.int32)), num_keys=1)[1]), key)


if __name__ == "__main__":
    main()
