"""How XLA's TPU lax.sort scales with operand count and size.

If the per-operand cost implies many tens of HBM passes (a full bitonic
network), a merge-path sort (in-VMEM block sort + one-HBM-pass-per-level
merges, ~6-8 passes total) has a real 3-5x win; if XLA is already a few
passes, the sort is at its floor and the direction is closed.

RESULT (TPU v5e, 2026-08-18; each rep pays ~20 ms of tunnel dispatch, so
read the DIFFERENCES):
    sort 2M x 1:  25.33 ms      256k x 12: 23.47 ms
    sort 2M x 2:  26.19 ms      512k x 12: 24.85 ms
    sort 2M x 4:  28.14 ms     1024k x 12: 29.01 ms
    sort 2M x 8:  33.27 ms     2048k x 12: 38.88 ms
    sort 2M x 12: 38.87 ms     2M x 12 pre-sorted: 38.37 ms
Three lessons: (1) XLA's TPU sort is DATA-OBLIVIOUS — pre-sorted input
costs exactly the same, so it is a fixed comparison network, not an
adaptive merge; (2) marginal payload cost ~1.1 ms/column at 2M (matches
the in-frame ~1.3); (3) net of the ~20 ms dispatch floor the true cost
roughly doubles per size doubling (3.5/4.9/9.0/18.9 ms) — at 2M x 12
(~100 MB of operands) ~19 ms equals ~75 HBM-bandwidth-equivalent passes,
i.e. the network is compute/pass-bound ~10x above a one-pass copy.  A
VMEM-blocked sort with few HBM passes has real headroom; the direction
STAYS OPEN -> experiments/psort_*.py.
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax, jax.numpy as jnp, numpy as np


def bench(label, fn, *args, reps=10):
    out = jax.block_until_ready(fn(*args))
    x = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
    best = 1e9
    for _i in range(reps):
        t0 = time.time()
        out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0]
        _ = float(jnp.asarray(x).ravel()[0].astype(jnp.float32))
        best = min(best, time.time() - t0)
    print(f"{label}: {best*1000:.2f} ms", flush=True)
    return best


def main():
    rng = np.random.default_rng(0)
    N = 2 * 1024 * 1024
    key = jnp.asarray(rng.integers(0, 2**32, N, dtype=np.uint32))
    pays = [jnp.asarray(rng.standard_normal(N, dtype=np.float32))
            for _ in range(11)]

    for k in (1, 2, 4, 8, 12):
        ops = (key,) + tuple(pays[:k - 1])
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
        t = bench(f"sort 2M x {k} operands", f, *ops)
    # size scaling at 12 operands (n log^2 n vs n)
    for n in (256 * 1024, 512 * 1024, 1024 * 1024, 2 * 1024 * 1024):
        ops = (key[:n],) + tuple(p[:n] for p in pays)
        f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
        bench(f"sort {n//1024}k x 12 operands", f, *ops)
    # pre-sorted input (does XLA exploit runs?)
    skey = jnp.sort(key)
    ops = (skey,) + tuple(pays)
    f = jax.jit(lambda *o: jax.lax.sort(o, num_keys=1))
    bench("sort 2M x 12 (already sorted)", f, *ops)


if __name__ == "__main__":
    main()
