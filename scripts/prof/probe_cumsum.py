import sys
import time

import jax
import jax.numpy as jnp

S = 18_663_400
NPIX = 1920 * 1080
k = jax.random.PRNGKey(0)
pix = jnp.sort(jax.random.randint(k, (S,), 0, NPIX, dtype=jnp.int32))
val = jax.random.uniform(jax.random.PRNGKey(2), (S,), jnp.float32)


def timeit(name, f, *a, iters=3):
    t0 = time.perf_counter()
    float(jnp.asarray(f(*a)).ravel()[0])
    print(f"{name} compile+1 {time.perf_counter()-t0:.1f}s", file=sys.stderr,
          flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(f(*a)).ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/iters*1e3:.1f} ms", flush=True)


@jax.jit
def cs1(v):
    return jnp.cumsum(v).sum()


timeit("cumsum 18.6M", cs1, val)


@jax.jit
def seg6(p, v):
    counts = jnp.zeros((NPIX,), jnp.int32).at[p].add(1)
    ends = jnp.cumsum(counts)
    starts = ends - counts
    e = jnp.maximum(ends - 1, 0)
    s = jnp.maximum(starts - 1, 0)
    tot = 0.0
    for c in range(6):
        cs = jnp.cumsum(v + c)
        out = jnp.where(ends > 0, cs[e], 0.0) - jnp.where(
            starts > 0, cs[s], 0.0)
        tot = tot + out.sum()
    return tot


timeit("counts+6col segsum", seg6, pix, val)
