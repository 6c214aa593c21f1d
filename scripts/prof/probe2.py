import sys
import time

import jax
import jax.numpy as jnp

S = 18_663_400
NPIX = 1920 * 1080

k = jax.random.PRNGKey(0)
pix = jax.random.randint(k, (S,), 0, NPIX, dtype=jnp.int32)
depth = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32, 1.0, 100.0)
val5 = jax.random.uniform(jax.random.PRNGKey(2), (S, 5), jnp.float32)


def timeit(name, f, *a, iters=3):
    t0 = time.perf_counter()
    float(jnp.asarray(f(*a)).ravel()[0])
    print(f"{name} compile+1: {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(f(*a)).ravel()[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.1f} ms", flush=True)
    return dt


@jax.jit
def unsorted_adds(p, v):
    bufs = [jnp.zeros((NPIX,), jnp.float32).at[p].add(v[:, c]) for c in range(5)]
    return sum(b.sum() for b in bufs)


timeit("a. 5x unsorted at[].add", unsorted_adds, pix, val5)


@jax.jit
def sort_full(p, d):
    perm0 = jnp.arange(S, dtype=jnp.int32)
    return jax.lax.sort((p, d, perm0), num_keys=2)


t0 = time.perf_counter()
sp, sd, perm = jax.block_until_ready(sort_full(pix, depth))
float(sp[0])
print(f"sort compile+1: {time.perf_counter()-t0:.2f}s", file=sys.stderr, flush=True)
t0 = time.perf_counter()
for _ in range(3):
    sp, sd, perm = sort_full(pix, depth)
    float(sp[0])
print(f"b. lax.sort 2keys+perm: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

sval5 = jax.block_until_ready(jax.jit(lambda v, pm: v[pm])(val5, perm))


@jax.jit
def sorted_adds(p, v):
    bufs = [
        jnp.zeros((NPIX,), jnp.float32).at[p].add(v[:, c], indices_are_sorted=True)
        for c in range(5)
    ]
    return sum(b.sum() for b in bufs)


timeit("d. 5x sorted at[].add", sorted_adds, sp, sval5)


@jax.jit
def gathers(v, pm):
    return v[pm].sum()


timeit("c. gather [S,5] by perm", gathers, val5, perm)


@jax.jit
def boundaries(p):
    q = jnp.arange(NPIX, dtype=jnp.int32)
    return jnp.searchsorted(p, q, side="left").sum()


timeit("f. searchsorted 2.07M into S", boundaries, sp)


@jax.jit
def unsorted_min(p, d):
    return jnp.full((NPIX,), 3e38, jnp.float32).at[p].min(d).sum()


timeit("g. unsorted at[].min", unsorted_min, pix, depth)
