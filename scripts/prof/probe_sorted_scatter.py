"""Probe: cost of the splat accumulation primitives at flagship scale.

Question for round 4: can ONE shared sort of the writer stream replace the
5 scatter-adds + 2 scatter-mins (each of which XLA lowers as its own
sort+combine)?  Measures, at S = 18.6M writers -> 2.07M pixels:

  a. per-column at[].add, unsorted            (current splat.py form)
  b. lax.sort, 2 keys + perm passenger        (the shared sort)
  c. gather of 5 payload columns by perm
  d. at[].add with indices_are_sorted=True    (sorted accumulate)
  e. cumsum 18.6M f32                          (boundary-diff alternative)
  f. searchsorted 2.07M queries into 18.6M    (segment boundaries)
  g. scatter-min unsorted                     (current closest winner)
"""
import time

import jax
import jax.numpy as jnp

S = 18_663_400
NPIX = 1920 * 1080

k = jax.random.PRNGKey(0)
pix = jax.random.randint(k, (S,), 0, NPIX, dtype=jnp.int32)
depth = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32, 1.0, 100.0)
val5 = jax.random.uniform(jax.random.PRNGKey(2), (S, 5), jnp.float32)


def timeit(f, *a, iters=3):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


# a. current: five unsorted 1-D scatter-adds
@jax.jit
def unsorted_adds(p, v):
    return [jnp.zeros((NPIX,), jnp.float32).at[p].add(v[:, c]) for c in range(5)]

print("a. 5x unsorted at[].add      :", timeit(unsorted_adds, pix, val5), "ms")


# b. one shared sort: keys (pixel, depth), passenger = permutation
@jax.jit
def shared_sort(p, d):
    perm0 = jnp.arange(S, dtype=jnp.int32)
    sp, sd, perm = jax.lax.sort((p, d, perm0), num_keys=2)
    return sp, sd, perm

print("b. lax.sort 2keys+perm       :", timeit(shared_sort, pix, depth), "ms")
sp, sd, perm = jax.block_until_ready(shared_sort(pix, depth))


# c. gather 5 columns by perm
@jax.jit
def gather5(v, pm):
    return v[pm]

print("c. gather [S,5] by perm      :", timeit(gather5, val5, perm), "ms")


# d. sorted scatter-add
@jax.jit
def sorted_adds(p, v):
    return [
        jnp.zeros((NPIX,), jnp.float32).at[p].add(
            v[:, c], indices_are_sorted=True
        )
        for c in range(5)
    ]

print("d. 5x sorted at[].add        :", timeit(sorted_adds, sp, gather5(val5, perm)), "ms")


# e. cumsum
@jax.jit
def cs(v):
    return jnp.cumsum(v[:, 0])

print("e. cumsum 18.6M f32          :", timeit(cs, val5), "ms")


# f. searchsorted boundaries
@jax.jit
def boundaries(p):
    q = jnp.arange(NPIX, dtype=jnp.int32)
    return jnp.searchsorted(p, q, side="left")

print("f. searchsorted 2.07M into S :", timeit(boundaries, sp), "ms")


# g. unsorted scatter-min (current closest winner first pass)
@jax.jit
def unsorted_min(p, d):
    return jnp.full((NPIX,), 3e38, jnp.float32).at[p].min(d)

print("g. unsorted at[].min         :", timeit(unsorted_min, pix, depth), "ms")


# h. one [S,8] sorted 2-D scatter (padded payload) for comparison
@jax.jit
def sorted_add_2d(p, v):
    v8 = jnp.concatenate([v, jnp.zeros((S, 3), jnp.float32)], -1)
    return jnp.zeros((NPIX, 8), jnp.float32).at[p].add(
        v8, indices_are_sorted=True
    )

print("h. sorted 2D [S,8] at[].add  :", timeit(sorted_add_2d, sp, gather5(val5, perm)), "ms")
