import time, jax, jax.numpy as jnp
S = 18 * 1000 * 1000
npix = 1920*1080
pix = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, npix, dtype=jnp.int32)
val5 = jax.random.uniform(jax.random.PRNGKey(2), (S,5), jnp.float32)
def timeit(f, *a, iters=3):
    for _ in range(2): float(jnp.asarray(f(*a)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters): float(jnp.asarray(f(*a)).ravel()[0])
    return (time.perf_counter() - t0)/iters

f8 = jax.jit(lambda p, v: jnp.zeros((npix,8), jnp.float32).at[p].add(
    jnp.concatenate([v, jnp.zeros((S,3), jnp.float32)], -1)).sum())
print("2D[,8] padded:", timeit(f8, pix, val5)*1e3, "ms")

def flat(p, v):
    nc = v.shape[-1]
    fidx = (p[:, None] * nc + jnp.arange(nc, dtype=jnp.int32)).ravel()
    return jnp.zeros((npix*nc,), jnp.float32).at[fidx].add(v.ravel()).sum()
print("flat interleave 5x rows:", timeit(jax.jit(flat), pix, val5)*1e3, "ms")

def five(p, v):
    bufs = [jnp.zeros((npix,), jnp.float32).at[p].add(v[:, c]) for c in range(5)]
    return sum(b.sum() for b in bufs)
print("5 separate 1D:", timeit(jax.jit(five), pix, val5)*1e3, "ms")

f128 = jax.jit(lambda p, v: jnp.zeros((npix//8, 128), jnp.float32).at[p // 8].add(
    jnp.zeros((S,128), jnp.float32).at[:, :5].set(v)).sum())  # not semantically right, just perf probe
print("2D[,128] probe:", timeit(f128, pix, val5)*1e3, "ms")
