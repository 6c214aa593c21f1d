import time, jax, jax.numpy as jnp
S = 18 * 1000 * 1000
npix = 1920*1080
pix = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, npix, dtype=jnp.int32)
val = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32)
val5 = jax.random.uniform(jax.random.PRNGKey(2), (S,5), jnp.float32)

def timeit(f, *a, iters=3):
    for _ in range(2):
        float(jnp.asarray(f(*a)).ravel()[0])  # warmup + drain queue
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.asarray(f(*a)).ravel()[0])
    return (time.perf_counter() - t0)/iters

f_add1 = jax.jit(lambda p, v: jnp.zeros((npix,), jnp.float32).at[p].add(v).sum())
print("scatter-add 1D:", timeit(f_add1, pix, val)*1e3, "ms")
f_add5 = jax.jit(lambda p, v: jnp.zeros((npix,5), jnp.float32).at[p].add(v).sum())
print("scatter-add 2D[,5]:", timeit(f_add5, pix, val5)*1e3, "ms")
f_min = jax.jit(lambda p, v: jnp.full((npix,), 3e38, jnp.float32).at[p].min(v).sum())
print("scatter-min 1D:", timeit(f_min, pix, val)*1e3, "ms")
sorted_pix = jnp.sort(pix)
print("scatter-add 1D sorted idx w/flag:", timeit(
    jax.jit(lambda p, v: jnp.zeros((npix,), jnp.float32).at[p].add(v, indices_are_sorted=True).sum()),
    sorted_pix, val)*1e3, "ms")
