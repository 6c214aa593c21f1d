import time, jax, jax.numpy as jnp
S = 18 * 1000 * 1000
npix = 1920*1080
pix = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, npix, dtype=jnp.int32)
val = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32)
val5 = jax.random.uniform(jax.random.PRNGKey(2), (S,5), jnp.float32)
print("devices:", jax.devices())
def timeit(f, *a, iters=5):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0)/iters
f_min = jax.jit(lambda p, v: jnp.full((npix,), 3e38, jnp.float32).at[p].min(v))
print("scatter-min 1D:", timeit(f_min, pix, val)*1e3, "ms")
f_add1 = jax.jit(lambda p, v: jnp.zeros((npix,), jnp.float32).at[p].add(v))
print("scatter-add 1D:", timeit(f_add1, pix, val)*1e3, "ms")
f_add5 = jax.jit(lambda p, v: jnp.zeros((npix,5), jnp.float32).at[p].add(v))
print("scatter-add 2D[,5]:", timeit(f_add5, pix, val5)*1e3, "ms")
f_add4 = jax.jit(lambda p, v: jnp.zeros((npix,4), jnp.float32).at[p].add(v[:, :4]))
print("scatter-add 2D[,4]:", timeit(f_add4, pix, val5)*1e3, "ms")
f_add8 = jax.jit(lambda p, v: jnp.zeros((npix,8), jnp.float32).at[p].add(
    jnp.concatenate([v, v[:, :3]], -1)))
print("scatter-add 2D[,8]:", timeit(f_add8, pix, val5)*1e3, "ms")
