import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_enable_x64", True)
S = 18 * 1000 * 1000
npix = 1920*1080
key = jax.random.PRNGKey(0)
pix = jax.random.randint(key, (S,), 0, npix, dtype=jnp.int32)
depth = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32, 1.0, 100.0)
valid = jax.random.uniform(jax.random.PRNGKey(2), (S,)) < 0.9
def timeit(f, *a, iters=3):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0)/iters

@jax.jit
def old(pix, depth, valid):
    big = jnp.float32(3e38)
    zmin = jnp.full((npix,), big, jnp.float32).at[pix].min(jnp.where(valid, depth, big))
    is_min = valid & (depth <= zmin[pix])
    imax = jnp.iinfo(jnp.int32).max
    wid = jnp.arange(S, dtype=jnp.int32)
    winner = jnp.full((npix,), imax, jnp.int32).at[pix].min(jnp.where(is_min, wid, imax))
    return zmin, winner
z0, w0 = jax.block_until_ready(old(pix, depth, valid))
print("old 2-scatter+gather:", timeit(old, pix, depth, valid)*1e3, "ms")

@jax.jit
def packed(pix, depth, valid):
    bits = jax.lax.bitcast_convert_type(depth, jnp.int32).astype(jnp.int64)  # depth>0 -> monotonic
    wid = jnp.arange(S, dtype=jnp.int64)
    key = (bits << 25) | wid
    kmax = jnp.int64((1 << 62))
    key = jnp.where(valid, key, kmax)
    kmin = jnp.full((npix,), kmax, jnp.int64).at[pix].min(key)
    winner = (kmin & ((1 << 25) - 1)).astype(jnp.int32)
    zmin = jax.lax.bitcast_convert_type((kmin >> 25).astype(jnp.int32), jnp.float32)
    has = kmin != kmax
    return jnp.where(has, zmin, 3e38), jnp.where(has, winner, jnp.iinfo(jnp.int32).max)
z1, w1 = jax.block_until_ready(packed(pix, depth, valid))
print("packed int64 scatter-min:", timeit(packed, pix, depth, valid)*1e3, "ms")
print("zmin equal:", bool(jnp.all(z0 == z1)), " winner equal:", bool(jnp.all(w0 == w1)))
