import time, jax, jax.numpy as jnp
S = 18 * 1000 * 1000
npix = 1920*1080
pix = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, npix, dtype=jnp.int32)
val = jax.random.uniform(jax.random.PRNGKey(1), (S,), jnp.float32)
f_add1 = jax.jit(lambda p, v: jnp.zeros((npix,), jnp.float32).at[p].add(v))
out = f_add1(pix, val); jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(5):
    out = f_add1(pix, val)
jax.block_until_ready(out)
print("scatter-add 1D blocked:", (time.perf_counter()-t0)/5*1e3, "ms")
t0 = time.perf_counter()
for i in range(5):
    s = float(f_add1(pix, val).sum())
print("scatter-add 1D to-host:", (time.perf_counter()-t0)/5*1e3, "ms, sum=", s)
# sanity: a big matmul for timer floor
a = jax.random.normal(jax.random.PRNGKey(3), (8192, 8192), jnp.bfloat16)
mm = jax.jit(lambda a: a @ a)
out = mm(a); jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(5): out = mm(a)
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/5
print(f"8k matmul: {dt*1e3:.3f} ms -> {2*8192**3/dt/1e12:.1f} TFLOP/s")
