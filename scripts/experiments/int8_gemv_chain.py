"""Experiment: does int8 weight-only quantization halve decode GEMV time?
(queued-dispatch timing with a forced scalar fetch — tunnel-safe)."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

IN, MID, PAIRS = 1536, 8960, 14
key = jax.random.PRNGKey(0)
w1_bf = jax.random.normal(key, (PAIRS, IN, MID), jnp.bfloat16) * 0.02
w2_bf = jax.random.normal(key, (PAIRS, MID, IN), jnp.bfloat16) * 0.02
w1_i8 = (jax.random.normal(key, (PAIRS, IN, MID)) * 20).astype(jnp.int8)
w2_i8 = (jax.random.normal(key, (PAIRS, MID, IN)) * 20).astype(jnp.int8)
s1 = jnp.ones((MID,), jnp.bfloat16) * 0.001
s2 = jnp.ones((IN,), jnp.bfloat16) * 0.001
x = jax.random.normal(key, (2, IN), jnp.bfloat16)

@jax.jit
def f_bf16(x, w1, w2):
    def body(h, ws):
        a, b = ws
        return jnp.tanh(h @ a) @ b, None
    h, _ = jax.lax.scan(body, x, (w1, w2))
    return h.sum()

@jax.jit
def f_int8(x, w1, w2):
    def body(h, ws):
        a, b = ws
        h = (jnp.tanh((h @ a.astype(jnp.bfloat16)) * s1) @ b.astype(jnp.bfloat16)) * s2
        return h, None
    h, _ = jax.lax.scan(body, x, (w1, w2))
    return h.sum()

def timeq(f, *a, name="", n=10):
    y = f(*a); _ = float(y)
    t0 = time.perf_counter()
    for i in range(n):
        y = f(a[0] + i, *a[1:])
    _ = float(y)
    print(f"{name}: {(time.perf_counter()-t0)/n*1000:.3f} ms/call (queued+fetch)", flush=True)

timeq(f_bf16, x, w1_bf, w2_bf, name="bf16 chain 1.54GB")
timeq(f_int8, x, w1_i8, w2_i8, name="int8 chain 0.77GB")
