"""Grouped-scale int4 quality/speed ablation (VERDICT r2 item 4).

Per-channel int4 scales are blind to variation ALONG the K axis; per-group
scales (one scale per `group_size` input rows per output channel) capture it
at the cost of one extra VPU multiply per weight inside the kernel.  Real
checkpoints are unavailable in this environment, so quality is measured on
STRUCTURED random weights — N(0,1) shaped by log-normal per-row and
per-column scales plus sparse 10x outliers, mimicking the heavy-tailed,
row-correlated statistics of trained transformer matrices (plain i.i.d.
noise would make grouping look useless by construction).

Outputs, per LM decode shape and granularity (per-channel / g128 / g64):
  * relative matmul output error vs the fp32 weight (quality proxy)
  * fused-kernel GEMV time on the current backend (speed cost)

Usage: python scripts/experiments/int4_group_ablation.py [--cpu]
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.ops.int4_matmul import quantize_int4, int4_matmul

SHAPES = {  # 1.5B decode GEMVs (Qwen2.5-1.5B topology)
    "qkv [1536,2048]": (1536, 2048),
    "gateup [1536,17920]": (1536, 17920),
    "down [8960,1536]": (8960, 1536),
}
GRANULARITIES = {"per-channel": None, "g128": 128, "g64": 64}


def structured_weight(key, k, n):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w = jax.random.normal(k1, (k, n), jnp.float32)
    row = jnp.exp(jax.random.normal(k2, (k, 1)) * 0.6)   # heavy-tailed rows
    col = jnp.exp(jax.random.normal(k3, (1, n)) * 0.3)
    w = w * row * col * 0.02
    outliers = (jax.random.uniform(k4, (k, n)) < 1e-3).astype(jnp.float32)
    return w * (1.0 + 9.0 * outliers)                    # sparse 10x spikes


def main():
    results = []
    for name, (k, n) in SHAPES.items():
        w = structured_weight(jax.random.PRNGKey(hash(name) % 2**31), k, n)
        x = (jax.random.normal(jax.random.PRNGKey(7), (2, k), jnp.float32) * 0.5
             ).astype(jnp.bfloat16)
        y_ref = (x.astype(jnp.float32) @ w)
        y_norm = float(jnp.linalg.norm(y_ref))
        for gname, gs in GRANULARITIES.items():
            q = quantize_int4(w, group_size=gs)
            y = int4_matmul(x, q["qint4"], q["scale4"]).astype(jnp.float32)
            rel = float(jnp.linalg.norm(y - y_ref)) / y_norm
            # kernel timing: ONE jitted program of `reps` data-chained kernel
            # calls (eager per-op dispatch over the tunnel costs ~100 ms/op
            # and the backend elides identical dispatches — CLAUDE.md)
            reps = 100

            @jax.jit
            def chain(xx, packed, scale):
                def body(carry, _):
                    yy = int4_matmul(carry, packed, scale)
                    carry = carry + (yy.sum(axis=-1, keepdims=True)
                                     * jnp.bfloat16(1e-9)).astype(carry.dtype)
                    return carry, ()
                out, _ = jax.lax.scan(body, xx, None, length=reps)
                return out.astype(jnp.float32).sum()

            _ = float(chain(x, q["qint4"], q["scale4"]))  # compile+warm
            t0 = time.perf_counter()
            _ = float(chain(x, q["qint4"], q["scale4"]))
            dt = (time.perf_counter() - t0) / reps * 1e6
            results.append({"shape": name, "scales": gname,
                            "rel_out_err": round(rel, 5),
                            "kernel_us": round(dt, 1)})
            print(json.dumps(results[-1]), flush=True)
    # summary: error reduction vs per-channel
    print("\n# summary (error ratio vs per-channel; kernel slowdown)")
    for name in SHAPES:
        rows = [r for r in results if r["shape"] == name]
        base = rows[0]
        for r in rows[1:]:
            print(json.dumps({
                "shape": name, "scales": r["scales"],
                "err_vs_per_channel": round(r["rel_out_err"] / base["rel_out_err"], 3),
                "time_vs_per_channel": round(r["kernel_us"] / base["kernel_us"], 3)}),
                flush=True)


if __name__ == "__main__":
    main()
