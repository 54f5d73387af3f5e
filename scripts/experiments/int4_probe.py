"""Experiment: can a Pallas int4 dequant-matmul beat the XLA int8 path?

Round-1 dead ends (CLAUDE.md): jnp.int4 across jit boundaries crashes the
axon client; XLA-level nibble unpack materializes and is 5x slower than int8.
This probe tests the remaining route — unpack INSIDE a Pallas kernel, fused
with the matmul — plus feature probes for Mosaic-native int4 handling.

Physics: per frame the 1.5B LM streams ~1.5 GB at int8 (~1.9 ms at 820 GB/s)
or ~0.77 GB at int4 (~0.94 ms).  The unpack costs VPU ops per VALUE; if the
VPU can't sustain ~1.6e12 unpack-ops/s the unpack becomes the new roofline
and int4 loses.  This measures it.

Variants (all chain 14 pairs of 1536x8960 / 8960x1536, like the int8 probe):
  int8-xla      : h @ w.astype(bf16) * s         (current production path)
  int8-pallas   : same matmul as a Pallas kernel (isolates kernel overhead)
  int4-perchan  : Pallas, K-halves packing, shift unpack, per-channel scales
                  (2 big MXU calls per block)
  int4-group128 : Pallas, group-128 scales applied on the output per group
                  (70 small MXU calls per block)
Feature probes: in-kernel pltpu.bitcast int8->int4, int4 astype, int4 ref.
"""
import sys, os, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

IN, MID, PAIRS, M = 1536, 8960, 14, 8
GS = 128  # quant group size along K


# ---------------------------------------------------------------------------
# packing helpers (host)
# ---------------------------------------------------------------------------

def quant_int4(w, gs=GS):
    """w [K, N] -> packed int8 [K/2, N] (K-halves packing: byte row i holds
    w[i] in the low nibble, w[i+K/2] in the high nibble) + scales [K/gs, N]."""
    k, n = w.shape
    wf = np.asarray(w, np.float32)
    g = wf.reshape(k // gs, gs, n)
    scale = np.abs(g).max(axis=1) / 7.0  # [K/gs, N]
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(g / scale[:, None]), -8, 7).astype(np.int32).reshape(k, n)
    lo, hi = q[: k // 2], q[k // 2:]
    packed = (((hi & 0xF) << 4) | (lo & 0xF)).astype(np.uint8).view(np.int8)
    return jnp.asarray(packed), jnp.asarray(scale, jnp.bfloat16)


def quant_int8(w):
    wf = np.asarray(w, np.float32)
    scale = np.abs(wf).max(axis=0) / 127.0 + 1e-12
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale, jnp.bfloat16)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _k_int8(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def mm_int8_pallas(x, wq, s, n_blk=512):
    m, k = x.shape
    n = wq.shape[1]
    return pl.pallas_call(
        _k_int8,
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k, n_blk), lambda i: (0, i)),
            pl.BlockSpec((1, n_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, wq, s.reshape(1, -1))


def _unpack(p32, half):
    if half == 0:
        return (p32 << 28) >> 28
    return (p32 << 24) >> 28


def _k_int4_perchan(x_ref, p_ref, s_ref, o_ref, *, k):
    """Per-channel scales: one unpack + one matmul per half."""
    kh = k // 2
    p32 = p_ref[:].astype(jnp.int32)
    acc = jnp.dot(x_ref[:, :kh], _unpack(p32, 0).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, kh:], _unpack(p32, 1).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def mm_int4_perchan(x, packed, s, n_blk=512):
    m, k = x.shape
    n = packed.shape[1]
    return pl.pallas_call(
        functools.partial(_k_int4_perchan, k=k),
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, n_blk), lambda i: (0, i)),
            pl.BlockSpec((1, n_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, packed, s.reshape(1, -1))


def _k_int4_group(x_ref, p_ref, s_ref, o_ref, *, k, gs):
    """Group scales on the OUTPUT: per (half, group) small matmul, each
    scaled by its [1, n_blk] scale row (cheap — scales never expand)."""
    kh = k // 2
    gh = kh // gs
    acc = jnp.zeros(o_ref.shape, jnp.float32)
    for half in range(2):
        for g in range(gh):
            rows = slice(g * gs, (g + 1) * gs)
            w = _unpack(p_ref[rows, :].astype(jnp.int32), half).astype(jnp.bfloat16)
            xg = x_ref[:, half * kh + g * gs: half * kh + (g + 1) * gs]
            part = jnp.dot(xg, w, preferred_element_type=jnp.float32)
            acc += part * s_ref[half * gh + g, :].astype(jnp.float32)[None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


def mm_int4_group(x, packed, s, n_blk=512, gs=GS):
    m, k = x.shape
    n = packed.shape[1]
    ng = s.shape[0]
    return pl.pallas_call(
        functools.partial(_k_int4_group, k=k, gs=gs),
        grid=(n // n_blk,),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, n_blk), lambda i: (0, i)),
            pl.BlockSpec((ng, n_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, packed, s)


# ---------------------------------------------------------------------------
# feature probes
# ---------------------------------------------------------------------------

def probe_features():
    print("--- feature probes ---", flush=True)
    x8 = jnp.arange(32 * 256, dtype=jnp.int32).reshape(32, 256).astype(jnp.int8)

    def _bitcast_kernel(i_ref, o_ref):
        w4 = pltpu.bitcast(i_ref[:], jnp.int4)
        o_ref[:] = w4.astype(jnp.bfloat16)

    try:
        out = pl.pallas_call(
            _bitcast_kernel,
            out_shape=jax.ShapeDtypeStruct((32, 512), jnp.bfloat16),
        )(x8)
        out.block_until_ready()
        ref = np.asarray(jax.lax.bitcast_convert_type(
            np.asarray(x8), jnp.int4)).astype(np.float32).reshape(32, 512)
        ok = np.allclose(np.asarray(out, np.float32), ref)
        print(f"pltpu.bitcast int8->int4 + astype(bf16): COMPILES, match={ok}", flush=True)
    except Exception as e:
        print(f"pltpu.bitcast int8->int4: FAILS ({type(e).__name__}: {str(e)[:200]})", flush=True)

    def _int4ref_kernel(i_ref, o_ref):
        o_ref[:] = i_ref[:].astype(jnp.bfloat16)

    try:
        @jax.jit
        def f(x8):
            w4 = jax.lax.bitcast_convert_type(x8, jnp.int4).reshape(32, 512)
            return pl.pallas_call(
                _int4ref_kernel,
                out_shape=jax.ShapeDtypeStruct((32, 512), jnp.bfloat16),
            )(w4)
        out = f(x8)
        out.block_until_ready()
        print("int4-typed ref into pallas_call (in-jit bitcast): COMPILES", flush=True)
    except Exception as e:
        print(f"int4-typed ref into pallas_call: FAILS ({type(e).__name__}: {str(e)[:200]})", flush=True)


# ---------------------------------------------------------------------------
# chain bench
# ---------------------------------------------------------------------------

def main():
    rng = np.random.default_rng(0)
    w1 = [rng.normal(0, 0.02, (IN, MID)).astype(np.float32) for _ in range(PAIRS)]
    w2 = [rng.normal(0, 0.02, (MID, IN)).astype(np.float32) for _ in range(PAIRS)]
    x = jnp.asarray(rng.normal(0, 1, (M, IN)), jnp.bfloat16)

    w1_i8 = [quant_int8(w) for w in w1]
    w2_i8 = [quant_int8(w) for w in w2]
    w1_i4 = [quant_int4(w) for w in w1]
    w2_i4 = [quant_int4(w) for w in w2]
    # flat operand lists (avoid closing over GBs as constants)
    i8_ops = [t for a, b in zip(w1_i8, w2_i8) for t in (*a, *b)]
    i4_ops = [t for a, b in zip(w1_i4, w2_i4) for t in (*a, *b)]

    def chain(mm):
        def f(x, *ws):
            h = x
            for i in range(PAIRS):
                q1, s1, q2, s2 = ws[4 * i: 4 * i + 4]
                h = jnp.tanh(mm(h, q1, s1))
                h = mm(h, q2, s2)
            return h.sum()
        return jax.jit(f)

    f_i8_xla = chain(lambda h, q, s: (h @ q.astype(jnp.bfloat16)) * s)
    f_i8_pl = chain(mm_int8_pallas)
    f_i4_pc = chain(mm_int4_perchan)
    f_i4_g = chain(mm_int4_group)

    # correctness vs fp32 (loose: int4 error)
    href = np.asarray(x, np.float32)
    for i in range(2):
        href = np.tanh(href @ w1[i]); href = href @ w2[i]

    def head2(mm, ops):
        h = x
        for i in range(2):
            q1, s1, q2, s2 = ops[4 * i: 4 * i + 4]
            h = jnp.tanh(mm(h, q1, s1)); h = mm(h, q2, s2)
        return np.asarray(h, np.float32)

    for name, mm, ops in [("int8-pallas", mm_int8_pallas, i8_ops),
                          ("int4-perchan", mm_int4_perchan, i4_ops),
                          ("int4-group128", mm_int4_group, i4_ops)]:
        got = head2(mm, ops)
        rel = np.abs(got - href).max() / (np.abs(href).max() + 1e-9)
        print(f"{name}: 2-pair rel err {rel:.4f}", flush=True)

    def timeq(f, ops, name, gb, n=20):
        y = f(x, *ops); _ = float(y)  # compile+run
        t0 = time.perf_counter()
        for i in range(n):
            y = f(x + i, *ops)
        _ = float(y)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1000:.3f} ms/call -> {gb/dt:.0f} GB/s effective", flush=True)
        return dt

    gb_i8 = PAIRS * 2 * IN * MID / 1e9
    gb_i4 = gb_i8 / 2
    print(f"--- chain bench ({PAIRS} pairs, int8 {gb_i8:.2f} GB, int4 {gb_i4:.2f} GB) ---", flush=True)
    timeq(f_i8_xla, i8_ops, "int8-xla     ", gb_i8)
    timeq(f_i8_pl, i8_ops, "int8-pallas  ", gb_i8)
    timeq(f_i4_pc, i4_ops, "int4-perchan ", gb_i4)
    timeq(f_i4_g, i4_ops, "int4-group128", gb_i4)


if __name__ == "__main__":
    probe_features()
    main()
