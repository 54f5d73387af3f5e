"""int4 probe v2: engine-realistic shapes (M=2), fixed grids, bitcast unpack.

Findings from v1: Pallas matmul beats the XLA int8 path by ~10x at decode
GEMV shapes; per-call fixed cost dominates, so v2 (a) measures fixed vs
per-byte cost via repeated single matmuls, (b) tries pltpu.bitcast int8->int4
(which doubles the SUBLANE dim) as a potentially hardware-native unpack,
(c) checks kernel exactness against the dequantized model.
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

IN, MID, M = 1536, 8960, 2
cdiv = lambda a, b: -(-a // b)


# --- step 0: learn pltpu.bitcast int8->int4 row ordering --------------------

def order_probe():
    # byte value encodes its row: byte r = (hi= (2r+1)%16, lo= 2r%16)
    rows = np.arange(8, dtype=np.int64)
    lo = (2 * rows) % 16
    hi = (2 * rows + 1) % 16
    pat = ((hi << 4) | lo).astype(np.uint8).view(np.int8)
    x = jnp.asarray(np.broadcast_to(pat[:, None], (8, 128)))

    def k(i_ref, o_ref):
        o_ref[:] = pltpu.bitcast(i_ref[:], jnp.int4).astype(jnp.float32)

    out = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32))(x)
    col = np.asarray(out)[:, 0].astype(np.int64) % 16
    print("bitcast row order (col0, lo-encoded=even hi=odd):", col.tolist(), flush=True)


# --- kernels -----------------------------------------------------------------

def _k_int8(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def mm_int8_pallas(x, wq, s, n_blk=512):
    m, k = x.shape
    n = wq.shape[1]
    return pl.pallas_call(
        _k_int8,
        grid=(cdiv(n, n_blk),),
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


def _k_int4_shift(x_ref, p_ref, s_ref, o_ref, *, k):
    kh = k // 2
    p32 = p_ref[:].astype(jnp.int32)
    acc = jnp.dot(x_ref[:, :kh], _unpack(p32, 0).astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(x_ref[:, kh:], _unpack(p32, 1).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def mm_int4_shift(x, packed, s, n_blk=512):
    m, k = x.shape
    n = packed.shape[1]
    return pl.pallas_call(
        functools.partial(_k_int4_shift, k=k),
        grid=(cdiv(n, n_blk),),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, n_blk), lambda i: (0, i)),
            pl.BlockSpec((1, n_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, packed, s.reshape(1, -1))


def _k_int4_bitcast(x_ref, p_ref, s_ref, o_ref):
    w4 = pltpu.bitcast(p_ref[:], jnp.int4)        # [K, n_blk] (sublane-doubled)
    acc = jnp.dot(x_ref[:], w4.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[0, :].astype(jnp.float32)).astype(o_ref.dtype)


def mm_int4_bitcast(x, packed, s, n_blk=512):
    m, k = x.shape
    n = packed.shape[1]
    return pl.pallas_call(
        _k_int4_bitcast,
        grid=(cdiv(n, n_blk),),
        in_specs=[
            pl.BlockSpec((m, k), lambda i: (0, 0)),
            pl.BlockSpec((k // 2, n_blk), lambda i: (0, i)),
            pl.BlockSpec((1, n_blk), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((m, n_blk), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, packed, s.reshape(1, -1))


# --- quantizers ---------------------------------------------------------------

def quant_int8(w):
    wf = np.asarray(w, np.float32)
    scale = np.abs(wf).max(axis=0) / 127.0 + 1e-12
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale, jnp.bfloat16)


def quant_int4_halves(w):
    """K-halves packing for the shift kernel (byte i: lo=w[i], hi=w[i+K/2])."""
    k, n = w.shape
    wf = np.asarray(w, np.float32)
    scale = np.abs(wf).max(axis=0) / 7.0 + 1e-12
    q = np.clip(np.round(wf / scale), -8, 7).astype(np.int32)
    lo, hi = q[: k // 2], q[k // 2:]
    packed = (((hi & 0xF) << 4) | (lo & 0xF)).astype(np.uint8).view(np.int8)
    return jnp.asarray(packed), jnp.asarray(scale, jnp.bfloat16), q.astype(np.float32) * scale


def quant_int4_interleave(w, order):
    """Packing matched to pltpu.bitcast's row expansion.

    `order` is the learned expansion: unpacked row (2i + j) comes from nibble
    order[j] of byte row i (0 = low nibble).  Pack so unpacked == original.
    """
    k, n = w.shape
    wf = np.asarray(w, np.float32)
    scale = np.abs(wf).max(axis=0) / 7.0 + 1e-12
    q = np.clip(np.round(wf / scale), -8, 7).astype(np.int32)
    a = q[0::2] if order[0] == 0 else q[1::2]   # low-nibble source rows
    b = q[1::2] if order[0] == 0 else q[0::2]   # high-nibble source rows
    packed = (((b & 0xF) << 4) | (a & 0xF)).astype(np.uint8).view(np.int8)
    return jnp.asarray(packed), jnp.asarray(scale, jnp.bfloat16), q.astype(np.float32) * scale


# --- measurement ---------------------------------------------------------------

def main():
    order_probe()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, IN)), jnp.bfloat16)

    w = rng.normal(0, 0.02, (IN, MID)).astype(np.float32)
    q8, s8 = quant_int8(w)
    p4h, s4h, wdq_h = quant_int4_halves(w)
    # exactness: kernel vs XLA matmul of the dequantized model (fp32)
    y_ref_h = np.asarray(x, np.float32) @ wdq_h * 1.0
    got = np.asarray(mm_int4_shift(x, p4h, s4h), np.float32)
    ref = np.asarray(x, np.float32) @ (wdq_h)
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"int4-shift exactness vs dequant model (bf16 x): rel {rel:.4f}", flush=True)

    try:
        # learn order from probe output manually: try order (0,1) first
        p4b, s4b, wdq_b = quant_int4_interleave(w, order=(0, 1))
        got_b = np.asarray(mm_int4_bitcast(x, p4b, s4b), np.float32)
        rel_b = np.abs(got_b - ref).max() / np.abs(ref).max()
        print(f"int4-bitcast order(0,1) rel {rel_b:.4f}", flush=True)
        if rel_b > 0.05:
            p4b, s4b, _ = quant_int4_interleave(w, order=(1, 0))
            got_b = np.asarray(mm_int4_bitcast(x, p4b, s4b), np.float32)
            rel_b = np.abs(got_b - ref).max() / np.abs(ref).max()
            print(f"int4-bitcast order(1,0) rel {rel_b:.4f}", flush=True)
        bitcast_ok = rel_b < 0.05
    except Exception as e:
        print(f"int4-bitcast matmul FAILS: {type(e).__name__}: {str(e)[:200]}", flush=True)
        bitcast_ok = False

    # --- repeated-single-matmul cost split (fixed + per-byte) ---
    # chain through the same weight with a data dependency; weight re-read
    # from HBM every iter (VMEM does not persist across pallas calls)
    def chain(mm, q, s, n_iter, back):
        def f(x):
            h = x
            for _ in range(n_iter):
                y = mm(h, q, s)             # [M, MID]
                h = jnp.tanh(y[:, :IN]) if back else y[:, :IN]
            return h.sum()
        return jax.jit(f)

    def timeq(f, x0, name, gb_per_iter, n_iter, n=10):
        y = f(x0); _ = float(y)
        t0 = time.perf_counter()
        for i in range(n):
            y = f(x0 + i * 1e-3)
        _ = float(y)
        dt = (time.perf_counter() - t0) / n / n_iter
        print(f"{name}: {dt*1e6:.1f} us/matmul -> {gb_per_iter/dt:.0f} GB/s", flush=True)
        return dt

    gb8 = IN * MID / 1e9
    gb4 = gb8 / 2
    for n_iter in (8, 32):
        print(f"--- {n_iter}-deep chains, [2,{IN}]x[{IN},{MID}] ---", flush=True)
        timeq(chain(mm_int8_pallas, q8, s8, n_iter, True), x, f"int8-pallas ", gb8, n_iter)
        timeq(chain(mm_int4_shift, p4h, s4h, n_iter, True), x, f"int4-shift  ", gb4, n_iter)
        if bitcast_ok:
            timeq(chain(mm_int4_bitcast, p4b, s4b, n_iter, True), x, f"int4-bitcast", gb4, n_iter)

    # bf16 XLA sanity at same shape
    wbf = jnp.asarray(w, jnp.bfloat16)
    def fbf(x):
        h = x
        for _ in range(32):
            h = jnp.tanh((h @ wbf)[:, :IN])
        return h.sum()
    timeq(jax.jit(fbf), x, "bf16-xla    ", IN * MID * 2 / 1e9, 32)

    # int8 XLA same shape (v1 anomaly check)
    def f8x(x):
        h = x
        for _ in range(32):
            h = jnp.tanh(((h @ q8.astype(jnp.bfloat16)) * s8)[:, :IN])
        return h.sum()
    timeq(jax.jit(f8x), x, "int8-xla    ", gb8, 32)


if __name__ == "__main__":
    main()
