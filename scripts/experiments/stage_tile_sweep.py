"""On-chip tile sweep for the large-T fused stage kernel (ROUND3 open item 3:
~1.2 ms/batch-step of stage-kernel time remains at B=8).

Times each real 1.5B σ-VAE large-T stage (decoder + semantic encoder) as a
standalone data-chained scan at several T-tile targets, plus the bf16-vs-
fp32 intra-kernel matmul variant that ships now.

Usage: python scripts/experiments/stage_tile_sweep.py [batch] [reps]
"""
import sys, os, time, json
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import jax, jax.numpy as jnp
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vibevoice_tpu.configs import vibevoice_1_5b
from vibevoice_tpu.models import vibevoice, tokenizer as tokmod
from vibevoice_tpu.ops import fused_stage as fs

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 50

cfg = vibevoice_1_5b()
hop = cfg.speech_compress_ratio
params = jax.jit(lambda k: vibevoice.init_model(k, cfg, dtype=jnp.bfloat16))(
    jax.random.PRNGKey(0))
_ = float(np.asarray(params["speech_scaling_factor"] if "speech_scaling_factor"
                     in params else 0.0) or 0.0)
print("# init done", flush=True)

dec = params["acoustic_decoder"]
sem = params["semantic_encoder"]
dec_packs = tokmod.pack_decoder_stages_large(dec, cfg.acoustic_tokenizer, t_min=128,
                                             fold_conv=False, fold_head=False)
sem_packs = tokmod.pack_encoder_stages_large(sem, cfg.semantic_tokenizer, fold_conv=False,
                                             chunk_t=hop, t_min=128)

# true per-frame T for each packed stage
dec_depths = cfg.acoustic_tokenizer.decoder_depths_resolved()
dec_strides = list(cfg.acoustic_tokenizer.decoder_ratios)
dec_t = {}
t = 1
for i in range(len(dec_depths)):
    if i > 0:
        t *= dec_strides[i - 1]
    dec_t[i] = t
sem_strides = [1] + list(reversed(cfg.semantic_tokenizer.encoder_ratios))
sem_t = {}
t = hop
for i in range(len(cfg.semantic_tokenizer.encoder_depths)):
    t //= sem_strides[i]
    sem_t[i] = t

CASES = [("dec", i, dec_packs[i], dec_t[i]) for i in sorted(dec_packs)] + \
        [("sem", i, sem_packs[i], sem_t[i]) for i in sorted(sem_packs)]


def bench(packed, t, d, tile):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, t, d), jnp.bfloat16)
    n = packed["vecs"].shape[0]
    ctx = jnp.zeros((B, n, 6, d), jnp.bfloat16)

    @jax.jit
    def run(x0):
        def body(x, _):
            y, _c = fs.fused_stage_chain(packed, x, ctx, tile_want=tile)
            return y, ()
        y, _ = jax.lax.scan(body, x0, None, length=REPS)
        return y

    y = run(x)
    _ = float(np.asarray(y).reshape(-1)[0])  # compile+sync
    t0 = time.perf_counter()
    y = run(x)
    _ = float(np.asarray(y).reshape(-1)[0])
    dt = time.perf_counter() - t0
    return dt / REPS * 1000


for kind, i, packed, t in CASES:
    d = packed["vecs"].shape[2]
    row = {"stage": f"{kind}{i}", "T": t, "D": d,
           "n_blocks": int(packed["vecs"].shape[0])}
    for tile in (200, 400, 800, 1600, 3200):
        if tile > t and tile != 3200:
            continue
        try:
            row[f"tile{tile}"] = round(bench(packed, t, d, min(tile, t)), 4)
        except Exception as e:
            row[f"tile{tile}"] = f"err:{type(e).__name__}"
    print(json.dumps(row), flush=True)
