"""Quality-evaluation harness (weights-gated; VERDICT round-1 item 3).

Given an HF VibeVoice checkpoint, imports the weights, generates the
reference demo scripts, and reports mel/log-spectral distances between a
baseline engine configuration and candidate configurations (int8 / int4 /
kv_dtype=int8 / 5-step SDE).  Optionally A/Bs against the torch reference's
own `generate` when torch + the reference repo are available.

Without `--model_path`, runs the full plumbing on a tiny random model so the
harness itself stays continuously verified (the environment ships no real
checkpoint); with one, it is the one-flag-away real measurement:

  # weights-day one command: canonical candidate set + binding verdict
  python scripts/quality_eval.py --model_path /path/to/VibeVoice-1.5B \
      --voices_dir /root/reference/demo/voices \
      --scripts /root/reference/demo/text_examples/2p_short.txt \
      --canonical

The run emits a pass/fail verdict per candidate against explicit
mel-L2/LSD/SNR thresholds (see THRESHOLDS) and auto-recommends the
serving-mode table (B=1 / B>=2 / tokenizer ladders ordered by measured
speed) — no judgment calls (`decide()`, dry-run-tested in
tests/test_quality_verdict.py).

Ref anchors: demo/inference_from_file.py:336-396 (metrics block),
BASELINE.json waveform/mel allclose north star.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _load_voice(path, sr=24000):
    from vibevoice_tpu.processor.audio import load_audio
    return load_audio(path, sampling_rate=sr)


def _build_tts(args, quantize=None, kv_dtype="model", algorithm_type="dpmsolver++",
               ddpm_steps=None, quantize_tokenizer=None, int4_group_size=None,
               use_fused_stages=False, quantize_diffusion=None):
    import jax.numpy as jnp
    from vibevoice_tpu.pipeline import VibeVoiceTTS

    kw = dict(dtype=jnp.bfloat16 if args.model_path else jnp.float32,
              ddpm_steps=ddpm_steps or args.ddpm_steps,
              cfg_scale=args.cfg_scale,
              quantize=quantize, kv_dtype=kv_dtype, algorithm_type=algorithm_type,
              quantize_tokenizer=quantize_tokenizer,
              quantize_diffusion=quantize_diffusion,
              use_fused_stages=use_fused_stages,
              # tiny-config stacks have dims << 512; quantize them anyway so
              # the random-weight plumbing check exercises the quantized path
              tokenizer_min_dim=512 if args.model_path else 1,
              int4_group_size=int4_group_size)
    if args.model_path:
        return VibeVoiceTTS.from_pretrained(args.model_path, **kw)
    from vibevoice_tpu.configs import tiny_config
    import jax
    from vibevoice_tpu.models import vibevoice as V
    cfg = tiny_config(vocab_size=320)
    params = V.init_model(jax.random.PRNGKey(0), cfg, dtype=kw["dtype"])
    params["speech_scaling_factor"] = jnp.asarray(1.0)
    params["speech_bias_factor"] = jnp.asarray(0.0)
    # the head's adaLN/final layers are zero-init (reference behavior); with
    # them zero the sampled latent is weight-independent and every quantized
    # config would compare bit-identical — randomize so the A/B is real
    k = jax.random.PRNGKey(9)
    for i, lp in enumerate(params["diffusion_head"]["layers"]):
        lp["ada_w"] = jax.random.normal(jax.random.fold_in(k, i),
                                        lp["ada_w"].shape, kw["dtype"]) * 0.05
    for name in ("final_ada_w", "final_linear"):
        params["diffusion_head"][name] = jax.random.normal(
            jax.random.fold_in(k, hash(name) % 1000),
            params["diffusion_head"][name].shape, kw["dtype"]) * 0.05
    from vibevoice_tpu.processor.text_tokenizer import ByteFallbackTokenizer
    return VibeVoiceTTS(params, cfg, ByteFallbackTokenizer(), **kw)


CANDIDATES = {
    "int8": dict(quantize="int8"),
    "int4": dict(quantize="int4"),
    "int4-g128": dict(quantize="int4", int4_group_size="auto128"),
    "int4-g64": dict(quantize="int4", int4_group_size="auto64"),
    "int8kv": dict(quantize="int8", kv_dtype="int8"),
    "sde5": dict(algorithm_type="sde-dpmsolver++", ddpm_steps=5),
    # σ-VAE stack quantization (vocoder + semantic re-encode FFNs)
    "tok8": dict(quantize_tokenizer="int8"),
    "tok4": dict(quantize_tokenizer="int4"),
    "int4+tok8": dict(quantize="int4", quantize_tokenizer="int8"),
    "int4+tok4": dict(quantize="int4", quantize_tokenizer="int4"),
    # the r3 serving recommendations
    "int4f": dict(quantize="int4f"),
    "int4f-g128": dict(quantize="int4f", int4_group_size="auto128"),
    "int4k": dict(quantize_tokenizer="int4k"),
    "int4f+int4k": dict(quantize="int4f", quantize_tokenizer="int4k"),
    "int4f-g128+int4k": dict(quantize="int4f", int4_group_size="auto128",
                             quantize_tokenizer="int4k"),
    "int8+int4k": dict(quantize="int8", quantize_tokenizer="int4k"),
    # engine-kernel numerics variants (no quantization): the fused large-T
    # stage kernel (+ folded transition convs, r4) runs fp32 intra-kernel vs
    # the XLA path's bf16 — recommended serving configs enable it, so the
    # weights-day run certifies it too
    "fs": dict(use_fused_stages=True),
    # r5 middle mode: token-exact bf16 LM, quantized σ-VAE (21.8 RTF
    # vs 18 plain bf16 — the exact-LM users' throughput option)
    "int4k+fs": dict(quantize_tokenizer="int4k", use_fused_stages=True),
    "int8+int4k+fs": dict(quantize="int8", quantize_tokenizer="int4k",
                          use_fused_stages=True),
    "int4f+int4k+fs": dict(quantize="int4f", quantize_tokenizer="int4k",
                           use_fused_stages=True),
    # fused int4 diffusion-head solver kernel (ops/fused_head.py, r4): the
    # head produces the output latent, so its int4 quantization is the most
    # quality-sensitive candidate — certify separately and composed
    "dh4": dict(quantize_diffusion="int4k"),
    "int8+int4k+fs+dh4": dict(quantize="int8", quantize_tokenizer="int4k",
                              use_fused_stages=True,
                              quantize_diffusion="int4k"),
    "int4f+int4k+fs+dh4": dict(quantize="int4f", quantize_tokenizer="int4k",
                               use_fused_stages=True,
                               quantize_diffusion="int4k"),
}

# ---------------------------------------------------------------------------
# Pass/fail decision rule (VERDICT r3 item 5): one command on weights day,
# no judgment calls.
#
# Thresholds (vs the bf16 exact baseline, same seed — quantization noise
# only, not absolute quality):
#   * mel_l2  <= 1.0  — mean per-frame L2 over 80 log-mel bins; 1.0 ≈ 1 dB
#     average mel-band deviation (0.115 nat/bin * sqrt(80)), the classic
#     transparency bar.
#   * lsd_db  <= 1.0  — log-spectral distance; <1 dB is the codec-literature
#     threshold for "perceptually transparent" spectral distortion.
#   * snr_db  >= 20   — quantization error >=20 dB below signal.  (The int4
#     harness smoke on well-behaved random weights measures ~52 dB; real
#     outlier-bearing weights are the open question the run decides.)
#
# Mode ladders are ordered by MEASURED speed (PERFORMANCE.md): the first
# candidate that passes all thresholds on every script wins.  Candidates not
# measured in this run are skipped (run the canonical full set below to make
# the recommendation binding).
# ---------------------------------------------------------------------------

THRESHOLDS = {"mel_l2_max": 1.0, "lsd_max_db": 1.0, "snr_min_db": 20.0}

# best-performance-first ladders; "bf16" = exact numerics, always passes
LADDER_B1 = ["int4f+int4k+fs+dh4", "int4f+int4k+fs", "int4f+int4k",
             "int4f-g128+int4k", "int4f",
             "int4f-g128", "int8+int4k", "int8", "bf16"]
# r5: int4f beats int8 at EVERY measured batch at the composed config
# (B=2 72.3 / B=4 128.3 / B=8 201.5 vs int8 68.4 / 122.2 / 196.7)
LADDER_BATCH = ["int4f+int4k+fs+dh4", "int4f+int4k+fs",
                "int8+int4k+fs+dh4", "int8+int4k+fs", "int8+int4k", "int8",
                "bf16"]
LADDER_TOKENIZER = ["int4k+fs", "int4k", "tok8", "bf16"]  # σ-VAE quant alone

# the weights-day one-command candidate set
CANONICAL_CANDIDATES = ["int4f+int4k", "int4f-g128+int4k", "int4f",
                        "int4f-g128", "int8+int4k", "int8", "int4k", "tok8",
                        "fs", "int4k+fs", "int8+int4k+fs", "int4f+int4k+fs",
                        "dh4", "int8+int4k+fs+dh4", "int4f+int4k+fs+dh4"]


def decide(measured, thresholds=None):
    """measured: {candidate: [per-script metric dicts with mel_l2/lsd_db/snr_db]}.

    Returns {"thresholds", "verdicts": {cand: {"pass", "fails"}},
    "recommended": {"B1", "B>=2", "tokenizer"}} — the serving-mode table
    implied by the quality run (see module comment for the rule).
    """
    th = dict(THRESHOLDS)
    th.update(thresholds or {})
    verdicts = {}
    for cand, metric_list in measured.items():
        fails = []
        for i, m in enumerate(metric_list):
            def _f(v):
                return float("inf") if v in ("inf", None) else float(v)
            if _f(m["mel_l2"]) > th["mel_l2_max"]:
                fails.append(f"script{i}: mel_l2 {m['mel_l2']} > {th['mel_l2_max']}")
            if _f(m["lsd_db"]) > th["lsd_max_db"]:
                fails.append(f"script{i}: lsd_db {m['lsd_db']} > {th['lsd_max_db']}")
            snr = m["snr_db"]
            snr = float("inf") if snr == "inf" else float(snr)
            if snr < th["snr_min_db"]:
                fails.append(f"script{i}: snr_db {m['snr_db']} < {th['snr_min_db']}")
        verdicts[cand] = {"pass": not fails, "fails": fails}

    def pick(ladder):
        for c in ladder:
            if c == "bf16":
                return "bf16 (exact numerics)"
            v = verdicts.get(c)
            if v is None:
                continue  # not measured this run
            if v["pass"]:
                return c
        return "bf16 (exact numerics)"

    return {
        "thresholds": th,
        "verdicts": verdicts,
        "recommended": {"B1": pick(LADDER_B1), "B>=2": pick(LADDER_BATCH),
                        "tokenizer": pick(LADDER_TOKENIZER)},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None,
                    help="HF checkpoint dir; omitted = tiny random plumbing check")
    ap.add_argument("--scripts", nargs="*", default=None, help="script .txt paths")
    ap.add_argument("--voices_dir", default="/root/reference/demo/voices")
    ap.add_argument("--candidates", nargs="*", default=["int8", "int4"],
                    choices=sorted(CANDIDATES), help="configs to compare vs baseline")
    ap.add_argument("--canonical", action="store_true",
                    help="run the weights-day canonical candidate set and emit "
                         "the binding mode recommendation")
    ap.add_argument("--mel_l2_max", type=float, default=THRESHOLDS["mel_l2_max"])
    ap.add_argument("--lsd_max_db", type=float, default=THRESHOLDS["lsd_max_db"])
    ap.add_argument("--snr_min_db", type=float, default=THRESHOLDS["snr_min_db"])
    ap.add_argument("--ddpm_steps", type=int, default=10)
    ap.add_argument("--cfg_scale", type=float, default=1.3)
    ap.add_argument("--max_new_tokens", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--output_dir", default="/tmp/quality_eval")
    ap.add_argument("--compare_reference", action="store_true",
                    help="also run the torch reference's generate (needs torch + weights)")
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu", None],
                    help="default: cpu for the random-weight plumbing check, "
                         "device default when --model_path is given")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu" or (args.platform is None and not args.model_path):
        # env JAX_PLATFORMS alone does not override the axon relay plugin in
        # this environment — the config update is required (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")

    from vibevoice_tpu.utils import audio_metrics as AM

    os.makedirs(args.output_dir, exist_ok=True)

    # ---- inputs -----------------------------------------------------------
    if args.scripts:
        scripts = [open(p).read() for p in args.scripts]
        names = [os.path.splitext(os.path.basename(p))[0] for p in args.scripts]
    else:
        scripts = ["Speaker 1: The quick brown fox jumps over the lazy dog.\n"
                   "Speaker 2: And then it ran away into the forest."]
        names = ["builtin_smoke"]

    voices = []
    if args.model_path and os.path.isdir(args.voices_dir):
        wavs = sorted(f for f in os.listdir(args.voices_dir) if f.endswith(".wav"))
        voices = [_load_voice(os.path.join(args.voices_dir, w)) for w in wavs[:4]]
    if not voices:  # random-weight mode: tiny synthetic voice prompts (the
        # tiny config's hop is small, so long voices would explode the prompt)
        rng = np.random.default_rng(0)
        voices = [rng.normal(0, 0.05, 64).astype(np.float32)]

    max_new = args.max_new_tokens or (None if args.model_path else 8)

    def gen(tts, script):
        if not args.model_path:
            # random weights never argmax the diffusion token; force it so the
            # full latent->vocoder path runs (tests/test_pipeline_smoke.py)
            from vibevoice_tpu.engine import generate as G
            gcfg = G.GenerationConfig(
                speech_start_id=tts.tokenizer.speech_start_id,
                speech_end_id=tts.tokenizer.speech_end_id,
                speech_diffusion_id=tts.tokenizer.speech_diffusion_id,
                eos_id=tts.tokenizer.eos_id, ddpm_steps=tts.ddpm_steps,
                cfg_scale=tts.cfg_scale, algorithm_type=tts.algorithm_type,
                force_diffusion=True)
            chain = getattr(tts, "_chain_packs", None) is not None
            eng = G.Engine(tts.params, tts.cfg, gcfg, max_steps=max_new, batch=1,
                           prompt_len=512, dtype=tts.dtype, kv_dtype=tts.kv_dtype,
                           use_fused_vocoder=chain, use_fused_semantic=chain,
                           use_fused_stages=tts.use_fused_stages,
                           fused_stage_t_min=7 if tts.use_fused_stages
                           and tts.cfg.decoder.hidden_size < 256 else 128)
            tts._engine = lambda b, p, m: eng
        res, metrics = tts.generate(script, voices[:1], max_new_tokens=max_new,
                                    seed=args.seed)
        return res.audio[0], metrics

    # ---- baseline ---------------------------------------------------------
    base = _build_tts(args)
    results = {}
    base_audio = {}
    for name, script in zip(names, scripts):
        audio, metrics = gen(base, script)
        assert audio is not None, f"baseline produced no audio for {name}"
        base_audio[name] = audio
        results[f"baseline/{name}"] = {"rtf": round(metrics["rtf"], 2),
                                       "audio_sec": round(metrics["audio_sec"], 2)}
        _save(base, audio, os.path.join(args.output_dir, f"baseline_{name}.wav"))

    # ---- candidates -------------------------------------------------------
    candidates = CANONICAL_CANDIDATES if args.canonical else args.candidates
    measured = {}
    for cand in candidates:
        kw = dict(CANDIDATES[cand])
        ddpm = kw.pop("ddpm_steps", None)
        gs = kw.pop("int4_group_size", None)
        if gs == "auto128":
            gs = 128 if args.model_path else 32  # tiny hidden dims are small
        elif gs == "auto64":
            gs = 64 if args.model_path else 16
        tts = _build_tts(args, ddpm_steps=ddpm, int4_group_size=gs, **kw)
        for name, script in zip(names, scripts):
            audio, metrics = gen(tts, script)
            assert audio is not None, f"{cand} produced no audio for {name}"
            m = AM.compare(base_audio[name], audio)
            m["rtf"] = round(metrics["rtf"], 2)
            results[f"{cand}/{name}"] = {k: (round(v, 4) if np.isfinite(v) else "inf")
                                         for k, v in m.items()}
            measured.setdefault(cand, []).append(results[f"{cand}/{name}"])
            _save(tts, audio, os.path.join(args.output_dir, f"{cand}_{name}.wav"))

    # ---- pass/fail verdict + serving-mode recommendation ------------------
    # (sde5 is a solver-config candidate, not a quantization mode: its delta
    # vs the baseline is the step-count change itself, so it is excluded
    # from the quantization pass/fail rule)
    verdict = decide({c: ms for c, ms in measured.items() if c != "sde5"},
                     {"mel_l2_max": args.mel_l2_max, "lsd_max_db": args.lsd_max_db,
                      "snr_min_db": args.snr_min_db})
    results["verdict"] = verdict
    if not args.model_path:
        results["verdict"]["note"] = (
            "random-weight plumbing dry-run — NOT a quality statement; rerun "
            "with --model_path and --canonical on a real checkpoint")

    # ---- optional torch-reference A/B --------------------------------------
    if args.compare_reference:
        try:
            ref_audio = _reference_generate(args, scripts[0], voices[:1])
            m = AM.compare(ref_audio, base_audio[names[0]])
            results[f"reference-vs-baseline/{names[0]}"] = {
                k: round(v, 4) for k, v in m.items() if np.isfinite(v)}
        except Exception as e:  # reference path is environment-gated
            results["reference-vs-baseline/error"] = f"{type(e).__name__}: {e}"

    print(json.dumps(results, indent=2))
    with open(os.path.join(args.output_dir, "quality_eval.json"), "w") as f:
        json.dump(results, f, indent=2)


def _save(tts, audio, path):
    try:
        tts.save_audio(audio, path)
    except Exception:
        pass  # audio IO backends are optional; metrics above already computed


def _reference_generate(args, script, voices):
    """Run the torch reference end-to-end on CPU (weights required)."""
    sys.path.insert(0, "/root/reference")
    import torch
    from vibevoice.modular.modeling_vibevoice_inference import (
        VibeVoiceForConditionalGenerationInference)
    from vibevoice.processor.vibevoice_processor import VibeVoiceProcessor

    processor = VibeVoiceProcessor.from_pretrained(args.model_path)
    model = VibeVoiceForConditionalGenerationInference.from_pretrained(
        args.model_path, torch_dtype=torch.float32, attn_implementation="sdpa")
    model.eval()
    model.set_ddpm_inference_steps(args.ddpm_steps)
    inputs = processor(text=[script], voice_samples=[list(voices)],
                       return_tensors="pt", return_attention_mask=True)
    out = model.generate(**inputs, cfg_scale=args.cfg_scale, tokenizer=processor.tokenizer,
                         generation_config={"do_sample": False})
    return out.speech_outputs[0].float().numpy().reshape(-1)


if __name__ == "__main__":
    main()
