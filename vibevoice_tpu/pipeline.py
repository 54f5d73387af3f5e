"""High-level TTS pipeline: the user-facing equivalent of the reference's
`VibeVoiceForConditionalGenerationInference.from_pretrained` + processor +
generate flow (demo/inference_from_file.py:182-400), TPU-native.

Engines are cached per (batch, bucketed prompt length, max steps) so repeated
calls with similar shapes reuse compiled programs.
"""
from __future__ import annotations

import math
import time
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .configs import VibeVoiceConfig, vibevoice_1_5b
from .engine import generate as G
from .engine.streamer import AudioStreamer
from .models import vibevoice as V
from .processor.processor import VibeVoiceProcessor
from .processor.text_tokenizer import ByteFallbackTokenizer, QwenTextTokenizer


class VibeVoiceTTS:
    def __init__(self, params, cfg: VibeVoiceConfig, tokenizer,
                 dtype=jnp.bfloat16, ddpm_steps: int = 10, cfg_scale: float = 1.3,
                 prompt_bucket: int = 256, quantize: Optional[str] = None,
                 do_sample: bool = False, refresh_negative: bool = True,
                 algorithm_type: str = "dpmsolver++", kv_dtype: str = "model",
                 int4_group_size: Optional[int] = None,
                 quantize_tokenizer: Optional[str] = None,
                 quantize_diffusion: Optional[str] = None,
                 tokenizer_min_dim: int = 512,
                 use_fused_stages: bool = False,
                 keep_audio: bool = True,
                 processor: Optional[VibeVoiceProcessor] = None):
        self.do_sample = do_sample
        self.refresh_negative = refresh_negative
        self.algorithm_type = algorithm_type
        self.kv_dtype = kv_dtype
        # tiled large-T sigma-VAE stage kernel: measured +14% at B=8
        # (170.7 -> 194.8 audio-sec/s), NEGATIVE at B=1 — enable for
        # batch-serving replicas only (PERFORMANCE.md §σ-VAE)
        self.use_fused_stages = use_fused_stages
        # keep_audio=False drops the on-device [B, max_steps, hop] waveform
        # accumulator (~813 MB for a 90-min run); results then carry
        # audio=None and consumers MUST attach an audio_streamer
        self.keep_audio = keep_audio
        # quantize_tokenizer: quantize the σ-VAE decode-path stacks too
        # (vocoder + semantic re-encode — the largest per-frame reads once
        # the LM is quantized).  Opt-in separately from the LM: it touches
        # the waveform path directly.
        #   "int8"  — FFNs (dim>=tokenizer_min_dim) + big transition convs
        #   "int4"  — int4 FFN GEMV kernels (measured SLOWER than int8;
        #             memory option only)
        #   "int4k" — deep (T<=8) stages as int4-weight fused chain kernels
        #             + int8 everywhere else: the measured-best B=1 config
        #             (37.7 RTF vs 34.4 for plain int8 tok, same session)
        self._chain_packs = None
        # quantize_diffusion="int4k": the per-solver-step head FFN weights as
        # ONE fused int4 kernel per step (ops/fused_head.py) — halves the
        # 5x-per-frame head re-read.  Opt-in: it quantizes the weights that
        # produce the output latent (quality-harness-gated like int4k).
        self._head_packq = None
        if quantize_diffusion is not None:
            if quantize_diffusion != "int4k":
                raise ValueError(f"quantize_diffusion must be 'int4k', "
                                 f"got {quantize_diffusion}")
            from .ops.fused_head import pack_head_solver_q
            self._head_packq = pack_head_solver_q(params["diffusion_head"])
        tok_mode = quantize_tokenizer
        tok_skip = None
        if quantize_tokenizer == "int4k":
            from .models import tokenizer as tokmod
            voc = tokmod.pack_decoder_stages(
                params["acoustic_decoder"], cfg.acoustic_tokenizer, quant="int4")
            sem = tokmod.pack_encoder_stages(
                params["semantic_encoder"], cfg.semantic_tokenizer,
                chunk_t=cfg.speech_compress_ratio, quant="int4")
            self._chain_packs = (voc, sem)
            tok_mode = "int8"
            tok_skip = {"acoustic_decoder": set(voc), "semantic_encoder": set(sem)}
        if quantize is not None:
            if quantize not in ("int8", "int4", "int4f"):
                raise ValueError(
                    f"quantize must be 'int8', 'int4' or 'int4f', got {quantize}")
            from .utils.quantize import quantize_model
            params = quantize_model(params, cfg.decoder.tie_word_embeddings,
                                    mode=quantize, group_size=int4_group_size,
                                    tokenizer_mode=tok_mode,
                                    tokenizer_min_dim=tokenizer_min_dim,
                                    tokenizer_skip=tok_skip)
        elif quantize_tokenizer is not None:
            from .utils.quantize import quantize_tokenizers
            if quantize_tokenizer not in ("int8", "int4", "int4k"):
                raise ValueError(f"quantize_tokenizer must be 'int8', 'int4' or "
                                 f"'int4k', got {quantize_tokenizer}")
            params = quantize_tokenizers(params, mode=tok_mode,
                                         min_dim=tokenizer_min_dim, skip=tok_skip)
        if self._head_packq is not None:
            # stash the pack; drop the now-unused per-step FFN weights (bf16
            # ~255 MB / int8 ~85 MB would otherwise idle in HBM)
            params = dict(params)
            params["_diffusion_head_packq"] = self._head_packq
            headp = dict(params["diffusion_head"])
            headp["layers"] = [
                {k: (None if k in ("gate", "up", "down", "gateup") else v)
                 for k, v in lp.items()} for lp in headp["layers"]]
            params["diffusion_head"] = headp
        if self._chain_packs is not None:
            # stash packs in the params tree and drop the packed stages' now-
            # unused FFN weights (would otherwise idle in HBM — ~1.1 GB bf16)
            voc, sem = self._chain_packs
            params = dict(params)
            params["_vocoder_packs"], params["_semantic_packs"] = voc, sem
            for name, packs in (("acoustic_decoder", voc), ("semantic_encoder", sem)):
                stack = dict(params[name])
                stages = list(stack["stages"])
                for i in packs:
                    stages[i] = [dict(bp, ffn1=dict(bp["ffn1"], w=None),
                                      ffn2=dict(bp["ffn2"], w=None))
                                 for bp in stages[i]]
                stack["stages"] = stages
                params[name] = stack
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.ddpm_steps = ddpm_steps
        self.cfg_scale = cfg_scale
        self.prompt_bucket = prompt_bucket
        self.processor = processor or VibeVoiceProcessor(
            tokenizer, speech_tok_compress_ratio=cfg.speech_compress_ratio)
        self._engines: Dict[tuple, G.Engine] = {}

    # ------------------------------------------------------------------
    @classmethod
    def from_pretrained(cls, model_path: str, tokenizer_path: Optional[str] = None,
                        dtype=jnp.bfloat16, **kw) -> "VibeVoiceTTS":
        from .utils.checkpoint import load_hf_checkpoint
        params, cfg = load_hf_checkpoint(model_path, dtype=dtype)
        import os
        tok_path = tokenizer_path or model_path
        try:
            tokenizer = QwenTextTokenizer(tok_path)
        except Exception:
            tokenizer = ByteFallbackTokenizer()
        processor = None
        if os.path.exists(os.path.join(model_path, "preprocessor_config.json")):
            processor = VibeVoiceProcessor.from_pretrained(model_path, tokenizer=tokenizer)
        return cls(params, cfg, tokenizer, dtype=dtype, processor=processor, **kw)

    @classmethod
    def from_random(cls, cfg: Optional[VibeVoiceConfig] = None, seed: int = 0,
                    dtype=jnp.bfloat16, **kw) -> "VibeVoiceTTS":
        """Random-weight instance (smoke tests / benchmarking)."""
        cfg = cfg or vibevoice_1_5b()
        params = V.init_model(jax.random.PRNGKey(seed), cfg, dtype=dtype)
        params["speech_scaling_factor"] = jnp.asarray(1.0)
        params["speech_bias_factor"] = jnp.asarray(0.0)
        return cls(params, cfg, ByteFallbackTokenizer(), dtype=dtype, **kw)

    # ------------------------------------------------------------------
    def _engine(self, batch: int, prompt_len: int, max_steps: int) -> G.Engine:
        bucket = max(self.prompt_bucket,
                     ((prompt_len + self.prompt_bucket - 1) // self.prompt_bucket)
                     * self.prompt_bucket)
        key = (batch, bucket, max_steps)
        if key not in self._engines:
            gen = G.GenerationConfig(
                speech_start_id=self.tokenizer.speech_start_id,
                speech_end_id=self.tokenizer.speech_end_id,
                speech_diffusion_id=self.tokenizer.speech_diffusion_id,
                eos_id=self.tokenizer.eos_id,
                cfg_scale=self.cfg_scale, ddpm_steps=self.ddpm_steps,
                do_sample=self.do_sample, refresh_negative=self.refresh_negative,
                algorithm_type=self.algorithm_type,
            )
            chain = self._chain_packs is not None
            self._engines[key] = G.Engine(self.params, self.cfg, gen,
                                          max_steps=max_steps, batch=batch,
                                          prompt_len=bucket, dtype=self.dtype,
                                          kv_dtype=self.kv_dtype,
                                          use_fused_vocoder=chain,
                                          use_fused_semantic=chain,
                                          use_fused_stages=self.use_fused_stages,
                                          keep_audio=self.keep_audio)
        return self._engines[key]

    # ------------------------------------------------------------------
    def generate(self, script, voice_samples=None, max_new_tokens: Optional[int] = None,
                 seed: int = 0, audio_streamer: Optional[AudioStreamer] = None,
                 stop_check_fn=None, show_progress: bool = False, on_step=None):
        """script: str | list[str]; voice_samples: paths or arrays (or nested
        per-script lists).  Returns GenerationResult + timing metrics."""
        if not self.keep_audio and audio_streamer is None:
            raise ValueError(
                "keep_audio=False discards the buffered waveform — attach an "
                "audio_streamer to receive the audio")
        enc = self.processor(script, voice_samples)
        b, t0 = enc.input_ids.shape
        if max_new_tokens is None:
            # reference default: min(ctx_limit - prompt, 2x prompt)
            # (modeling_vibevoice_inference.py:371-372, :421), bucketed to
            # limit engine recompiles.  NOTE: each distinct (batch, prompt
            # bucket, max_new_tokens bucket) compiles a new engine — minutes
            # cold over a remote tunnel, fast with the persistent compile
            # cache.  Long-running servers should pass an explicit
            # max_new_tokens to pin one bucket.
            limit = self.cfg.decoder.max_position_embeddings - t0
            want = min(limit, 2 * t0)
            max_new_tokens = max(64, -(-want // 256) * 256)
        eng = self._engine(b, t0, max_new_tokens)

        # re-pad prompt to the engine's bucketed length (left padding)
        bucket = eng.prompt_len
        if bucket < t0:
            raise ValueError(
                f"engine prompt bucket {bucket} is smaller than the encoded "
                f"prompt ({t0} tokens)")
        ids = np.full((b, bucket), self.tokenizer.pad_id, np.int32)
        att = np.zeros((b, bucket), np.int32)
        sim = np.zeros((b, bucket), bool)
        ids[:, bucket - t0:] = enc.input_ids
        att[:, bucket - t0:] = enc.attention_mask
        sim[:, bucket - t0:] = enc.speech_input_mask
        # pad ids in masked-off region with a valid id (0) to keep embed
        # lookups in range even for the ByteFallback pad id (-like) values
        ids = np.where(ids < 0, 0, ids)

        t_start = time.perf_counter()
        res = G.generate(eng, ids, att, sim,
                         speech_tensors=enc.speech_tensors,
                         speech_frame_masks=enc.speech_masks,
                         rng=jax.random.PRNGKey(seed),
                         audio_streamer=audio_streamer,
                         stop_check_fn=stop_check_fn,
                         show_progress=show_progress, on_step=on_step)
        wall = time.perf_counter() - t_start
        audio_sec = sum(0 if a is None else len(a) / 24000.0 for a in res.audio)
        metrics = {"wall_s": wall, "audio_sec": audio_sec,
                   "rtf": audio_sec / wall if wall > 0 else 0.0,
                   "steps": res.steps}
        return res, metrics

    def warm(self, batch_sizes: Sequence[int] = (1,),
             prompt_buckets: Optional[Sequence[int]] = None,
             max_new_tokens: Sequence[int] = (256,)) -> List[tuple]:
        """Precompile the serving engines for a shape grid.

        Runs one dummy prefill + 1-step decode per (batch, prompt bucket,
        max_new_tokens) combination so every program a server will dispatch
        is compiled (and, with `jax_compilation_cache_dir` set, persisted)
        before the first request.  Returns the warmed engine keys.

        Cold compiles take minutes per engine over a remote-device tunnel —
        deployments should warm once at rollout, not per process start.
        """
        warmed = []
        for b in batch_sizes:
            for p in (prompt_buckets or [self.prompt_bucket]):
                for m in max_new_tokens:
                    eng = self._engine(b, p, m)
                    ids = np.zeros((b, eng.prompt_len), np.int32)
                    att = np.ones((b, eng.prompt_len), np.int32)
                    sim = np.zeros((b, eng.prompt_len), bool)
                    state, _ = eng.prefill(ids, att, sim)
                    state, _ = eng.decode_chunk(state, 1)
                    _ = int(np.asarray(state.frames).sum())  # sync
                    warmed.append((b, eng.prompt_len, m))
        return warmed

    def save_audio(self, audio, path: str) -> str:
        return self.processor.save_audio(audio, path)


__all__ = ["VibeVoiceTTS"]
