"""Fused generation engine.

Re-designs the reference's Python-driven AR loop
(`vibevoice/modular/modeling_vibevoice_inference.py:328-725`) as ONE jitted
decode superstep per 7.5 Hz frame, with donated state:

  combined LM step -> constrained token select -> per-sample flag updates ->
  diffusion `lax.scan` -> streaming vocoder chunk -> semantic re-encode ->
  next input embeds

Key re-designs vs the reference:
  * The positive stream and the CFG negative stream run as ONE batched
    `[2B]` LM forward over a unified KV cache `[L, 2B, S, KVH, D]` — the
    decode step is weight-bandwidth-bound, so batching the two streams
    halves per-step HBM traffic vs the reference's two sequential forwards.
  * Negative-context bookkeeping (the reference's Python cache-shift loops
    for non-diffusing samples :609-639 and the speech_start reset :563-580)
    becomes per-sample write pointers + visibility masks: a slot written on
    a non-diffusion step is simply never made visible and is overwritten at
    the sample's next diffusion step — O(1), jit-native, step-equivalent
    (verified against the reference in tests/test_generate_parity.py).
  * Tokenizer streaming caches (dict-of-tensors, :193-256) are fixed-shape
    conv state pytrees living inside the jit.
  * Audio accumulates on-device in a preallocated `[B, max_frames*hop]`
    buffer via per-sample dynamic writes; streaming mode fetches per-step
    chunks to feed `AudioStreamer`.

A multi-step `lax.scan` fast path (`decode_chunk`) amortizes dispatch
overhead when no streaming consumer needs per-step chunks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..configs import VibeVoiceConfig
from ..models import connectors, qwen2, tokenizer, vibevoice
from ..schedule import dpm_solver as ds

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    """Static generation parameters (hashable -> closed over by jit)."""
    speech_start_id: int
    speech_end_id: int
    speech_diffusion_id: int
    eos_id: int
    bos_id: Optional[int] = None
    cfg_scale: float = 1.3
    ddpm_steps: int = 10
    max_new_tokens: int = 128
    max_length_times: float = 2.0
    do_sample: bool = False
    # solver variant: 'dpmsolver++' (default) or 'sde-dpmsolver++' (the
    # reference gradio demo's override, gradio_demo.py:114-118)
    algorithm_type: str = "dpmsolver++"
    # CFG negative-context policy (ref kwargs 'refresh_negative', default True:
    # reset the negative stream at every speech_start). False = stale mode
    # (ref :512-527): the negative context grows every step and never resets.
    refresh_negative: bool = True
    # bench mode: force every step down the diffusion hot path
    force_diffusion: bool = False


class StepOutput(NamedTuple):
    token: jnp.ndarray       # [B] int32
    audio_chunk: jnp.ndarray  # [B, hop] fp32 (valid where emitted)
    emitted: jnp.ndarray     # [B] bool — diffusion frame emitted this step
    finished: jnp.ndarray    # [B] bool


class GenState(NamedTuple):
    # unified cache: rows [:B] positive stream, rows [B:] negative stream.
    # BOTH streams write at the shared slot clock `write_pos` (one uniform
    # dynamic_update_slice per layer — alias-updated in place across scan
    # steps); which slots each stream actually ATTENDS is pure visibility
    # bookkeeping, so no scatter ever touches the cache.
    cache: qwen2.KVCache        # [L, 2B, S, KVH*D]
    visible: jnp.ndarray        # [2B, S] int32
    write_pos: jnp.ndarray      # scalar int32 — next slot (both streams)
    pos_positions: jnp.ndarray  # [B] int32 next rope position (positive)
    neg_first_slot: jnp.ndarray  # [B] int32 slot of first committed negative entry
    neg_positions: jnp.ndarray  # [B] int32 next rope position (negative)
    neg_started: jnp.ndarray    # [B] bool — first negative entry committed
    # loop state
    cur_embeds: jnp.ndarray     # [B, H] next LM input
    finished: jnp.ndarray       # [B] bool
    reach_max: jnp.ndarray      # [B] bool
    step: jnp.ndarray           # scalar int32 (decode steps completed)
    max_step_per_sample: jnp.ndarray  # [B] int32
    # audio path: one hop-sized slot per decode step (uniform-slot writes —
    # alias-friendly); `emitted` marks which slots carry a real frame
    acoustic_state: Any
    semantic_state: Any
    frames: jnp.ndarray         # [B] int32 emitted frame count
    audio: jnp.ndarray          # [B, max_steps, hop] fp32
    emitted: jnp.ndarray        # [B, max_steps] bool
    # bookkeeping
    tokens: jnp.ndarray         # [B, max_steps] int32 generated tokens
    rng: jnp.ndarray
    latent_noise: jnp.ndarray   # [F, B, latent] injected x_T per frame (parity tests)


def _token_bias(vocab: int, gen: GenerationConfig) -> np.ndarray:
    """Additive mask allowing only control tokens
    (ref VibeVoiceTokenConstraintProcessor :54-67, valid set :405-413)."""
    bias = np.full((vocab,), -np.inf, np.float32)
    ids = [gen.speech_start_id, gen.speech_end_id, gen.speech_diffusion_id, gen.eos_id]
    if gen.bos_id is not None:
        ids.append(gen.bos_id)
    bias[ids] = 0.0
    return bias


def _onehot(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    return (jnp.arange(n)[None, :] == idx[:, None]).astype(jnp.int32)


def select_token(logits: jnp.ndarray, rng: jnp.ndarray, step: jnp.ndarray,
                 do_sample: bool) -> jnp.ndarray:
    """Greedy or multinomial token selection over constrained logits
    (ref modeling_vibevoice_inference.py:502-507).

    The sampling key is `fold_in(split(rng)[0], step)`: distinct from the
    same step's diffusion-noise key (`split(rng)[1]`) and from every other
    step's key (the carried chain advances once per step, and the fold_in
    separates the token draw from the chain key it derives from).
    """
    if do_sample:
        k, _ = jax.random.split(rng)
        k = jax.random.fold_in(k, step)
        return jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _mesh_from_params(params) -> Optional[Any]:
    """The mesh of a GSPMD-sharded param tree, when its `model` axis is >1
    (tensor parallelism active); None otherwise."""
    try:
        from jax.sharding import NamedSharding
        for leaf in jax.tree_util.tree_leaves(params):
            sh = getattr(leaf, "sharding", None)
            if isinstance(sh, NamedSharding) and "model" in sh.mesh.shape:
                return sh.mesh if sh.mesh.shape["model"] > 1 else None
    except Exception:
        pass
    return None


class Engine:
    """Holds params + compiled prefill/step functions for one model/config."""

    def __init__(self, params: Params, cfg: VibeVoiceConfig, gen: GenerationConfig,
                 max_steps: int, batch: int, prompt_len: int,
                 dtype=jnp.float32, inject_latent_noise: bool = False,
                 use_flash_prefill: Optional[bool] = None,
                 use_flash_decode: Optional[bool] = None,
                 use_fused_vocoder: bool = False,
                 use_fused_semantic: bool = False,
                 use_fused_stages: bool = False,
                 fused_stage_t_min: int = 128,
                 fused_stage_tile: Optional[int] = None,
                 fused_stage_tile_semantic: Optional[int] = None,
                 fused_stage_fold_conv: Optional[bool] = None,
                 fused_stage_fold_head: Optional[bool] = None,
                 fused_stage_rowlane: Optional[bool] = None,
                 keep_audio: bool = True,
                 kv_dtype: str = "model",
                 mesh=None):
        self.inject_latent_noise = inject_latent_noise
        self.use_fused_vocoder = use_fused_vocoder
        self.use_fused_semantic = use_fused_semantic
        self.use_fused_stages = use_fused_stages
        # T-tile target: measured A/B (tokenizer_quant_bench tile variants)
        # — 200 wins at B=8 (+3%), 400 at B<=4 (B=2: 200 loses 4%)
        if fused_stage_tile is None:
            fused_stage_tile = 200 if batch >= 8 else 400
        self.fused_stage_tile = fused_stage_tile
        self.fused_stage_tile_semantic = (fused_stage_tile_semantic
                                          if fused_stage_tile_semantic is not None
                                          else fused_stage_tile)
        # kv_dtype="int8": per-slot symmetric int8 KV cache (half the cache
        # memory and long-context attention reads; dequantized in-kernel)
        if kv_dtype not in ("model", "int8"):
            raise ValueError(f"kv_dtype must be 'model' or 'int8', got {kv_dtype}")
        self.kv_quant = kv_dtype == "int8"
        # keep_audio=False drops the on-device [B, max_steps, hop] waveform
        # accumulator (e.g. 813 MB for a 90-min run) — streaming consumers
        # get per-step chunks from StepOutput instead
        self.keep_audio = keep_audio
        # packs are stashed INSIDE the params tree: closing over them would
        # inline ~GBs of weights as HLO constants (tunnel 413s).  Callers may
        # pre-inject a pack key (e.g. int4 packs built from the original bf16
        # weights before quantization) — an existing key is kept as-is.
        if use_fused_vocoder and "_vocoder_packs" not in params:
            params = dict(params)
            params["_vocoder_packs"] = tokenizer.pack_decoder_stages(
                params["acoustic_decoder"], cfg.acoustic_tokenizer)
        if use_fused_semantic and "_semantic_packs" not in params:
            # fused Block1D chain for the semantic re-encode's small-T tail
            # stages (the encoder's largest dims)
            params = dict(params)
            params["_semantic_packs"] = tokenizer.pack_encoder_stages(
                params["semantic_encoder"], cfg.semantic_tokenizer,
                chunk_t=cfg.speech_compress_ratio)
        if use_fused_stages:
            # tiled large-T stage kernel for BOTH stacks' early/late conv
            # stages — the per-stream compute the r3 B=8 attribution located
            # (composes with quantize_tokenizer: those stages stay unquantized).
            # Folding the transition convs into the kernels (r4) is a measured
            # B=1 win (+4%: HBM round trips + dispatch dominate) and a B>=4
            # loss (-10%: the per-tap lane-padded conv work serializes inside
            # the kernel) — auto-select by batch.
            if fused_stage_fold_conv is None:
                fused_stage_fold_conv = batch == 1
            # fold_head: the decoder tail (final norm + head conv) rides the
            # last stage kernel as an epilogue — the [B, 3200, D] stage
            # output never round-trips HBM.  Measured (head_fold_ab.py): a
            # wash/-0.6% at B=8 AND -6% at B=1 (r5: 35.5/33.1 folded vs 37.9
            # plain, int4f+int4k+fs — the in-kernel head FMAs run on 4x
            # lane-padded D=32 rows and the saved HBM ops were cheap), so the
            # fold stays OFF at every batch; it remains an explicit option.
            if fused_stage_fold_head is None:
                fused_stage_fold_head = False
            # rowlane: at batch, fold the rows of the D<128 stages into the
            # LANE dim ([Tt, R*D] activations, block-diagonal FFN weights) so
            # the VPU-bound stage work runs full 128-lane vectors.  Measured
            # (rowlane_ab.py, r5): +3-4% at B=2/B=4 (int4f LM), +2-4% at
            # B=32/B=64 (both LM modes: 319 vs 311-313 at B=32, 344 vs 330
            # at B=64 int8), a wash at B=8/B=16 — auto-on where the win is
            # measured.
            if fused_stage_rowlane is None:
                fused_stage_rowlane = 2 <= batch <= 4 or batch >= 32
            rl_batch = batch if (fused_stage_rowlane and batch > 1) else 0
            params = dict(params)
            params["_vocoder_packs_large"] = tokenizer.pack_decoder_stages_large(
                params["acoustic_decoder"], cfg.acoustic_tokenizer,
                t_min=fused_stage_t_min, fold_conv=fused_stage_fold_conv,
                fold_head=fused_stage_fold_head, rowlane_batch=rl_batch)
            params["_semantic_packs_large"] = tokenizer.pack_encoder_stages_large(
                params["semantic_encoder"], cfg.semantic_tokenizer,
                chunk_t=cfg.speech_compress_ratio, t_min=fused_stage_t_min,
                fold_conv=fused_stage_fold_conv, rowlane_batch=rl_batch)
        if use_flash_prefill is None:
            # auto: long prompts with TPU-tileable head dim take the Pallas path
            use_flash_prefill = prompt_len >= 1024 and cfg.decoder.head_dim % 128 == 0
        self.use_flash_prefill = use_flash_prefill
        if use_flash_decode is None:
            # long caches: Pallas decode attention skips beyond-length blocks
            use_flash_decode = ((prompt_len + max_steps) >= 4096
                                and cfg.decoder.head_dim % 128 == 0)
        self.use_flash_decode = use_flash_decode
        # tensor parallelism: when the params are GSPMD-sharded over a mesh
        # with a >1 `model` axis, the Pallas kernels must run under shard_map
        # (heads/cache stay sharded — a bare pallas_call would make XLA
        # all-gather the full cache on every step).  Auto-detect from the
        # param shardings unless a mesh is passed explicitly.
        explicit_mesh = mesh is not None
        if mesh is None:
            # auto-detect a TENSOR-parallel mesh from the param shardings
            # (a >1 `model` axis; an idle `data` axis alongside it is fine —
            # the batch stays replicated over it)
            mesh = _mesh_from_params(params)
        # data-parallel serving (ref per-sample batch semantics
        # modeling_vibevoice_inference.py:390-399, batch CLI
        # demo/batch_inference_simple_captions.py): an EXPLICIT mesh with a
        # >1 `data` axis runs the WHOLE decode step under shard_map over that
        # axis — each shard serves batch/dp samples with zero per-step
        # collectives by construction (samples independent; params replicated).
        self.dp_mesh = None
        if explicit_mesh and mesh.shape.get("data", 1) > 1:
            if mesh.shape.get("model", 1) > 1:
                raise NotImplementedError(
                    "combined data x model decode sharding is not supported; "
                    "use a pure-TP mesh for sharded models or a pure-DP mesh "
                    "for batch serving")
            dp = mesh.shape["data"]
            if batch % dp:
                raise ValueError(f"batch {batch} must divide over data axis {dp}")
            self.dp_mesh = mesh
            mesh = None  # the per-shard body runs the ordinary single-mesh path
        self.mesh = mesh
        if mesh is not None:
            mp = mesh.shape.get("model", 1)
            if mp > 1 and cfg.decoder.num_key_value_heads % mp:
                # GQA groups must be shard-local: the KV cache's fused KVH*D
                # lanes can only split at head boundaries (1.5B KVH=2 -> TP<=2;
                # 7B KVH=4 -> TP<=4 — the reference's tp_plan assumes the same)
                raise ValueError(
                    f"TP degree {mp} must divide num_key_value_heads "
                    f"{cfg.decoder.num_key_value_heads}; use a smaller model axis")
        self.params = params
        self.cfg = cfg
        self.gen = gen
        self.hop = cfg.speech_compress_ratio
        self.max_steps = max_steps
        self.batch = batch
        self.prompt_len = prompt_len
        self.cache_len = prompt_len + max_steps
        if self.use_flash_decode:
            # the Pallas decode kernel tiles the cache in 2048-wide blocks;
            # extra slots are never written or visible
            self.cache_len = -(-self.cache_len // 2048) * 2048
        self.dtype = dtype

        self.solver_cfg = ds.SolverConfig(
            num_train_timesteps=cfg.diffusion_head.ddpm_num_steps,
            beta_schedule=cfg.diffusion_head.ddpm_beta_schedule,
            prediction_type=cfg.diffusion_head.prediction_type,
            algorithm_type=gen.algorithm_type,
        )
        self.tables = ds.make_tables(self.solver_cfg)
        self.sched = ds.set_timesteps(self.solver_cfg, self.tables, gen.ddpm_steps)
        # constrained logits head: only the control tokens are selectable
        # (ref VibeVoiceTokenConstraintProcessor :54-67), so the per-step
        # logits matmul gathers JUST those head columns — identical argmax,
        # minus a full [H, V] weight read per step (466 MB bf16 at 1.5B)
        allowed = [gen.speech_start_id, gen.speech_end_id,
                   gen.speech_diffusion_id, gen.eos_id]
        if gen.bos_id is not None:
            allowed.append(gen.bos_id)
        self.allowed_ids = jnp.asarray(sorted(set(allowed)), jnp.int32)
        if "_lm_head_sub" not in params:
            params = dict(params)
            params["_lm_head_sub"] = vibevoice.lm_head_subset(
                params, sorted(set(allowed)), dtype)
            self.params = params

        if self.dp_mesh is not None:
            self._prefill = jax.jit(self._prefill_dp_impl)
            self._step = jax.jit(self._step_dp_impl, donate_argnums=(1,))
            self._chunk = jax.jit(self._chunk_dp_impl, donate_argnums=(1,),
                                  static_argnums=(2,))
        else:
            self._prefill = jax.jit(self._prefill_impl)
            self._step = jax.jit(self._step_impl, donate_argnums=(1,))
            self._chunk = jax.jit(self._chunk_impl, donate_argnums=(1,), static_argnums=(2,))

    # ------------------------------------------------------------------
    def _constrain_state(self, state: GenState) -> GenState:
        """Pin GenState shardings under TP: cache lanes over the `model` axis
        (with the col-sharded k/v projections that write them), everything
        else replicated.  Without explicit constraints GSPMD picks shardings
        for the loop-carried state itself — observed as involuntary full
        rematerialization of conv-state tensors in the r2 multichip dryrun."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())
        kv = NamedSharding(self.mesh, P(None, None, None, "model"))
        specs = jax.tree_util.tree_map(lambda _: repl, state)
        specs = specs._replace(cache=qwen2.KVCache(
            k=kv, v=kv,
            k_scale=None if state.cache.k_scale is None else repl,
            v_scale=None if state.cache.v_scale is None else repl))
        return jax.tree_util.tree_map(lax.with_sharding_constraint, state, specs)

    def _post_lm(self, p: Params, state: GenState, h_t: jnp.ndarray,
                 h_neg: jnp.ndarray, neg_slot: jnp.ndarray) -> Tuple[GenState, StepOutput]:
        """Everything after the LM forward for one step.

        `h_t`/`h_neg` [B, H]: positive and negative hiddens at the current
        position.  The negative stream starts lazily: its first KV entry is
        committed at a sample's FIRST diffusion step, from the current input
        embeds at rope position 0 — exactly the reference's behavior where
        the first negative forward replaces the bare speech_start ids with
        the current `inputs_embeds` (ref :592-604; at step 0 the current
        input embed IS the speech_start embedding).
        """
        cfg, gen = self.cfg, self.gen
        b = h_t.shape[0]
        hop = self.hop

        # constrained subset logits (see __init__): [B, n_allowed] columns of
        # the head, bitwise-equal to the full matmul's corresponding columns;
        # ids sorted ascending so subset argmax == bias-masked full argmax
        logits = vibevoice.lm_logits_subset(p["_lm_head_sub"], h_t).astype(jnp.float32)
        sel = select_token(logits, state.rng, state.step, gen.do_sample)
        next_tok = self.allowed_ids[sel]
        if gen.force_diffusion:
            # bench mode: force the diffusion branch but keep the real token
            # selection LIVE via a data dependency — a plain overwrite lets
            # XLA DCE the whole logits+argmax path and the bench would
            # over-report vs real serving (token ids are non-negative, so
            # this always selects the diffusion token)
            next_tok = jnp.where(next_tok < 0, next_tok,
                                 jnp.int32(gen.speech_diffusion_id))
        next_tok = jnp.where(state.finished, gen.eos_id, next_tok)

        finished = state.finished | (next_tok == gen.eos_id)
        max_hit = (state.step >= state.max_step_per_sample) & ~finished
        finished = finished | max_hit
        reach_max = state.reach_max | max_hit

        is_diff = (~finished) & (next_tok == gen.speech_diffusion_id)
        any_diff = jnp.any(is_diff)
        is_end = next_tok == gen.speech_end_id
        is_start = (~finished) & (next_tok == gen.speech_start_id)

        # speech_end: zero tokenizer streaming caches (ref :556-560)
        acoustic_state = tokenizer.state_reset_where(state.acoustic_state, is_end)
        semantic_state = tokenizer.state_reset_where(state.semantic_state, is_end)

        # speech_start: reset negative context to its FIRST kv entry
        # (ref :563-580 — the reference copies the slot-0 kv over the last
        # slot and zeroes the mask except that column; here the first entry
        # still lives at `neg_first_slot`, so the reset is a pure visibility
        # rewrite — the cache itself is never touched outside the uniform
        # per-layer writes, keeping it alias-updatable).  A no-op before the
        # negative stream has started; stale mode never resets.
        do_reset = is_start & state.neg_started
        if not gen.refresh_negative:
            do_reset = jnp.zeros_like(do_reset)
        cache = state.cache
        visible = state.visible
        reset_vis = _onehot(state.neg_first_slot, visible.shape[1])
        visible = visible.at[b:].set(
            jnp.where(do_reset[:, None], reset_vis, visible[b:]))

        # ---- diffusion branch (latent -> audio -> semantic -> embeds) ----
        rng, k_noise = jax.random.split(state.rng)

        def diffusion_branch(op):
            acoustic_state, semantic_state = op
            if self.inject_latent_noise:
                x_init = state.latent_noise[state.frames, jnp.arange(b)].astype(h_t.dtype)
            else:
                x_init = jax.random.normal(k_noise, (b, cfg.acoustic_vae_dim), h_t.dtype)
            sde_rng = k_noise if gen.algorithm_type.startswith("sde") else None
            latent = vibevoice.sample_speech_latents(
                p, cfg, self.solver_cfg, self.sched, h_t, h_neg, gen.cfg_scale, x_init,
                sde_rng=sde_rng)
            scaled = vibevoice.unscale_latents(p, latent)
            if self.use_fused_vocoder or self.use_fused_stages:
                chunk, ac_state2 = tokenizer.decoder_apply_streaming_fused(
                    p["acoustic_decoder"], cfg.acoustic_tokenizer, scaled[:, None, :],
                    acoustic_state, fused_packs=p.get("_vocoder_packs"),
                    large_packs=p.get("_vocoder_packs_large"),
                    tile_want=self.fused_stage_tile)
            else:
                chunk, ac_state2 = tokenizer.decoder_apply_streaming(
                    p["acoustic_decoder"], cfg.acoustic_tokenizer, scaled[:, None, :], acoustic_state)
            if self.use_fused_semantic or self.use_fused_stages:
                sem, sem_state2 = tokenizer.encoder_apply_streaming_fused(
                    p["semantic_encoder"], cfg.semantic_tokenizer, chunk,
                    semantic_state, fused_packs=p.get("_semantic_packs"),
                    large_packs=p.get("_semantic_packs_large"),
                    tile_want=self.fused_stage_tile_semantic)
            else:
                sem, sem_state2 = tokenizer.encoder_apply_streaming(
                    p["semantic_encoder"], cfg.semantic_tokenizer, chunk, semantic_state)
            ac_embed = connectors.apply(p["acoustic_connector"], latent)
            sem_embed = connectors.apply(p["semantic_connector"], sem[:, 0])
            diff_embeds = ac_embed + sem_embed
            return (ac_state2, sem_state2, chunk[:, :, 0], diff_embeds)

        def skip_branch(op):
            acoustic_state, semantic_state = op
            return (acoustic_state, semantic_state,
                    jnp.zeros((b, hop), h_t.dtype),
                    jnp.zeros((b, cfg.decoder.hidden_size), h_t.dtype))

        ac_state_new, sem_state_new, chunk, diff_embeds = lax.cond(
            any_diff, diffusion_branch, skip_branch, (acoustic_state, semantic_state))

        # merge per-sample: diffusion samples take the new streaming states
        def sel(new, old):
            mask = is_diff.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        acoustic_state = jax.tree_util.tree_map(sel, ac_state_new, acoustic_state)
        semantic_state = jax.tree_util.tree_map(sel, sem_state_new, semantic_state)

        # negative bookkeeping: refresh mode commits the just-written slot only
        # on diffusion steps; stale mode commits every step (the reference
        # forwards+appends the negative stream unconditionally there).
        # `neg_slot` is the shared slot this step's negative kv landed in;
        # a slot not committed is simply never made visible.
        commit = is_diff if gen.refresh_negative else (~finished)
        slot_vis = (jnp.arange(visible.shape[1]) == neg_slot).astype(jnp.int32)[None]
        commit_vis = jnp.minimum(visible[b:] + slot_vis, 1)
        visible = visible.at[b:].set(jnp.where(commit[:, None], commit_vis, visible[b:]))
        neg_first_slot = jnp.where(commit & ~state.neg_started,
                                   neg_slot, state.neg_first_slot)
        neg_positions = jnp.where(commit, state.neg_positions + 1, state.neg_positions)
        neg_started = state.neg_started | commit

        # audio write at the uniform step slot (in-place dynamic_update_slice)
        if self.keep_audio:
            audio = lax.dynamic_update_slice(
                state.audio,
                jnp.where(is_diff[:, None], chunk, 0.0).astype(state.audio.dtype)[:, None, :],
                (0, state.step, 0))
        else:
            audio = state.audio
        emitted = lax.dynamic_update_slice(
            state.emitted, is_diff[:, None], (0, state.step))
        frames = state.frames + is_diff.astype(jnp.int32)

        # next input embeds (ref :582-690)
        tok_embeds = qwen2.embed_rows(p["lm"], next_tok).astype(h_t.dtype)
        cur_embeds = jnp.where(is_diff[:, None], diff_embeds, tok_embeds)

        tokens = state.tokens.at[:, state.step].set(next_tok)

        new_state = GenState(
            cache=cache, visible=visible,
            write_pos=state.write_pos, pos_positions=state.pos_positions,
            neg_first_slot=neg_first_slot, neg_positions=neg_positions,
            neg_started=neg_started,
            cur_embeds=cur_embeds, finished=finished, reach_max=reach_max,
            step=state.step + 1, max_step_per_sample=state.max_step_per_sample,
            acoustic_state=acoustic_state, semantic_state=semantic_state,
            frames=frames, audio=audio, emitted=emitted, tokens=tokens, rng=rng,
            latent_noise=state.latent_noise,
        )
        return self._constrain_state(new_state), StepOutput(
            token=next_tok, audio_chunk=chunk, emitted=is_diff, finished=finished)

    # ------------------------------------------------------------------
    def _prefill_impl(self, params: Params, input_ids: jnp.ndarray,
                      attention_mask: jnp.ndarray, speech_input_mask: jnp.ndarray,
                      speech_tensors: Optional[jnp.ndarray],
                      speech_frame_masks: Optional[jnp.ndarray],
                      rng: jnp.ndarray,
                      voice_latents: Optional[jnp.ndarray] = None,
                      latent_noise: Optional[jnp.ndarray] = None,
                      ) -> Tuple[GenState, StepOutput]:
        """Process the prompt, build the unified cache, execute step 0."""
        p, cfg, gen = params, self.cfg, self.gen
        b, t0 = input_ids.shape
        dec = cfg.decoder
        h_dim = dec.hidden_size

        rng, k_vae = jax.random.split(rng)
        embeds = qwen2.embed_rows(p["lm"], input_ids).astype(self.dtype)
        if speech_tensors is not None or voice_latents is not None:
            if voice_latents is None:
                latents = vibevoice.encode_voice_prompts(
                    p, cfg, k_vae, speech_tensors.astype(self.dtype))
            else:
                latents = voice_latents  # injected (tests / precomputed)
            features = vibevoice.scale_latents(p, latents)
            connected = connectors.apply(p["acoustic_connector"], features)
            flat = connected.reshape(-1, h_dim)
            valid = speech_frame_masks.reshape(-1)
            order = jnp.argsort(~valid, stable=True)
            embeds = vibevoice.splice_speech_embeds(embeds, flat[order], speech_input_mask)

        # ONE unified-cache allocation (rows [:B] positive, [B:] negative);
        # prefill writes row sub-ranges in place — no pos/neg concat, which
        # would transiently double cache memory (OOM for 7B/32K on one chip)
        cache = qwen2.kv_cache_init(dec, 2 * b, self.cache_len, self.dtype,
                                    quantized=self.kv_quant)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            kv_sh = NamedSharding(self.mesh, P(None, None, None, "model"))
            cache = cache._replace(k=lax.with_sharding_constraint(cache.k, kv_sh),
                                   v=lax.with_sharding_constraint(cache.v, kv_sh))

        # positive prefill into rows [:B]
        bias_t0 = qwen2.causal_bias(attention_mask, t0)
        bias = jnp.full((b, 1, t0, self.cache_len), -1e9, jnp.float32)
        bias = bias.at[:, :, :, :t0].set(bias_t0)
        pos = qwen2.positions_from_mask(attention_mask)
        hidden, cache = qwen2.forward(p["lm"], dec, embeds, pos, bias,
                                      cache=cache, write_pos=jnp.int32(0),
                                      pad_mask=attention_mask,
                                      use_flash=self.use_flash_prefill,
                                      mesh=self.mesh)
        h_last = hidden[:, -1]

        # negative pre-seed: speech_start kv at slot 0 of rows [B:] (committed
        # lazily at the first diffusion step — see _post_lm docstring)
        ss_embed = qwen2.embed_rows(
            p["lm"], jnp.full((b, 1), gen.speech_start_id, jnp.int32)).astype(self.dtype)
        neg_bias = jnp.full((b, 1, 1, self.cache_len), -1e9, jnp.float32)
        neg_bias = neg_bias.at[:, :, :, 0].set(0.0)
        h_neg0, cache = qwen2.forward(p["lm"], dec, ss_embed,
                                      jnp.zeros((b, 1), jnp.int32), neg_bias,
                                      cache=cache, write_pos=jnp.int32(0),
                                      batch_offset=b, mesh=self.mesh)

        visible = jnp.zeros((2 * b, self.cache_len), jnp.int32)
        visible = visible.at[:b, :t0].set(attention_mask)

        init_len = attention_mask.sum(axis=-1)
        max_steps_ps = jnp.minimum(
            jnp.int32(self.max_steps),
            (gen.max_length_times * init_len).astype(jnp.int32))

        state = GenState(
            cache=cache, visible=visible,
            write_pos=jnp.int32(t0), pos_positions=init_len.astype(jnp.int32),
            neg_first_slot=jnp.zeros((b,), jnp.int32),
            neg_positions=jnp.zeros((b,), jnp.int32),
            neg_started=jnp.zeros((b,), bool),
            cur_embeds=ss_embed[:, 0],
            finished=jnp.zeros((b,), bool),
            reach_max=jnp.zeros((b,), bool),
            step=jnp.int32(0), max_step_per_sample=max_steps_ps,
            acoustic_state=tokenizer.decoder_state_init(cfg.acoustic_tokenizer, b, self.dtype),
            semantic_state=tokenizer.encoder_state_init(cfg.semantic_tokenizer, b, self.dtype),
            frames=jnp.zeros((b,), jnp.int32),
            audio=jnp.zeros((b, self.max_steps if self.keep_audio else 1, self.hop),
                            jnp.float32),
            emitted=jnp.zeros((b, self.max_steps), bool),
            tokens=jnp.zeros((b, self.max_steps), jnp.int32),
            rng=rng,
            latent_noise=(latent_noise if latent_noise is not None
                          else jnp.zeros((1, b, cfg.acoustic_vae_dim), self.dtype)),
        )
        # at step 0 the negative stream's "just-written" kv is the slot-0
        # pre-seed (the speech_start embedding at rope position 0)
        return self._post_lm(p, state, h_last, h_neg0[:, 0], neg_slot=jnp.int32(0))

    # ------------------------------------------------------------------
    def _step_impl(self, params: Params, state: GenState) -> Tuple[GenState, StepOutput]:
        """One decode step: combined [2B] forward over the unified cache.

        Both streams write this step's kv at the SAME slot `write_pos`
        (uniform scalar -> per-layer dynamic_update_slice, alias-updated in
        place); the negative stream's divergent history is carried entirely
        by the visibility mask."""
        p, cfg = params, self.cfg
        b = state.cur_embeds.shape[0]  # local batch under DP shard_map
        wp = state.write_pos

        # visibility for this forward: each row sees its committed history
        # plus the slot being written right now (one fused [2B, S] op — no
        # pos/neg split + re-concat)
        slot_vis = (jnp.arange(self.cache_len) == wp).astype(jnp.int32)[None]
        vis_step = jnp.minimum(state.visible + slot_vis, 1)

        embeds2 = jnp.concatenate([state.cur_embeds, state.cur_embeds], axis=0)[:, None, :]
        positions2 = jnp.concatenate([state.pos_positions, state.neg_positions])[:, None]

        decode_ctx = None
        if self.use_flash_decode:
            lengths = jnp.full((2 * b,), wp + 1, jnp.int32)
            decode_ctx = (vis_step, lengths)
        hidden, cache = qwen2.forward(
            p["lm"], cfg.decoder, embeds2, positions2, qwen2.decode_bias(vis_step),
            cache=state.cache, write_pos=wp, decode_ctx=decode_ctx, mesh=self.mesh)
        h_pos, h_neg = hidden[:b, 0], hidden[b:, 0]

        state = state._replace(
            cache=cache,
            visible=state.visible.at[:b].set(vis_step[:b]),
            write_pos=wp + 1,
            pos_positions=state.pos_positions + 1)
        return self._post_lm(p, state, h_pos, h_neg, neg_slot=wp)

    def _chunk_impl(self, params: Params, state: GenState, n: int) -> Tuple[GenState, StepOutput]:
        def body(s, _):
            s, out = self._step_impl(params, s)
            return s, out
        state, outs = lax.scan(body, state, None, length=n)
        return state, outs

    # ------------------------------------------------------------------
    # data-parallel decode: the whole step under shard_map over `data`
    # ------------------------------------------------------------------
    # Samples are independent (ref per-sample finished/caches
    # modeling_vibevoice_inference.py:390-399), so DP serving shards every
    # batch-leading state array over the `data` axis and runs the ordinary
    # step body per shard — zero per-step cross-replica collectives by
    # construction (asserted on optimized HLO in tests/test_dp_inference.py).
    #
    # The unified cache's 2B rows are [pos_0..pos_{B-1}, neg_0..neg_{B-1}];
    # a contiguous split of that axis would separate a sample's pos/neg rows
    # onto different shards, so the DP-carried state keeps those leaves in a
    # PACKED [.., 2, B, ..] view (`_dp_pack`) whose batch axis shards cleanly;
    # shard-local reshapes restore the engine layout inside the body.
    #
    # RNG: each shard folds its `data` axis index into the key at prefill, so
    # noise draws are iid across shards. The realized noise therefore differs
    # from the unsharded engine's single [B]-row draw (same distribution);
    # parity tests inject latent noise, making DP-vs-unsharded exact.

    @staticmethod
    def _dp_pack(state: GenState) -> GenState:
        def r(x):
            return x.reshape(x.shape[0], 2, x.shape[1] // 2, *x.shape[2:])
        c = state.cache
        cache = c._replace(
            k=r(c.k), v=r(c.v),
            k_scale=None if c.k_scale is None else r(c.k_scale),
            v_scale=None if c.v_scale is None else r(c.v_scale))
        vis = state.visible.reshape(2, state.visible.shape[0] // 2,
                                    state.visible.shape[1])
        return state._replace(cache=cache, visible=vis, rng=state.rng[None])

    @staticmethod
    def _dp_unpack(state: GenState) -> GenState:
        def r(x):
            return x.reshape(x.shape[0], 2 * x.shape[2], *x.shape[3:])
        c = state.cache
        cache = c._replace(
            k=r(c.k), v=r(c.v),
            k_scale=None if c.k_scale is None else r(c.k_scale),
            v_scale=None if c.v_scale is None else r(c.v_scale))
        vis = state.visible.reshape(2 * state.visible.shape[1],
                                    state.visible.shape[2])
        return state._replace(cache=cache, visible=vis, rng=state.rng[0])

    def _dp_state_specs(self) -> GenState:
        """PartitionSpecs for the PACKED DP GenState."""
        from jax.sharding import PartitionSpec as P

        def btree(tpl):
            return jax.tree_util.tree_map(lambda x: P("data"), tpl)

        ac_tpl = jax.eval_shape(
            lambda: tokenizer.decoder_state_init(self.cfg.acoustic_tokenizer, 1, self.dtype))
        sem_tpl = jax.eval_shape(
            lambda: tokenizer.encoder_state_init(self.cfg.semantic_tokenizer, 1, self.dtype))
        kv = P(None, None, "data")
        return GenState(
            cache=qwen2.KVCache(
                k=kv, v=kv,
                k_scale=kv if self.kv_quant else None,
                v_scale=kv if self.kv_quant else None),
            visible=P(None, "data"), write_pos=P(),
            pos_positions=P("data"), neg_first_slot=P("data"),
            neg_positions=P("data"), neg_started=P("data"),
            cur_embeds=P("data"), finished=P("data"), reach_max=P("data"),
            step=P(), max_step_per_sample=P("data"),
            acoustic_state=btree(ac_tpl), semantic_state=btree(sem_tpl),
            frames=P("data"), audio=P("data"), emitted=P("data"),
            tokens=P("data"), rng=P("data"), latent_noise=P(None, "data"))

    def _dp_out_specs(self, scan: bool = False):
        from jax.sharding import PartitionSpec as P
        s = P(None, "data") if scan else P("data")
        return StepOutput(token=s, audio_chunk=s, emitted=s, finished=s)

    def _params_specs(self, params):
        from jax.sharding import PartitionSpec as P
        return jax.tree_util.tree_map(lambda _: P(), params)

    def _prefill_dp_impl(self, params, input_ids, attention_mask,
                         speech_input_mask, speech_tensors, speech_frame_masks,
                         rng, voice_latents=None, latent_noise=None):
        from jax.sharding import PartitionSpec as P
        bspec = P("data")

        def inner(p, ids, mask, sim, st, sfm, key, vl, ln):
            key = jax.random.fold_in(key, lax.axis_index("data"))
            state, out = self._prefill_impl(p, ids, mask, sim, st, sfm, key, vl, ln)
            return self._dp_pack(state), out

        in_specs = (self._params_specs(params), bspec, bspec, bspec,
                    None if speech_tensors is None else bspec,
                    None if speech_frame_masks is None else bspec,
                    P(),
                    None if voice_latents is None else bspec,
                    None if latent_noise is None else P(None, "data"))
        return jax.shard_map(inner, mesh=self.dp_mesh, in_specs=in_specs,
                             out_specs=(self._dp_state_specs(), self._dp_out_specs()),
                             check_vma=False)(
            params, input_ids, attention_mask, speech_input_mask,
            speech_tensors, speech_frame_masks, rng, voice_latents, latent_noise)

    def _step_dp_impl(self, params, state):
        def inner(p, st):
            s, out = self._step_impl(p, self._dp_unpack(st))
            return self._dp_pack(s), out

        return jax.shard_map(inner, mesh=self.dp_mesh,
                             in_specs=(self._params_specs(params), self._dp_state_specs()),
                             out_specs=(self._dp_state_specs(), self._dp_out_specs()),
                             check_vma=False)(
            params, state)

    def _chunk_dp_impl(self, params, state, n: int):
        def inner(p, st):
            def body(s, _):
                return self._step_impl(p, s)
            s, outs = lax.scan(body, self._dp_unpack(st), None, length=n)
            return self._dp_pack(s), outs

        return jax.shard_map(inner, mesh=self.dp_mesh,
                             in_specs=(self._params_specs(params), self._dp_state_specs()),
                             out_specs=(self._dp_state_specs(),
                                        self._dp_out_specs(scan=True)),
                             check_vma=False)(
            params, state)

    # ------------------------------------------------------------------
    def prefill(self, input_ids, attention_mask, speech_input_mask,
                speech_tensors=None, speech_frame_masks=None, rng=None,
                voice_latents=None, latent_noise=None):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return self._prefill(self.params, jnp.asarray(input_ids),
                             jnp.asarray(attention_mask),
                             jnp.asarray(speech_input_mask),
                             None if speech_tensors is None else jnp.asarray(speech_tensors),
                             None if speech_frame_masks is None else jnp.asarray(speech_frame_masks),
                             rng,
                             None if voice_latents is None else jnp.asarray(voice_latents),
                             None if latent_noise is None else jnp.asarray(latent_noise))

    def step(self, state):
        return self._step(self.params, state)

    def decode_chunk(self, state, n: int):
        return self._chunk(self.params, state, n)


class GenerationResult(NamedTuple):
    tokens: np.ndarray          # [B, steps] generated control tokens
    audio: list                 # list of [T_b] float32 waveforms (or None)
    reach_max: np.ndarray       # [B] bool
    steps: int


def generate(
    engine: Engine,
    input_ids,
    attention_mask,
    speech_input_mask,
    speech_tensors=None,
    speech_frame_masks=None,
    rng=None,
    voice_latents=None,
    latent_noise=None,
    audio_streamer=None,
    stop_check_fn=None,
    check_every: int = 8,
    stream_chunk: int = 4,
    show_progress: bool = False,
    on_step=None,
) -> GenerationResult:
    """Host-side loop (ref generate :328-710).  With a streamer attached it
    advances `stream_chunk` frames per dispatch (one fused scan + one
    readback) and feeds the per-frame chunks to the streamer; otherwise it
    advances in `check_every`-step scans and only syncs flags between
    chunks.

    `on_step(out: StepOutput)` — optional host callback invoked once per
    decode step with numpy views (token / audio_chunk / emitted / finished).
    This is the engine's emitted-frame clock: consumers like the live-caption
    panel derive exact audio positions and speech-segment boundaries from it
    instead of estimating.  Attaching it forces per-step readbacks (same cost
    as a streamer)."""
    state, out = engine.prefill(input_ids, attention_mask, speech_input_mask,
                                speech_tensors, speech_frame_masks, rng, voice_latents,
                                latent_noise)
    b = engine.batch
    steps_done = 1
    it = range(1, engine.max_steps)
    if show_progress:
        try:
            from tqdm import tqdm
            it = tqdm(it, desc="Generating", ncols=100)
        except ImportError:
            pass

    def _feed_streamer(o: StepOutput):
        if on_step is not None:
            on_step(StepOutput(*[np.asarray(x) for x in o]))
        if audio_streamer is None:
            return
        emitted = np.asarray(o.emitted)
        if emitted.any():
            chunk = np.asarray(o.audio_chunk)
            idx = np.nonzero(emitted)[0]
            audio_streamer.put(chunk[idx], idx)
        fin = np.asarray(o.finished)
        if fin.any():
            audio_streamer.end(np.nonzero(fin)[0])

    _feed_streamer(out)

    if audio_streamer is not None or stop_check_fn is not None or on_step is not None:
        m = max(1, stream_chunk)
        while steps_done < engine.max_steps:
            if stop_check_fn is not None and stop_check_fn():
                break
            if bool(np.asarray(state.finished).all()):
                break
            n = min(m, engine.max_steps - steps_done)
            state, outs = engine.decode_chunk(state, n)
            steps_done += n
            # one readback for the whole chunk, then feed frame by frame
            outs_np = jax.tree_util.tree_map(np.asarray, outs)
            for i in range(n):
                _feed_streamer(StepOutput(
                    token=outs_np.token[i], audio_chunk=outs_np.audio_chunk[i],
                    emitted=outs_np.emitted[i], finished=outs_np.finished[i]))
    else:
        while steps_done < engine.max_steps:
            if bool(np.asarray(state.finished).all()):
                break
            n = min(check_every, engine.max_steps - steps_done)
            state, _ = engine.decode_chunk(state, n)
            steps_done += n

    if audio_streamer is not None:
        audio_streamer.end()

    frames = np.asarray(state.frames)
    if engine.keep_audio:
        audio_buf = np.asarray(state.audio)      # [B, max_steps, hop]
        emitted_map = np.asarray(state.emitted)  # [B, max_steps]
        audio = [audio_buf[i][emitted_map[i]].reshape(-1) if frames[i] > 0 else None
                 for i in range(b)]
    else:
        audio = [None] * b  # streaming consumers got the chunks already
    tokens = np.asarray(state.tokens)[:, : int(np.asarray(state.step))]
    return GenerationResult(tokens=tokens, audio=audio,
                            reach_max=np.asarray(state.reach_max), steps=steps_done)


__all__ = ["Engine", "GenerationConfig", "GenState", "StepOutput",
           "GenerationResult", "generate", "select_token"]
