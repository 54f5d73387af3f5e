"""Generate the repo's standalone voice-preset wavs (demo/voices/*.wav).

The reference ships recorded human voice presets (reference demo/voices/
en-*.wav, zh-*.wav, in-*.wav) that its demos use as speaker prompts.  This
environment cannot record humans, so the repo's presets are GENERATED
speech: a Klatt-style formant synthesizer — glottal pulse source with
jitter/shimmer and phrase-level f0 contours, cascaded formant resonators
with coarticulated vowel transitions, fricative/stop consonants, syllabic
rhythm, and per-language flavor (lexical-tone contours for the zh voices) —
normalized to the processor's -25 dBFS target.  They are acoustically
speech-structured (voiced/unvoiced alternation, formant dynamics, 3-5 Hz
syllable modulation) so the voice-prompt encode path sees speech-like
statistics, and they carry no third-party audio.

Deterministic per voice (seeded); re-run to regenerate:
    python scripts/make_voice_presets.py [--out demo/voices]
"""
import argparse
import os
import wave

import numpy as np
from scipy.signal import lfilter

SR = 24000


def resonator(freq, bw):
    """2nd-order all-pole resonator coefficients at SR."""
    r = np.exp(-np.pi * bw / SR)
    c = 2 * r * np.cos(2 * np.pi * freq / SR)
    b0 = (1 - r) * np.sqrt(1 - c * c / (4 * r)) if 4 * r > c * c else (1 - r)
    return [b0], [1.0, -c, r * r]


# vowel formant targets (female reference, Hz); male voices scale by ~0.85
VOWELS = {
    "a": (850, 1220, 2810), "e": (530, 1990, 2780), "i": (320, 2500, 3010),
    "o": (500, 920, 2710), "u": (370, 950, 2670), "y": (440, 1800, 2700),
}
FRICS = {"s": (5000, 8000), "sh": (2500, 5500), "f": (1500, 8000),
         "h": (500, 3000), "x": (3000, 6500)}
STOPS = {"t": 4000, "k": 2200, "p": 900, "d": 3500, "b": 700, "g": 1800}


def synth_voice(rng, f0_base=210.0, formant_scale=1.0, seconds=8.0,
                tonal=False, syl_rate=4.0):
    """Render one voice: phrases of CV syllables with pauses."""
    total = int(seconds * SR)
    out = np.zeros(total + SR, np.float64)
    pos = int(0.1 * SR)
    vkeys = list(VOWELS)
    fkeys = list(FRICS)
    skeys = list(STOPS)
    prev_vowel = None
    while pos < total - SR // 4:
        # one phrase: 4-9 syllables, then a 150-400 ms pause
        n_syl = rng.integers(4, 10)
        # phrase declination: f0 drifts down over the phrase
        phrase_drop = rng.uniform(0.12, 0.22)
        for si in range(n_syl):
            base = f0_base * (1.0 - phrase_drop * si / max(n_syl - 1, 1))
            base *= rng.uniform(0.97, 1.03)
            # optional onset consonant
            kind = rng.random()
            if kind < 0.35:
                f = FRICS[fkeys[rng.integers(len(fkeys))]]
                dur = int(rng.uniform(0.05, 0.09) * SR)
                noise = rng.normal(0, 1, dur)
                lo, hi = f
                bb, ba = resonator((lo + hi) / 2 * formant_scale, hi - lo)
                seg = lfilter(bb, ba, noise) * 0.5
                env = np.minimum(np.linspace(0, 1, dur) * 4, 1) * \
                    np.minimum(np.linspace(1, 0, dur) * 4, 1)
                out[pos:pos + dur] += seg * env * 0.25
                pos += dur
            elif kind < 0.6:
                burst_f = STOPS[skeys[rng.integers(len(skeys))]]
                gap = int(rng.uniform(0.02, 0.04) * SR)
                pos += gap  # closure silence
                dur = int(0.012 * SR)
                noise = rng.normal(0, 1, dur)
                bb, ba = resonator(burst_f * formant_scale, 800)
                out[pos:pos + dur] += lfilter(bb, ba, noise) * \
                    np.linspace(1, 0, dur) * 0.5
                pos += dur + int(0.008 * SR)
            # vowel nucleus with coarticulated formant glide
            v = vkeys[rng.integers(len(vkeys))]
            tgt = np.array(VOWELS[v], np.float64) * formant_scale
            src = (np.array(VOWELS[prev_vowel], np.float64) * formant_scale
                   if prev_vowel else tgt * rng.uniform(0.9, 1.1, 3))
            prev_vowel = v
            dur = int(rng.uniform(0.10, 0.6 / syl_rate) * SR)
            t = np.arange(dur) / SR
            # f0 contour: lexical tones for zh flavor, gentle arc otherwise
            if tonal:
                tone = rng.integers(4)
                if tone == 0:
                    f0 = np.full(dur, base * 1.12)              # high level
                elif tone == 1:
                    f0 = base * (0.92 + 0.25 * t / t[-1])       # rising
                elif tone == 2:
                    f0 = base * (1.0 - 0.35 * np.sin(np.pi * t / t[-1]))  # dip
                else:
                    f0 = base * (1.18 - 0.3 * t / t[-1])        # falling
            else:
                f0 = base * (1.0 + 0.06 * np.sin(np.pi * t / t[-1]))
            f0 = f0 * (1.0 + rng.normal(0, 0.008, dur))  # jitter
            # glottal source: pulse train via phase wrap, spectral tilt
            phase = np.cumsum(f0) / SR
            src_sig = ((phase % 1.0) < 0.35).astype(np.float64) * 2 - 1
            src_sig = np.diff(src_sig, prepend=src_sig[0])  # impulses at edges
            src_sig = lfilter([1.0], [1.0, -0.96], src_sig)  # -6 dB/oct tilt
            src_sig += rng.normal(0, 0.02, dur)  # aspiration
            # cascade formant filters with a mid-vowel coefficient update
            seg = src_sig
            halves = [(0, dur // 2, 0.25), (dur // 2, dur, 0.75)]
            pieces = []
            for a, b_, frac in halves:
                piece = seg[a:b_]
                for fi in range(3):
                    fr = src[fi] + (tgt[fi] - src[fi]) * frac
                    bw = 60 + 40 * fi
                    bb, ba = resonator(fr, bw)
                    piece = lfilter(bb, ba, piece)
                pieces.append(piece)
            vsig = np.concatenate(pieces) * 18.0
            env = np.minimum(np.linspace(0, 1, dur) * 8, 1) * \
                np.minimum(np.linspace(1, 0, dur) * 6, 1)
            shimmer = 1.0 + 0.08 * np.sin(2 * np.pi * 5.5 * t + rng.uniform(0, 6))
            out[pos:pos + dur] += vsig * env * shimmer
            pos += dur + int(rng.uniform(0.005, 0.03) * SR)
            if pos >= total - SR // 4:
                break
        pos += int(rng.uniform(0.15, 0.4) * SR)
    out = out[:total]
    # -25 dBFS RMS like processor.audio.AudioNormalizer, then peak-guard
    rms = np.sqrt(np.mean(out ** 2)) or 1.0
    out = out * (10 ** (-25 / 20) / rms)
    peak = np.abs(out).max()
    if peak > 0.97:
        out = out * (0.97 / peak)
    return out.astype(np.float32)


VOICES = {
    # name: (seed, f0, formant_scale, tonal, syllable rate)
    "en-Alice_woman": (11, 212.0, 1.0, False, 4.2),
    "en-Bob_man": (12, 118.0, 0.85, False, 3.8),
    "en-Carol_woman": (13, 196.0, 0.97, False, 4.6),
    "en-Dave_man": (14, 104.0, 0.82, False, 3.5),
    "zh-Lina_woman": (15, 224.0, 1.0, True, 4.8),
    "zh-Wei_man": (16, 121.0, 0.85, True, 4.4),
    "in-Arjun_man": (17, 132.0, 0.87, False, 4.9),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "demo", "voices"))
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for name, (seed, f0, fs, tonal, rate) in VOICES.items():
        rng = np.random.default_rng(seed)
        audio = synth_voice(rng, f0_base=f0, formant_scale=fs,
                            seconds=args.seconds, tonal=tonal, syl_rate=rate)
        path = os.path.join(args.out, f"{name}.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes((audio * 32767).astype("<i2").tobytes())
        print(f"{path}: {len(audio)/SR:.1f}s  rms={np.sqrt(np.mean(audio**2)):.4f}")


if __name__ == "__main__":
    main()
