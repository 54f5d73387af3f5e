"""Dry-run of the quality decision rule (VERDICT r3 item 5): the weights-day
run must produce a binding serving-mode recommendation with no judgment
calls.  `scripts/quality_eval.py:decide` is pure — exercised here on
synthetic metric tables."""
import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "quality_eval",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "quality_eval.py"))
QE = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(QE)


def _m(mel=0.1, lsd=0.3, snr=45.0):
    return {"mel_l2": mel, "lsd_db": lsd, "snr_db": snr}


def test_all_pass_recommends_fastest():
    measured = {c: [_m()] for c in QE.CANONICAL_CANDIDATES}
    v = QE.decide(measured)
    assert all(x["pass"] for x in v["verdicts"].values())
    assert v["recommended"]["B1"] == "int4f+int4k+fs+dh4"
    assert v["recommended"]["B>=2"] == "int4f+int4k+fs+dh4"  # r5: int4f at batch
    assert v["recommended"]["tokenizer"] == "int4k+fs"  # r5: fs wins at every batch


def test_int4k_failure_falls_back_down_the_ladder():
    measured = {c: [_m()] for c in QE.CANONICAL_CANDIDATES}
    # every int4k-bearing candidate fails on SNR
    for c in measured:
        if "int4k" in c:
            measured[c] = [_m(snr=12.0)]
    v = QE.decide(measured)
    assert not v["verdicts"]["int4f+int4k"]["pass"]
    assert v["recommended"]["B1"] == "int4f"          # next rung
    assert v["recommended"]["B>=2"] == "int8"
    assert v["recommended"]["tokenizer"] == "tok8"


def test_g128_is_the_first_knob_when_per_channel_int4_fails():
    measured = {c: [_m()] for c in QE.CANONICAL_CANDIDATES}
    measured["int4f+int4k"] = [_m(mel=2.5)]
    measured["int4f+int4k+fs"] = [_m(mel=2.5)]
    measured["int4f+int4k+fs+dh4"] = [_m(mel=2.5)]
    v = QE.decide(measured)
    assert v["recommended"]["B1"] == "int4f-g128+int4k"


def test_dh4_failure_falls_back_to_int8_head():
    # the head produces the output latent: if int4 head quantization fails
    # the thresholds, the next rung keeps everything else and drops only dh4
    measured = {c: [_m()] for c in QE.CANONICAL_CANDIDATES}
    for c in measured:
        if "dh4" in c:
            measured[c] = [_m(snr=10.0)]
    v = QE.decide(measured)
    assert not v["verdicts"]["int4f+int4k+fs+dh4"]["pass"]
    assert v["recommended"]["B1"] == "int4f+int4k+fs"
    assert v["recommended"]["B>=2"] == "int4f+int4k+fs"


def test_everything_fails_reverts_to_exact_bf16():
    measured = {c: [_m(lsd=9.0)] for c in QE.CANONICAL_CANDIDATES}
    v = QE.decide(measured)
    assert v["recommended"]["B1"] == "bf16 (exact numerics)"
    assert v["recommended"]["B>=2"] == "bf16 (exact numerics)"
    assert v["recommended"]["tokenizer"] == "bf16 (exact numerics)"


def test_unmeasured_candidates_are_skipped_not_failed():
    measured = {"int8": [_m()]}
    v = QE.decide(measured)
    assert v["recommended"]["B1"] == "int8"


def test_any_script_failure_fails_the_candidate():
    measured = {"int8": [_m(), _m(snr=3.0)]}
    v = QE.decide(measured)
    assert not v["verdicts"]["int8"]["pass"]
    assert "script1" in v["verdicts"]["int8"]["fails"][0]


def test_inf_snr_passes_and_threshold_override():
    measured = {"int8": [_m(snr="inf")]}
    assert QE.decide(measured)["verdicts"]["int8"]["pass"]
    v = QE.decide({"int8": [_m(lsd=0.3)]}, {"lsd_max_db": 0.2})
    assert not v["verdicts"]["int8"]["pass"]


def test_ladders_only_name_known_candidates():
    for ladder in (QE.LADDER_B1, QE.LADDER_BATCH, QE.LADDER_TOKENIZER):
        for c in ladder:
            assert c == "bf16" or c in QE.CANDIDATES
    for c in QE.CANONICAL_CANDIDATES:
        assert c in QE.CANDIDATES
