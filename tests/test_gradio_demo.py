"""Gradio demo feature parity (VERDICT round-1 item 1 / next-step 7): the
Blocks graph builds headlessly (against the stub) with the reference's
control set, and the streaming generator produces audio + a complete-audio
artifact on a tiny model."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests import _gradio_stub as gr_stub

# import OUR demo package at collection time: the reference_path fixture later
# prepends /root/reference (which has its own `demo/` dir) to sys.path, and a
# lazy in-test import would resolve the reference's gradio demo instead
import demo.gradio_demo  # noqa: E402,F401
import demo.gradio_demo_with_captions  # noqa: E402,F401


@pytest.fixture(scope="module")
def demo_obj():
    import jax.numpy as jnp
    from demo.gradio_demo import VibeVoiceDemo
    from vibevoice_tpu.configs import tiny_config
    from vibevoice_tpu.pipeline import VibeVoiceTTS

    d = VibeVoiceDemo.__new__(VibeVoiceDemo)
    d.tts = VibeVoiceTTS.from_random(cfg=tiny_config(vocab_size=320),
                                     dtype=jnp.float32, ddpm_steps=2,
                                     prompt_bucket=256)
    d.stop_flag = False
    d.is_generating = False
    d.setup_voice_presets()
    d.load_example_scripts()
    return d


def test_ui_graph_has_reference_control_set(demo_obj):
    from demo.gradio_demo import create_demo_interface
    ui = create_demo_interface(demo_obj, gr=gr_stub)
    # 4 speaker dropdowns (visibility driven by the speaker-count slider)
    dropdowns = ui.by_kind("Dropdown")
    assert len(dropdowns) == 4
    assert [d.kw["visible"] for d in dropdowns] == [True, True, False, False]
    # sliders: num_speakers (1..4) + cfg scale
    sliders = ui.by_kind("Slider")
    assert len(sliders) == 2
    assert sliders[0].kw["maximum"] == 4
    # two audio outputs: streaming + complete artifact
    audios = ui.by_kind("Audio")
    assert len(audios) == 2
    assert any(a.kw.get("streaming") for a in audios)
    # log panel + script box
    textboxes = ui.by_kind("Textbox")
    assert any(t.kw.get("label") == "Generation log" for t in textboxes)
    # generate / stop / random-example buttons with wired events
    buttons = {b.kw.get("args", ("",))[0]: b for b in ui.by_kind("Button")}
    assert {"Generate", "Stop", "Random example"} <= set(buttons)
    assert buttons["Generate"].events and buttons["Stop"].events
    # speaker-count slider drives dropdown visibility
    assert sliders[0].events and sliders[0].events[0]["trigger"] == "change"


def test_ui_graph_with_captions(demo_obj):
    from demo.gradio_demo_with_captions import (
        VibeVoiceDemoWithCaptions, create_demo_interface_with_captions)
    d = VibeVoiceDemoWithCaptions.__new__(VibeVoiceDemoWithCaptions)
    d.__dict__.update(demo_obj.__dict__)
    ui = create_demo_interface_with_captions(d, gr=gr_stub)
    assert len(ui.by_kind("Dropdown")) == 4
    labels = [t.kw.get("label") for t in ui.by_kind("Textbox")]
    assert "Live caption" in labels
    assert ui.by_kind("File")  # caption package download


def test_example_scripts_skip_long(demo_obj):
    # the reference corpus has 45/100-minute scripts; those must be skipped
    assert demo_obj.example_scripts, "no example scripts loaded"
    for n, script in demo_obj.example_scripts:
        assert 1 <= n <= 4


def test_example_loader_skips_over_15min(tmp_path, demo_obj):
    from demo.gradio_demo import VibeVoiceDemo
    d = VibeVoiceDemo.__new__(VibeVoiceDemo)
    exdir = tmp_path / "text_examples"
    exdir.mkdir()
    (exdir / "2p_short.txt").write_text("Speaker 1: hi\nSpeaker 2: yo")
    (exdir / "4p_long_45min.txt").write_text("Speaker 1: way too long")
    (exdir / "1p_ok_10min.txt").write_text("Speaker 1: fine")
    import demo.gradio_demo as gd
    # gd.os IS the global os module — capture the real function BEFORE
    # patching (the old `finally: gd.os.path.dirname = os.path.dirname`
    # re-assigned the patched lambda and silently broke os.path.dirname for
    # every later test in the process)
    orig_dirname = os.path.dirname
    try:
        gd.os.path.dirname = lambda p: str(tmp_path)  # redirect examples dir
        d.load_example_scripts()
    finally:
        gd.os.path.dirname = orig_dirname
    names = [s for _, s in d.example_scripts]
    assert "Speaker 1: way too long" not in names
    assert len(d.example_scripts) == 2


def test_speaker_count_detection(demo_obj):
    f = demo_obj._get_num_speakers_from_script
    assert f("Speaker 1: a\nSpeaker 2: b") == 2
    assert f("Speaker 0: a\nSpeaker 1: b") == 2
    assert f("no labels here") == 1
    assert f("Speaker 1: a\nSpeaker 4: d") >= 2


def test_streaming_generator_end_to_end(demo_obj, monkeypatch):
    """Force-diffusion tiny engine: the generator must yield a final
    complete-audio artifact and a finished log."""
    from vibevoice_tpu.engine import generate as G
    tts = demo_obj.tts
    gen = G.GenerationConfig(
        speech_start_id=tts.tokenizer.speech_start_id,
        speech_end_id=tts.tokenizer.speech_end_id,
        speech_diffusion_id=tts.tokenizer.speech_diffusion_id,
        eos_id=tts.tokenizer.eos_id, ddpm_steps=2, force_diffusion=True)
    eng = G.Engine(tts.params, tts.cfg, gen, max_steps=6, batch=1,
                   prompt_len=512, dtype=tts.dtype)
    monkeypatch.setattr(tts, "_engine", lambda b, p, m: eng)

    outs = list(demo_obj.generate_podcast_streaming(
        1, "Speaker 1: Hello world this is a test.", max_new_tokens=6))
    completes = [c for _s, c, _l, _v in outs if c is not None]
    assert len(completes) == 1
    sr, wav = completes[0]
    assert sr == 24000 and wav.dtype == np.int16 and len(wav) > 0
    assert "Done" in outs[-1][2]
