"""VibeVoice-TPU: TPU-native long-form multi-speaker TTS framework."""

__version__ = "0.1.0"

from .configs import (  # noqa: F401
    AcousticTokenizerConfig,
    DiffusionHeadConfig,
    Qwen2Config,
    SemanticTokenizerConfig,
    VibeVoiceConfig,
    config_from_json,
    tiny_config,
    vibevoice_1_5b,
    vibevoice_7b,
)

__all__ = [
    "AcousticTokenizerConfig",
    "DiffusionHeadConfig",
    "Qwen2Config",
    "SemanticTokenizerConfig",
    "VibeVoiceConfig",
    "config_from_json",
    "tiny_config",
    "vibevoice_1_5b",
    "vibevoice_7b",
    "VibeVoiceTTS",
]


def __getattr__(name):
    # lazy: pipeline pulls in engine/jax-heavy modules
    if name == "VibeVoiceTTS":
        from .pipeline import VibeVoiceTTS
        return VibeVoiceTTS
    raise AttributeError(name)
