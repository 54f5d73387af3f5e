"""Minimal `diffusers` stand-in so the reference's vendored DPM-Solver
(`/root/reference/vibevoice/schedule/dpm_solver.py:23-26`) imports in this
environment (diffusers is not installed).  Provides just the config plumbing
the scheduler uses; the numerics under test are all in the reference file
itself.
"""
import enum
import sys
import types

import torch


class _FrozenConfig(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


class ConfigMixin:
    config_name = "scheduler_config.json"

    def register_to_config(self, **kwargs):
        if not hasattr(self, "_internal_dict"):
            self._internal_dict = _FrozenConfig()
        self._internal_dict.update(kwargs)

    @property
    def config(self):
        return getattr(self, "_internal_dict", _FrozenConfig())


def register_to_config(init):
    import functools
    import inspect

    @functools.wraps(init)
    def wrapper(self, *args, **kwargs):
        sig = inspect.signature(init)
        bound = sig.bind(self, *args, **kwargs)
        bound.apply_defaults()
        cfg = {k: v for k, v in bound.arguments.items() if k != "self"}
        self._internal_dict = _FrozenConfig(cfg)
        init(self, *args, **kwargs)

    return wrapper


def deprecate(*args, **kwargs):
    return None


def randn_tensor(shape, generator=None, device=None, dtype=None):
    return torch.randn(shape, generator=generator, device=device, dtype=dtype)


class KarrasDiffusionSchedulers(enum.Enum):
    DPMSolverMultistepScheduler = 1


class SchedulerMixin:
    pass


class SchedulerOutput:
    def __init__(self, prev_sample):
        self.prev_sample = prev_sample


def install():
    if "diffusers" in sys.modules:
        return
    diffusers = types.ModuleType("diffusers")
    cu = types.ModuleType("diffusers.configuration_utils")
    cu.ConfigMixin = ConfigMixin
    cu.register_to_config = register_to_config
    utils = types.ModuleType("diffusers.utils")
    utils.deprecate = deprecate
    tu = types.ModuleType("diffusers.utils.torch_utils")
    tu.randn_tensor = randn_tensor
    su = types.ModuleType("diffusers.schedulers.scheduling_utils")
    su.KarrasDiffusionSchedulers = KarrasDiffusionSchedulers
    su.SchedulerMixin = SchedulerMixin
    su.SchedulerOutput = SchedulerOutput
    schedulers = types.ModuleType("diffusers.schedulers")
    schedulers.scheduling_utils = su
    utils.torch_utils = tu
    diffusers.configuration_utils = cu
    diffusers.utils = utils
    diffusers.schedulers = schedulers
    sys.modules["diffusers"] = diffusers
    sys.modules["diffusers.configuration_utils"] = cu
    sys.modules["diffusers.utils"] = utils
    sys.modules["diffusers.utils.torch_utils"] = tu
    sys.modules["diffusers.schedulers"] = schedulers
    sys.modules["diffusers.schedulers.scheduling_utils"] = su
