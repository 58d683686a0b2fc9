"""Typed configuration tree + YAML/CLI loading (SURVEY.md §2.1 parity).

Replaces the reference's Hydra + dacite + global-singleton stack (src/main.py:44-49,
src/config.py:15-94, src/global_cfg.py) with one plain dataclass tree threaded
explicitly (the SURVEY design stance: no global config), a YAML loader, and dotted
CLI overrides (`python -m splatter360_tpu.main config.yaml mode=test optimizer.lr=1e-4`).
"""

from __future__ import annotations

import dataclasses
import typing
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

from .data.dataset import DatasetConfig
from .data.view_sampler import BoundedSamplerConfig
from .models.adapter import GaussianAdapterConfig
from .models.encoder import EncoderConfig, OpacityMappingConfig
from .train.losses import LossConfig
from .train.state import OptimizerConfig, TrainConfig


@dataclass(frozen=True)
class CheckpointingConfig:
    load: Optional[str] = None             # full resume path
    pretrained_model: Optional[str] = None # weights-only warm start
    # LOCAL torch checkpoints for the reference recipe's warm starts (zero
    # egress: download out-of-band). pretrained_backbone: UniMatch gmdepth
    # .pth grafted into BOTH multiview backbones (reference
    # encoder_costvolume.py:141-179). pretrained_mono: DINOv2/Depth-Anything
    # ViT .pth for the frozen mono branch (requires model.add_mono_feat;
    # reference costvolume.yaml:46-48 + torch.hub load at ref:107-125).
    pretrained_backbone: Optional[str] = None
    pretrained_mono: Optional[str] = None
    every_n_train_steps: int = 20_000
    resume: bool = True
    max_to_keep: int = -1


@dataclass(frozen=True)
class TrainerConfig:
    max_steps: int = 100_000
    batch_size: int = 1
    val_check_interval: int = 5_000
    num_sanity_val_steps: int = 2
    print_log_every_n_steps: int = 100
    seed: int = 111123
    # jax.profiler trace of steps [profile_start, profile_start+profile_steps)
    # written to output_dir/profile (view with tensorboard / xprof). 0 = off.
    # SURVEY.md §5 tracing parity: the reference has only wall-clock tags; this
    # is the TPU-native upgrade (per-op XLA timeline).
    profile_steps: int = 0
    profile_start: int = 10


@dataclass(frozen=True)
class TestConfig:
    output_path: str = "outputs/test"
    compute_scores: bool = True
    eval_time_skip_steps: int = 5
    save_image: bool = True
    save_video: bool = False
    video_trajectory: str = "interpolate"  # interpolate | wobble | spin
    eval_depth: bool = False
    # Score on the v*6 rendered cube faces (the reference's protocol,
    # model_wrapper_erp.py:471-541) instead of the direct-ERP render. Use for
    # apples-to-apples comparison against published Splatter-360 numbers.
    eval_on_cubes: bool = False
    # Divide the composited depth by alpha before the depth metrics. The
    # reference protocol does NOT normalize: its depth render composites z as
    # a color with no alpha division (cuda_splatting.py:226-269), so the
    # default (False) matches it exactly. True gives the unbiased depth
    # estimate; the two agree wherever alpha ~= 1 (saturated scenes) — see
    # tests/test_evaluator.py::test_depth_alpha_norm_negligible_at_full_alpha.
    depth_alpha_norm: bool = False


@dataclass(frozen=True)
class RootConfig:
    mode: str = "train"  # train | test
    output_dir: str = "outputs/run"
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: EncoderConfig = field(default_factory=EncoderConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    checkpointing: CheckpointingConfig = field(default_factory=CheckpointingConfig)
    test: TestConfig = field(default_factory=TestConfig)


def _from_dict(cls, data: Any):
    """dacite-lite: recursively build (frozen) dataclasses from dicts."""
    if data is None:
        return cls() if dataclasses.is_dataclass(cls) else None
    if dataclasses.is_dataclass(cls):
        if not isinstance(data, dict):
            raise TypeError(f"expected dict for {cls.__name__}, got {type(data)}")
        hints = typing.get_type_hints(cls)
        kwargs = {}
        names = {f.name: f for f in dataclasses.fields(cls)}
        for key, value in data.items():
            if key not in names:
                raise KeyError(f"unknown config key {cls.__name__}.{key}")
            kwargs[key] = _convert(hints[key], value)
        return cls(**kwargs)
    return data


def _convert(hint, value):
    origin = typing.get_origin(hint)
    if dataclasses.is_dataclass(hint):
        return _from_dict(hint, value)
    if origin is typing.Union:
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        if value is None:
            return None
        return _convert(args[0], value)
    if origin in (tuple, typing.Tuple) or hint is tuple:
        return tuple(value) if value is not None else ()
    if origin in (list, typing.List):
        return list(value)
    if hint is float and value is not None:
        return float(value)
    if hint is int and value is not None and not isinstance(value, bool):
        return int(value)
    return value


def load_config(path: Optional[str] = None, overrides: Optional[list] = None
                ) -> RootConfig:
    """Load RootConfig from a YAML file plus `a.b.c=value` CLI overrides."""
    data: dict = {}
    if path is not None:
        data = yaml.safe_load(Path(path).read_text()) or {}
    for ov in overrides or []:
        key, _, raw = ov.partition("=")
        value = yaml.safe_load(raw)
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return _from_dict(RootConfig, data)


def config_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)
