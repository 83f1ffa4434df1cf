"""YAML experiment configs: the ESPnet-config equivalent.

The reference is driven by absent-but-named YAML configs
(/root/reference/README.md:53-56, run_tswhisper.sh:17-19):
``train_tsasr_whisper_medium_full_con20_q16_l2_crop10_lr5e-5.yaml``,
``decode_asr_whisper_beam1.yaml``, ``..._lora_qkvo_r16_.yaml``,
``..._masking_.yaml``. This module maps a compatible YAML schema onto the
framework's dataclass configs so those experiment names run unmodified here
(BASELINE.json requirement). Unknown keys are rejected loudly — config typos
must not silently train the wrong model.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

from ..decode.search import DecodeConfig
from ..models.ts_encoder import TSEncoderConfig
from ..models.ts_model import TSModelConfig
from ..models.whisper.config import WhisperDims, whisper_dims
from ..train.step import TrainConfig


@dataclasses.dataclass
class ExperimentConfig:
    whisper_model: str = "medium"
    dims: Optional[WhisperDims] = None
    ts: TSEncoderConfig = TSEncoderConfig()
    model: TSModelConfig = TSModelConfig()
    train: TrainConfig = TrainConfig()
    decode: DecodeConfig = DecodeConfig()
    # data
    speech_seconds: float = 30.0
    enroll_seconds: float = 10.0
    batch_size: int = 8
    num_epochs: int = 10
    utt_style: str = "libri2mix"
    compute_dtype: str = "bfloat16"
    # True when decode_conf.init_tokens was EXPLICITLY set in the yaml.
    # cli.decode needs this to honor an explicit [sos] (the conditioning
    # cli.train checkpoints are trained with): comparing the value against
    # the dataclass default cannot distinguish "unset" from "explicitly
    # the default" — exactly the bare-sos case that matters.
    decode_init_tokens_explicit: bool = False

    def resolved_dims(self) -> WhisperDims:
        return self.dims or whisper_dims(self.whisper_model)


def _update_dataclass(dc: Any, updates: Dict[str, Any], path: str) -> Any:
    fields = {f.name: f for f in dataclasses.fields(dc)}
    kw = {}
    for k, v in updates.items():
        if k not in fields:
            raise KeyError(f"unknown config key {path}.{k}")
        cur = getattr(dc, k)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            kw[k] = _update_dataclass(cur, v, f"{path}.{k}")
        else:
            kw[k] = v
    return dataclasses.replace(dc, **kw)


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def experiment_from_dict(d: Dict[str, Any]) -> ExperimentConfig:
    """Build an ExperimentConfig from a nested dict (parsed YAML).

    Schema::

        whisper_model: medium
        encoder_conf: {num_query_tokens: 16, num_hidden_layers: 2, ...}
        model_conf:   {contrastive_weight: 2.0, ctc_weight: 0.3, ...}
        specaug_conf: {num_freq_masks: 2, ...}
        train_conf:   {mode: full|lora|frozen_backbone,
                       optim: {lr: 5e-5, warmup_steps: 1500},
                       lora: {rank: 16}}
        decode_conf:  {beam_size: 1, max_new_tokens: 200}
        data_conf:    {speech_seconds: 30, enroll_seconds: 10,
                       batch_size: 8, num_epochs: 10, utt_style: libri2mix}
    """
    d = dict(d)
    exp = ExperimentConfig()
    if "whisper_model" in d:
        exp = dataclasses.replace(exp, whisper_model=d.pop("whisper_model"))
    if "encoder_conf" in d:
        exp = dataclasses.replace(
            exp, ts=_update_dataclass(exp.ts, d.pop("encoder_conf"), "encoder_conf")
        )
    if "model_conf" in d:
        exp = dataclasses.replace(
            exp, model=_update_dataclass(exp.model, d.pop("model_conf"), "model_conf")
        )
    if "specaug_conf" in d:
        sa = _update_dataclass(
            exp.model.specaug, d.pop("specaug_conf"), "specaug_conf"
        )
        exp = dataclasses.replace(
            exp, model=dataclasses.replace(exp.model, specaug=sa)
        )
    if "train_conf" in d:
        exp = dataclasses.replace(
            exp, train=_update_dataclass(exp.train, d.pop("train_conf"), "train_conf")
        )
    if "decode_conf" in d:
        dd = dict(d.pop("decode_conf"))
        if "init_tokens" in dd:
            dd["init_tokens"] = tuple(dd["init_tokens"])
            exp = dataclasses.replace(exp, decode_init_tokens_explicit=True)
        exp = dataclasses.replace(
            exp, decode=_update_dataclass(exp.decode, dd, "decode_conf")
        )
    if "data_conf" in d:
        for k, v in d.pop("data_conf").items():
            if not hasattr(exp, k):
                raise KeyError(f"unknown config key data_conf.{k}")
            exp = dataclasses.replace(exp, **{k: v})
    if "compute_dtype" in d:
        exp = dataclasses.replace(exp, compute_dtype=d.pop("compute_dtype"))
    if d:
        raise KeyError(f"unknown top-level config keys: {sorted(d)}")
    return exp


def load_experiment(path: str) -> ExperimentConfig:
    return experiment_from_dict(load_yaml(path))
