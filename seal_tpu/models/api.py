"""Model-family dispatch: BART and T5 share one functional interface
(init_params / encode / decode_full / decode_step / caches), selected by the
config type so the fused decoder and scorers are family-agnostic."""

from __future__ import annotations

from seal_tpu.models import bart as _bart
from seal_tpu.models import t5 as _t5
from seal_tpu.models.config import BartConfig
from seal_tpu.models.t5 import T5Config


def module_for(cfg):
    if isinstance(cfg, T5Config) or getattr(cfg, "family", "bart") == "t5":
        return _t5
    if isinstance(cfg, BartConfig):
        return _bart
    raise TypeError(f"unknown model config type: {type(cfg)!r}")
