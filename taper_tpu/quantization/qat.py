"""Quantization-aware training (reference ``src/quantization/qat_*.rs``).

* :class:`QATConfig`    — ``qat_config.rs:10-121`` (warmup, effective lr)
* :class:`QATState`     — functional replacement for the reference's
  lazy-static global ``QATManager`` singleton (``qat_manager.rs:162-219``):
  enable/training flags live in an explicit object passed to ``apply``,
  not in process-global mutable state.
* :class:`QATLinear` / :class:`QATConv2d` — ``qat_layers.rs:12-276``:
  fake-quantize the weight, run the layer, fake-quantize the activation;
  straight-through gradients via ``fake_quantize.py``.
* :class:`QATSequential` — ``qat_layers.rs:281-340``.

Calibration actually flows through observers (``observers.py``), which the
reference declares but never wires (SURVEY.md §2.10).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax

from taper_tpu import nn
from taper_tpu.nn.module import Module
from taper_tpu.quantization.config import (
    QuantizationConfig, QuantizationSchema,
)
from taper_tpu.quantization.fake_quantize import FakeQuantize
from taper_tpu.quantization.observers import ObserverManager


@dataclasses.dataclass
class QATConfig:
    quant_config: QuantizationConfig = dataclasses.field(
        default_factory=lambda: QuantizationConfig.int8(symmetric=True))
    lr: float = 1e-3
    warmup_epochs: int = 0
    freeze_bn: bool = False
    observer_enabled: bool = True
    per_channel: bool = False
    symmetric: bool = True

    # builder-style helpers matching the reference (qat_config.rs:75-96)
    def with_warmup(self, epochs: int) -> "QATConfig":
        return dataclasses.replace(self, warmup_epochs=epochs)

    def with_per_channel(self, v: bool = True) -> "QATConfig":
        return dataclasses.replace(self, per_channel=v)

    @property
    def qconfig(self) -> QuantizationConfig:
        """The effective :class:`QuantizationConfig` for layer weights —
        ``per_channel=True`` lifts the schema to PER_CHANNEL (the field
        the reference declares and never wires, qat_config.rs:10-25).
        Pass THIS (not ``quant_config``) when building QAT layers."""
        if self.per_channel and \
                self.quant_config.schema != QuantizationSchema.PER_CHANNEL:
            return dataclasses.replace(
                self.quant_config, schema=QuantizationSchema.PER_CHANNEL)
        return self.quant_config

    def is_warmup(self, epoch: int) -> bool:
        return epoch < self.warmup_epochs

    def get_effective_lr(self, epoch: int) -> float:
        # 0.1× lr during warmup (qat_config.rs:109-121)
        return self.lr * 0.1 if self.is_warmup(epoch) else self.lr

    @classmethod
    def int8(cls, lr: float = 1e-3, warmup_epochs: int = 0,
             symmetric: bool = True) -> "QATConfig":
        return cls(QuantizationConfig.int8(symmetric=symmetric), lr,
                   warmup_epochs, symmetric=symmetric)


@dataclasses.dataclass
class QATState:
    """Explicit QAT mode flags (replaces the reference's global singleton).

    Passing ``enabled=False`` makes every QAT layer a transparent wrapper
    (the reference's disabled registry path, ``qat_layers.rs:104-107``).
    """
    enabled: bool = True
    training: bool = True

    def status(self, model) -> Dict[str, object]:
        """QATStatus summary (qat_manager.rs:138-159)."""
        qat_layers = [l for l in getattr(model, "layers", [])
                      if isinstance(l, (QATLinear, QATConv2d))]
        return {
            "enabled": self.enabled,
            "training": self.training,
            "num_qat_layers": len(qat_layers),
            "enabled_percentage": 100.0 if self.enabled else 0.0,
        }


class _QATMixin:
    """Shared fake-quant plumbing for QAT layers.

    Params layout: ``{"inner": <wrapped layer params>,
    "weight_fq"/"act_fq": FakeQuantize pytrees}``.
    """

    def _init_fq(self, inner_params):
        # per-channel applies to WEIGHTS only (axis 0 = output channels);
        # activations' axis 0 is the batch, so their fq stays per-tensor
        acfg = dataclasses.replace(self.qconfig,
                                   schema=QuantizationSchema.UNIFORM)
        return {
            "inner": inner_params,
            "weight_fq": FakeQuantize.create(self.qconfig),
            "act_fq": FakeQuantize.create(acfg),
        }

    def _apply_fq(self, params, x, qat: Optional[QATState], train, rng):
        inner = params["inner"]
        active = qat is not None and qat.enabled
        dynamic = active and train and (qat is None or qat.training)
        if active:
            wfq = params["weight_fq"]
            if dynamic:
                # Training recalibrates ranges from the live tensors every
                # step (the reference's FakeQuantize observes min/max on
                # each training forward, fake_quantize.rs:118-172; stale
                # ranges clip the growing activations and stall learning).
                # stop_gradient inside calibrate keeps ranges out of the
                # backward pass; eval uses the stored (frozen) ranges.
                wfq = wfq.calibrate(jax.lax.stop_gradient(inner["w"]))
            w = wfq.apply(inner["w"])
            inner = {**inner, "w": w}
        y = self.inner.apply(inner, x, train=train, rng=rng)
        if active:
            afq = params["act_fq"]
            if dynamic:
                afq = afq.calibrate(jax.lax.stop_gradient(y))
            y = afq.apply(y)
        return y

    def calibrate(self, params, x, observers: Optional[ObserverManager]
                  = None, key: str = ""):
        """Recalibrate weight/activation fake-quant ranges from data
        (update_weight_params/update_activation_params,
        qat_layers.rs:76-88, :216-228)."""
        w = params["inner"]["w"]
        wfq = params["weight_fq"].calibrate(w)
        y = self.inner.apply({**params["inner"],
                              "w": wfq.apply(w)}, x)
        if observers is not None:
            observers.observe(f"{key}.weight", w)
            observers.observe(f"{key}.act", y)
            stats = observers.get(f"{key}.act").get_stats()
            afq = params["act_fq"].update_params(stats.min_val,
                                                stats.max_val)
        else:
            afq = params["act_fq"].calibrate(y)
        return {**params, "weight_fq": wfq, "act_fq": afq}, y


class QATLinear(_QATMixin, Module):
    def __init__(self, in_features: int, out_features: int,
                 config: Optional[QuantizationConfig] = None,
                 module_id: str = "", activation: Optional[str] = None):
        self.inner = nn.Linear(in_features, out_features,
                               activation=activation)
        self.qconfig = config or QuantizationConfig.int8(symmetric=True)
        self.module_id = module_id

    def init(self, key):
        return self._init_fq(self.inner.init(key))

    def apply(self, params, x, *, train=False, rng=None,
              qat: Optional[QATState] = QATState()):
        return self._apply_fq(params, x, qat, train, rng)


class QATConv2d(_QATMixin, Module):
    def __init__(self, in_channels: int, out_channels: int, kernel_size,
                 stride=1, padding=0,
                 config: Optional[QuantizationConfig] = None,
                 module_id: str = "", activation: Optional[str] = None):
        self.inner = nn.Conv2d(in_channels, out_channels, kernel_size,
                               stride=stride, padding=padding,
                               activation=activation)
        self.qconfig = config or QuantizationConfig.int8(symmetric=True)
        self.module_id = module_id

    def init(self, key):
        return self._init_fq(self.inner.init(key))

    def apply(self, params, x, *, train=False, rng=None,
              qat: Optional[QATState] = QATState()):
        return self._apply_fq(params, x, qat, train, rng)


class QATSequential(Module):
    """Sequential over (possibly) QAT layers, threading the QAT state."""

    def __init__(self, *layers: Module):
        if len(layers) == 1 and isinstance(layers[0], (list, tuple)):
            layers = tuple(layers[0])
        self.layers = list(layers)

    def init(self, key):
        keys = jax.random.split(key, max(len(self.layers), 1))
        return [l.init(k) for l, k in zip(self.layers, keys)]

    def apply(self, params, x, *, train=False, rng=None,
              qat: Optional[QATState] = QATState()):
        rngs = (jax.random.split(rng, len(self.layers))
                if rng is not None else [None] * len(self.layers))
        for layer, p, r in zip(self.layers, params, rngs):
            if isinstance(layer, (QATLinear, QATConv2d, QATSequential)):
                x = layer.apply(p, x, train=train, rng=r, qat=qat)
            else:
                x = layer.apply(p, x, train=train, rng=r)
        return x

    def calibrate(self, params, x, observers: Optional[ObserverManager]
                  = None):
        """Forward a calibration batch, recalibrating every QAT layer's
        ranges in order (data flows through the already-calibrated
        prefix)."""
        new_params = []
        for i, (layer, p) in enumerate(zip(self.layers, params)):
            if isinstance(layer, (QATLinear, QATConv2d)):
                key = layer.module_id or f"layer{i}"
                p, x = layer.calibrate(p, x, observers, key)
            else:
                x = layer.apply(p, x)
            new_params.append(p)
        return new_params, x

    def __iter__(self):
        return iter(self.layers)
