"""Quantization subsystem: PTQ (int4/int8/fp16/bf16/NF4) + QAT (STE).

Rebuild of reference ``src/quantization/`` — see submodules:

* ``config``        — QuantizationConfig/Type/Schema (``config.rs``)
* ``qtensor``       — quantize/dequantize kernels (``tensor.rs:2084-2188``;
  the reference's int4/bf16/NF4 stubs are real here)
* ``ptq``           — post-training quantization of module params
* ``fake_quantize`` — QAT fake-quant with straight-through VJP
* ``observers``     — MinMax/Histogram observers (``observers.rs``)
* ``qat``           — QATConfig/QATLinear/QATConv2d/QATSequential
"""

_SUBMODULES = ("config", "qtensor", "ptq", "fake_quantize", "observers",
               "qat")

import importlib as _importlib

__all__ = []
for _m in _SUBMODULES:
    try:
        globals()[_m] = _importlib.import_module(f"taper_tpu.quantization.{_m}")
        __all__.append(_m)
    except ModuleNotFoundError:  # staged build-out
        pass
