"""Engine configuration.

Mirrors the reference's layered settings system
(`/root/reference/Henbun/_settings.py:26-149`, `Henbun/henbunrc:1-17`):
float dtype, jitter level for Cholesky PD-ness, optional value clipping,
and a context-manager override used heavily by tests
(`/root/reference/testing/test_tf_wraps.py:16-42`).

Spark-side divergence (documented): the reference DEFAULTS to float32
(`henbunrc:7`); this engine defaults `float_type` to float64 because
Spark columns are DOUBLE (Tungsten native) and the DuckDB oracle contract
is bit-exact in float64. The knob is honored, not dead config: it sets
the numpy dtype of `autodiff.Tensor` compute and of `Data`/`Variable`
storage, so `settings.dtypes.float_type = np.float32` (or
`temp_settings`) runs the whole objective/gradient path in float32 —
matching reference accuracy tolerances at half the Arrow/broadcast
bytes."""

from __future__ import annotations

import contextlib
import copy
from dataclasses import dataclass, field

import numpy as np


@dataclass
class _Dtypes:
    float_type: type = np.float64
    int_type: type = np.int32


@dataclass
class _Numerics:
    jitter_level: float = 1e-5
    clip_by_value: bool = False          # henbunrc:12 default off
    clip_value_min: float = -50.0        # henbunrc:13
    clip_value_max: float = 50.0         # henbunrc:14


@dataclass
class _Training:
    # reference Indexer holds out 10% for test (Henbun/model.py:132)
    test_frac: float = 0.1
    seed: int = 0
    # variational init defaults (Henbun/param.py:160-166)
    init_mean: float = 0.0
    init_stddev: float = 1.0


@dataclass
class Settings:
    dtypes: _Dtypes = field(default_factory=_Dtypes)
    numerics: _Numerics = field(default_factory=_Numerics)
    training: _Training = field(default_factory=_Training)
    verbosity: bool = False

    @property
    def float_type(self) -> type:
        return self.dtypes.float_type

    @property
    def jitter_level(self) -> float:
        return self.numerics.jitter_level


settings = Settings()


@contextlib.contextmanager
def temp_settings(tmp: Settings):
    """Swap global settings within a context (``_settings.py:131-149``)."""
    global settings
    old = copy.deepcopy(settings)
    _assign(settings, tmp)
    try:
        yield settings
    finally:
        _assign(settings, old)


def _assign(dst: Settings, src: Settings) -> None:
    dst.dtypes = copy.deepcopy(src.dtypes)
    dst.numerics = copy.deepcopy(src.numerics)
    dst.training = copy.deepcopy(src.training)
    dst.verbosity = src.verbosity
