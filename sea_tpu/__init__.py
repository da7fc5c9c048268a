"""SEA-TPU: TPU-native State-Exchange Attention surrogate simulation framework.

Convenience re-exports of the most used entry points; submodules hold the
full API (see ARCHITECTURE.md).
"""

__version__ = "0.1.0"

from sea_tpu.configs.base import (CaseConfig, MeshConfig,  # noqa: F401
                                  SpatialModelConfig, TemporalModelConfig,
                                  TrainConfig)


def __getattr__(name):
    # Lazy heavy imports so `import sea_tpu` stays cheap.
    if name == "spatial":
        from sea_tpu.models import spatial
        return spatial
    if name == "temporal":
        from sea_tpu.models import temporal
        return temporal
    raise AttributeError(name)
