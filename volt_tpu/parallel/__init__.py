"""Scale-out: device meshes, sharded multi-asset pipelines, multi-host init.

The reference has no distributed execution at all (SURVEY.md §2.7) — its
only "parallelism" is gpytorch batch shapes.  The TPU-native design makes
the batch axes physical: per-asset fits are embarrassingly parallel and
shard over an ``asset`` mesh axis; Monte-Carlo rollout paths shard over a
``path`` axis; XLA inserts the (trivially few) collectives.  No hand-written
communication anywhere — the backend is the compiler.
"""

from .mesh import make_mesh, multihost_initialize
from .pricing import price_options_batch
from .pipeline import (
    PipelineConfig,
    fit_forecast,
    fit_forecast_batch,
    shard_batch,
    warm_start,
)
from .pipeline_multitask import (
    MultitaskPipelineConfig,
    fit_forecast_multitask,
    warm_start_multitask,
)

__all__ = [
    "make_mesh",
    "multihost_initialize",
    "PipelineConfig",
    "fit_forecast",
    "fit_forecast_batch",
    "shard_batch",
    "warm_start",
    "price_options_batch",
    "MultitaskPipelineConfig",
    "fit_forecast_multitask",
    "warm_start_multitask",
]
