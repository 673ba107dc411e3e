from ndjir_tpu.ops import (  # noqa: F401
    activations,
    directions,
    encoding,
    grid,
    intersect,
    tv_loss,
)
