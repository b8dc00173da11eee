"""Neural fields: the unified satellite-NeRF MLP family.

One parameterised field covers the reference's four model classes —
NeRF (ref: baseline/models/nerf.py:93), Shadow-NeRF (snerf.py:101),
SatNeRF (satnerf.py:101) and RS-Semantic (semantic/models/rs_semantic.py:139) —
selected by static ``FieldConfig`` flags, so every variant compiles to the
same fused XLA program shape.
"""

from satnerf_tpu.models.field import (  # noqa: F401
    FieldConfig,
    field_forward,
    init_field_params,
)
from satnerf_tpu.models.embeddings import init_embedding, embedding_lookup  # noqa: F401
