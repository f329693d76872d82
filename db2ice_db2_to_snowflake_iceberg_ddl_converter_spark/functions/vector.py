"""Vector math over ``array<float>`` columns — canonical home of the
expressions operators/similarity.py builds on (re-exported there)."""

from .. operators.similarity import (  # noqa: F401
    cosine_expr,
    dot_expr,
    embedding_dim,
    norm_expr,
)
