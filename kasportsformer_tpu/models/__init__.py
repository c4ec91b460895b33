"""Model zoo.

Every model is a pure-functional pair (`init(key) -> (params, state)`,
`apply(params, state, x, train) -> (y, state)`) over a `[B, T, J, C]` input,
mirroring the reference's model contract (`model/model_tools.py:79-96`):
forward maps `(B, T, 17, 3) -> (B, T, 17, 3)`.
"""

from kasportsformer_tpu.models.registry import available_models, build_model  # noqa: F401
