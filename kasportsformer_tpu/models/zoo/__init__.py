"""Baseline model zoo (≙ reference `model/` zoo, SURVEY.md §2.3). Importing
this package registers every zoo model with the factory."""

from kasportsformer_tpu.models.zoo import (  # noqa: F401
    d3dp,
    dstformer,
    hdformer,
    ktpformer,
    mixste,
    mixste_legacy,
    motionagformer,
    stcformer,
)
