from .banded import sw_align_banded_batch, BandedSWResult  # noqa: F401
