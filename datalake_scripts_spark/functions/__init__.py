from .casts import (  # noqa: F401
    to_ts_iso,
    to_ts_iso_z,
    to_ts_fractional,
    to_ts_epoch_seconds,
    array_to_csv,
)
from .logparse import parse_bracketed_log  # noqa: F401
