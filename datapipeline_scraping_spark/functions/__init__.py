from .checksum import UNIT_SEP, canon, row_checksum  # noqa: F401
from .cleaning import (  # noqa: F401
    absolutize_url,
    force_https,
    nullif_empty,
    trim_keys,
)
from .numeric import dec, exact_avg, exact_sum  # noqa: F401
