from .delta import delta_split, ledger_records  # noqa: F401
from .dedup import first_wins  # noqa: F401
from .merge import merge_upsert, union_accreted  # noqa: F401
