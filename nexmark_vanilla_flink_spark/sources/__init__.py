from .tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
    nexmark_streams,
    EV_CTE,
    PERSONS_CTE,
    AUCTIONS_CTE,
    BIDS_CTE,
)
