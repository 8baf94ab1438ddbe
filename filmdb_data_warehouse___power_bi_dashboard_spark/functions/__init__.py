from .scalar import (  # noqa: F401
    date_key,
    interval_days,
    money,
    months_since,
    net_revenue,
)
