from .scalars import (  # noqa: F401
    dsum,
    davg,
    json_param,
    micros_to_ts,
    param_last_wins,
    parse_date_multi,
    to_shard_suffix,
    ts_to_micros,
)
