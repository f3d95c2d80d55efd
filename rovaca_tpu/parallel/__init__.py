from .sharding import (  # noqa: F401
    make_data_mesh,
    shard_intervals,
    sharded_pairhmm_step,
    ordered_merge,
)
