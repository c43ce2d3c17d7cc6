from ycnr_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: F401
from ycnr_tpu.parallel.shard import (  # noqa: F401
    ShardedData,
    ShardedState,
    build_bpr_bits,
    build_sharded_data,
    gather_state,
    scatter_state,
    sharded_als_epoch,
    sharded_bpr_epoch,
    sharded_ials_epoch,
    sharded_recommend_all,
    sharded_rmse,
    sharded_sgd_epoch,
)
