from ycnr_tpu.serve.cache import RecCache  # noqa: F401
from ycnr_tpu.serve.engine import Recommender  # noqa: F401
from ycnr_tpu.serve.fold_in import (  # noqa: F401
    fold_in_items,
    fold_in_users,
    recommend_fold_in,
)
from ycnr_tpu.serve.shm import (  # noqa: F401
    FactorShmReader,
    FactorShmWriter,
    ShmRecommender,
    publish_checkpoint,
    shm_available,
)
