from ycnr_tpu.models.base import predict, rmse_padded  # noqa: F401
from ycnr_tpu.eval.recommend import recommend_all, recommend_users  # noqa: F401
from ycnr_tpu.eval.similar import similar_items  # noqa: F401
from ycnr_tpu.eval.ranking import (  # noqa: F401
    hit_rate_at_n,
    ranking_metrics_at_n,
)
