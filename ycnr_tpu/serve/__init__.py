from ycnr_tpu.serve.cache import RecCache  # noqa: F401
from ycnr_tpu.serve.engine import Recommender  # noqa: F401
