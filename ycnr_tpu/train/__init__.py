from ycnr_tpu.train.loop import TrainResult, train  # noqa: F401
from ycnr_tpu.train.tune import TuneResult, tune  # noqa: F401
from ycnr_tpu.train.checkpoint import load_checkpoint, save_checkpoint  # noqa: F401
from ycnr_tpu.train.metrics import MetricsLogger  # noqa: F401
