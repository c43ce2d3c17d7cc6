from ycnr_tpu.models.base import MFState, device_layout, init_state  # noqa: F401
from ycnr_tpu.models.als import ALSWR  # noqa: F401
from ycnr_tpu.models.ials import ImplicitALS  # noqa: F401
from ycnr_tpu.models.sgd import BiasedSGD  # noqa: F401
