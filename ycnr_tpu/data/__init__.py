from ycnr_tpu.data.synthetic import synthetic_ratings  # noqa: F401
from ycnr_tpu.data.split import train_test_split  # noqa: F401
from ycnr_tpu.data.movielens import load_movielens  # noqa: F401
from ycnr_tpu.data.dataset import Dataset, load_dataset  # noqa: F401
