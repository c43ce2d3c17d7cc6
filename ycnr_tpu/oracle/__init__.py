from ycnr_tpu.oracle.numpy_mf import (  # noqa: F401
    als_wr_epoch,
    ials_epoch,
    predict,
    rmse,
    sgd_epoch_batched,
    topn,
)
