"""Every shipped preset must construct and train end-to-end (tiny synthetic).

Catches config drift: a preset whose fields stop matching the train loop /
data layer breaks here, not on a user's first real run. The BASELINE configs
themselves (real datasets / full scale) are exercised by bench.py and the
TPU runs; here each preset's *wiring* runs one epoch on a small synthetic
override (the netflix-sharded preset runs its real 8-shard mesh path on the
fake CPU mesh from conftest).
"""

import dataclasses
import tempfile

import numpy as np
import pytest

from ycnr_tpu.config import get_preset, list_presets
from ycnr_tpu.train.loop import train


@pytest.mark.parametrize("name", list_presets())
def test_preset_trains(name):
    cfg = get_preset(name)
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, source="synthetic", n_users=96,
                                 n_items=48, n_ratings=1800, chunk_len=8),
        out_dir=tempfile.mkdtemp(), measure_serving=True)
    for field in ("als", "sgd", "ials"):
        cfg = cfg.replace(**{field: dataclasses.replace(
            getattr(cfg, field), epochs=2, rank=6)})
    res = train(cfg)
    assert len(res.rmse_history) == 2
    assert np.isfinite(res.rmse_history[-1])
    # training reduces held-out RMSE from the cold init on every algorithm
    assert res.rmse_history[-1] < 3.0
