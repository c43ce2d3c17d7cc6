"""Dataset assembly: source -> split -> blocked layouts.

This is the rebuild of the reference's `prepare` stage (SURVEY.md call stack
3.1 + the ingestion half of 3.2): rows -> train/test split -> packed per-user
and per-item (transposed) views, here as BlockedCSR layouts ready for HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from ycnr_tpu.config import DataConfig
from ycnr_tpu.data.movielens import load_movielens
from ycnr_tpu.data.split import train_test_split
from ycnr_tpu.data.synthetic import synthetic_ratings
from ycnr_tpu.ops.layout import BlockedCSR, build_blocked_csr, pad_coo


@dataclass
class Dataset:
    n_users: int
    n_items: int
    # train COO (host, for SGD shuffling and serving masks)
    train_u: np.ndarray
    train_i: np.ndarray
    train_r: np.ndarray
    # held-out COO
    test_u: np.ndarray
    test_i: np.ndarray
    test_r: np.ndarray
    # blocked layouts for the ALS/iALS alternating solves
    user_layout: BlockedCSR  # entity=user, other=item (U-step)
    item_layout: BlockedCSR  # entity=item, other=user (V-step)
    mu: float  # global mean of train ratings (SGD baseline term)

    @property
    def nnz(self) -> int:
        return len(self.train_r)

    def padded_test(self, multiple: int = 1024):
        return pad_coo(self.test_u, self.test_i, self.test_r,
                       self.n_users, self.n_items, multiple)


def _load_source(cfg: DataConfig):
    if cfg.source == "synthetic":
        u, i, r = synthetic_ratings(cfg.n_users, cfg.n_items, cfg.n_ratings,
                                    cfg.true_rank, cfg.noise, cfg.seed)
        return u, i, r, cfg.n_users, cfg.n_items
    if cfg.path is None:
        raise ValueError(
            f"source {cfg.source!r} needs data.path (no network in this "
            "environment; see SURVEY.md §7)")
    return load_movielens(cfg.path)


def load_dataset(cfg: DataConfig, rank_hint: int = 64,
                 block_chunks: Optional[int] = None) -> Dataset:
    u, i, r, n_users, n_items = _load_source(cfg)
    # cfg.implicit keeps raw r here; the iALS model binarizes on device.
    (tu, ti, tr), (su, si, sr) = train_test_split(
        u, i, r, cfg.test_fraction, cfg.seed)
    bc = block_chunks if block_chunks is not None else cfg.block_chunks
    user_layout = build_blocked_csr(tu, ti, tr, n_users, n_items,
                                    cfg.chunk_len, bc, rank_hint)
    item_layout = build_blocked_csr(ti, tu, tr, n_items, n_users,
                                    cfg.chunk_len, bc, rank_hint)
    return Dataset(
        n_users=n_users, n_items=n_items,
        train_u=tu, train_i=ti, train_r=tr,
        test_u=su, test_i=si, test_r=sr,
        user_layout=user_layout, item_layout=item_layout,
        mu=float(tr.mean()) if len(tr) else 0.0,
    )
