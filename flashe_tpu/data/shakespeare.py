"""Shakespeare next-char dataset (the reference's in-repo real dataset).

The reference ships `examples/dataset/shakespeare_10/`: ten CSVs of
81-token character sequences (82 columns: id + x1..x81, zero-padded,
vocab 83 including pad=0) for the Shakespeare+LSTM workload
(examples/configs/lstm_*).  Files `0_a.csv`..`8_a.csv` are the nine
client training shards; `b.csv` is held out for evaluation (the
reference's committed confs are templates with dataset names rewritten
at deploy time, so the file->party mapping is by filename convention).

Label construction mirrors KerasSequenceData with create_label=True
(jzf_nn_model.py:238-250): x = seq[:-1], y = seq[1:] — per-position
next-token prediction over 80 steps.
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from flashe_tpu.data.io import read_dense_csv

__all__ = ["DEFAULT_ROOT", "VOCAB", "SEQ_LEN", "load_shard",
           "load_clients", "load_eval"]

DEFAULT_ROOT = "/root/reference/examples/dataset/shakespeare_10"
VOCAB = 83  # nn_define Embedding input_dim (pad token 0 included)
SEQ_LEN = 80


def load_shard(path: str, limit: int | None = None
               ) -> Tuple[np.ndarray, np.ndarray]:
    """One CSV -> (x, y) int32 arrays of shape (n, 80)."""
    feats, _ids = read_dense_csv(path, label_index=0, label_type="int")
    seq = feats.astype(np.int32)
    if limit:
        seq = seq[:limit]
    return seq[:, :-1], seq[:, 1:]


def load_clients(root: str = DEFAULT_ROOT, n_clients: int = 9,
                 limit: int | None = None
                 ) -> List[Tuple[np.ndarray, np.ndarray]]:
    shards = []
    for i in range(n_clients):
        shards.append(load_shard(os.path.join(root, f"{i}_a.csv"), limit))
    return shards


def load_eval(root: str = DEFAULT_ROOT, limit: int | None = None
              ) -> Tuple[np.ndarray, np.ndarray]:
    return load_shard(os.path.join(root, "b.csv"), limit)
